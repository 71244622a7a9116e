package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-and-collect with a hard element cap: per group, the exact
  * group COUNT plus the group's ids — complete only while the group
  * stays at or under `cap`, truncated (arbitrarily, cheaply) beyond it.
  * This is the single-pass primitive behind bucket-routed pair
  * expansion: one aggregate yields both the bucket's document frequency
  * (always exact — the routing/df-cap signal) and, for every bucket the
  * in-task arm may expand, its COMPLETE id list; oversized buckets keep
  * only the exact count and route through the distributed self-join arm
  * that never reads `ids`. The alternative — a count histogram plus a
  * tag join back onto the posting list — pays a second full shuffle of
  * the postings and re-derives the posting table in every consumer
  * subtree.
  *
  * Completeness invariant: if the final count is <= cap, NO partial or
  * merge ever dropped an element (every drop requires its own buffer to
  * have exceeded cap already, which makes the final count > cap), so
  * `ids` holds exactly the group's elements. Element ORDER is partition-
  * dependent — consumers sort before any order-sensitive use. Per-buffer
  * memory is O(cap) no matter the group size; the prepend/concat List
  * representation keeps reduce O(1) and merge O(|smaller|).
  */
final case class CappedCollectList(cap: Int)
    extends Aggregator[Long, (Long, List[Long]), (Long, Seq[Long])] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def zero: (Long, List[Long]) = (0L, Nil)

  override def reduce(b: (Long, List[Long]), x: Long): (Long, List[Long]) =
    (b._1 + 1L, if (b._1 < cap) x :: b._2 else b._2)

  override def merge(
      a: (Long, List[Long]), b: (Long, List[Long])): (Long, List[Long]) = {
    val n = a._1 + b._1
    val ids =
      if (n <= cap) a._2 ::: b._2
      // beyond the cap the list is never read — keep whichever side is
      // already capped (or either), avoiding the concat
      else if (a._2.lengthCompare(cap) >= 0) a._2
      else if (b._2.lengthCompare(cap) >= 0) b._2
      else (a._2 ::: b._2).take(cap)
    (n, ids)
  }

  override def finish(r: (Long, List[Long])): (Long, Seq[Long]) = (r._1, r._2)

  override def bufferEncoder: Encoder[(Long, List[Long])] =
    ExpressionEncoder[(Long, List[Long])]()
  override def outputEncoder: Encoder[(Long, Seq[Long])] =
    ExpressionEncoder[(Long, Seq[Long])]()
}
