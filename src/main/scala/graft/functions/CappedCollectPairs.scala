package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[CappedCollectList]] over (doc_id, position) pairs — the posting
  * variant backing the one-pass scrub census: per gram, the exact
  * occurrence COUNT plus the complete (doc_id, p) posting list while
  * the gram stays at or under `cap`, truncated beyond it. Oversized
  * (boilerplate) grams keep only the exact count and route through the
  * arm that re-derives their postings by key — the same routing
  * contract, with the same completeness invariant: any drop forces the
  * final count past the cap, so a count <= cap proves the list is the
  * group's full multiset. Pairs stay a dedicated element type rather
  * than a packed long because doc_id is unbounded at corpus scale
  * (packing into 32+32 bits caps the corpus at 2^32 docs/positions).
  */
final case class CappedCollectPairs(cap: Int)
    extends Aggregator[(Long, Int), (Long, List[(Long, Int)]), (Long, Seq[(Long, Int)])] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def zero: (Long, List[(Long, Int)]) = (0L, Nil)

  override def reduce(
      b: (Long, List[(Long, Int)]), x: (Long, Int)): (Long, List[(Long, Int)]) =
    (b._1 + 1L, if (b._1 < cap) x :: b._2 else b._2)

  override def merge(
      a: (Long, List[(Long, Int)]),
      b: (Long, List[(Long, Int)])): (Long, List[(Long, Int)]) = {
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

  override def finish(
      r: (Long, List[(Long, Int)])): (Long, Seq[(Long, Int)]) = (r._1, r._2)

  override def bufferEncoder: Encoder[(Long, List[(Long, Int)])] =
    ExpressionEncoder[(Long, List[(Long, Int)])]()
  override def outputEncoder: Encoder[(Long, Seq[(Long, Int)])] =
    ExpressionEncoder[(Long, Seq[(Long, Int)])]()
}
