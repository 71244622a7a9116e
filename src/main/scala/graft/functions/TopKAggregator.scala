package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed Aggregator: per group, keep the k largest
  * (score, id) pairs — score descending, ties to the LOWEST id. This is
  * the map-side-partial form of per-key ranking that a `row_number`
  * window cannot have: the window must shuffle and sort EVERY row of
  * the group, while this aggregate's partial states are k-sized arrays
  * merged associatively — the shuffle carries k rows per key per map
  * partition, not the group's row count. At 100 TB that is the
  * difference between shuffling the fact table and shuffling a bounded
  * digest per key.
  *
  * Buffers are kept sorted (insertion into a k-array), so reduce is
  * O(log k) search + O(k) shift with k small, and merge is a linear
  * k-way merge. Determinism: scores compare via the
  * `java.lang.Double.compare` total order (a consistent total order,
  * though not IEEE-754 totalOrder — it collapses NaN sign/payload):
  * NaN ranks above +Inf (so NaN scores outrank every finite score in
  * the top-k, matching DuckDB's NaN-greatest DESC ordering), -0.0
  * below 0.0, then id ascending — no incomparable elements even for
  * NaN scores, so results are independent of partition order.
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  override def zero: Array[(Double, Long)] = Array.empty

  // true if a ranks strictly before b: higher score first
  // (Double.compare's total order, so NaN sorts consistently — at the
  // very top — instead of failing every comparison and landing
  // wherever the partition order put it), then lower id
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def reduce(
      buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == k && !before(x, buf(k - 1))) buf
    else {
      var i = 0
      while (i < buf.length && before(buf(i), x)) i += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Double, Long)](n)
      System.arraycopy(buf, 0, out, 0, i)
      if (i < n) out(i) = x
      var j = i + 1
      while (j < n) { out(j) = buf(j - 1); j += 1 }
      out
    }
  }

  override def merge(
      a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (i < a.length && (j >= b.length || before(a(i), b(j)))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
