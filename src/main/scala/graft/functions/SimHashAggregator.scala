package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash signature aggregator: folds a stream of 64-bit token hashes
  * into the classic 64-bit SimHash — per bit, count +1 when the token
  * hash has the bit set and -1 when clear; the signature bit is 1 iff
  * the count is positive.
  *
  * A typed Aggregator instead of 64 flat `sum(when(...))` columns: the
  * flat form's generated aggregate class is large enough that janino
  * compilation dominates the query's cold time (same pathology the
  * MinHash aggregator replaced — see [[MinHashAggregator]]).
  */
object SimHashAggregator extends Aggregator[Long, Array[Long], Long] {
  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], tokenHash: Long): Array[Long] = {
    var b = 0
    while (b < 64) {
      buf(b) += (((tokenHash >>> b) & 1L) * 2L) - 1L
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
