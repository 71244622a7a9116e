package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature aggregator: folds a stream of 64-bit gram hashes
  * into a 128-permutation signature. A typed `Aggregator` instead of 128
  * separate `min(xxhash64(g, i))` columns — the flat-column form makes
  * whole-stage codegen emit a class so large that janino compilation
  * dominated the query (observed minutes of single-threaded compile).
  *
  * Permutation i is the splitmix64 finalizer over (gramHash + i * GOLDEN)
  * — one string hash per gram, then 128 integer mixes. Signature quality
  * matches seeded rehashing; determinism is all the pipeline needs (the
  * correctness oracle verifies exact Jaccard, not signatures).
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
  final val NumPerm = 128
  private final val Golden = 0x9e3779b97f4a7c15L

  override def zero: Array[Long] = Array.fill(NumPerm)(Long.MaxValue)

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def reduce(buf: Array[Long], gramHash: Long): Array[Long] = {
    var i = 0
    while (i < NumPerm) {
      val h = mix(gramHash + i * Golden)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumPerm) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  // ExpressionEncoder -> ArrayType(LongType): the output stays a plain
  // array<bigint> column usable by downstream SQL (band slicing)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  private[functions] def mixPublic(z: Long): Long = mix(z)
}

/** MinHash + LSH banding fused into one aggregator: same 128-permutation
  * signature fold as [[MinHashAggregator]], but `finish` collapses each
  * band of `RowsPerBand` consecutive signature slots into a single 64-bit
  * band hash. Downstream is just `posexplode(bh)` + an equi-join on
  * (band, hash) — no 32-struct / 128-`element_at` projection, whose
  * generated code was large enough for janino compilation to dominate the
  * whole query cold time.
  */
object MinHashBandAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
  final val NumBands = 32
  final val RowsPerBand = MinHashAggregator.NumPerm / NumBands

  override def zero: Array[Long] = MinHashAggregator.zero
  override def reduce(buf: Array[Long], gramHash: Long): Array[Long] =
    MinHashAggregator.reduce(buf, gramHash)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    MinHashAggregator.merge(a, b)

  /** Band hash = iterated splitmix64 over the band's signature slots;
    * equal band hashes ⟺ (w.h.p.) equal signature slices, which is all
    * LSH bucketing needs.
    */
  override def finish(buf: Array[Long]): Array[Long] = {
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var h = 0x51_7c_c1_b7_27_22_0a_95L ^ b
      var r = 0
      while (r < RowsPerBand) {
        h = MinHashAggregator.mixPublic(h ^ buf(b * RowsPerBand + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
