package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * rank-mapped columns into one clustering key so that a range
  * predicate on ANY of the dimensions maps to a bounded set of
  * z-ranges — and therefore, after `repartitionByRange` + within-file
  * sort, to a bounded set of FILES whose parquet min/max footer stats
  * exclude the rest. Linear (single-column) sort gives perfect
  * file-skipping on one dimension and none on the others; z-order
  * trades a sqrt-ish factor on each dimension for skipping on all of
  * them. This is the standard layout story for 100 TB fact tables
  * queried along more than one axis (cf. the OPTIMIZE ZORDER verb of
  * lakehouse table formats) — here as a plain Spark operator: the
  * z-value is a pure bit-algebra `Column` (whole-stage codegen, no
  * UDF), the layout is `repartitionByRange` on it, and the pruning
  * algebra (deinterleave → per-dimension cell coordinates) is exposed
  * so a reader can pre-filter on coarse cells before the exact
  * predicate.
  *
  * Rank mapping is linear min/max scaling, computed in-plan (one tiny
  * aggregate, broadcast back via cross join — the stats never touch
  * the driver). Linear ranks are the documented trade: perfectly
  * robust for uniform-ish keys (the harness's synthetic keys, most
  * surrogate ids), skew-sensitive for heavy-tailed values — for those,
  * feed a pre-ranked column (e.g. `ntile` or a quantile bucket) and
  * call [[interleave]] directly; the interleave does not care where
  * the ranks came from.
  *
  * All math is plain long/double arithmetic with the same operator
  * shapes DuckDB evaluates, so gate oracles can replay it exactly.
  */
object ZOrder {

  /** Interleave `ranks` (each already in `[0, 2^bits)`) into one long:
    * bit `k` of rank `i` lands at z-bit `k * n + i`. `n * bits` must
    * fit a signed long. Pure `Column` bit algebra — codegen'd, and
    * expressible verbatim in ANSI SQL for oracles.
    */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    require(n >= 1, "interleave needs at least one column")
    require(bits >= 1 && n * bits <= 63, s"n*bits must be in [1,63], got ${n * bits}")
    val terms = for {
      (r, i) <- ranks.zipWithIndex
      k <- 0 until bits
    } yield shiftleft(shiftright(r.cast(LongType), k).bitwiseAND(lit(1L)), k * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Extract dimension `i`'s rank back out of an interleaved z-value
    * (inverse of [[interleave]] for that dimension). Used for cell
    * pruning: a coarse cell id `z >> (n * dropBits)` deinterleaves to
    * per-dimension cell coordinates a box predicate can bound.
    */
  def deinterleave(z: Column, i: Int, n: Int, bits: Int): Column = {
    require(i >= 0 && i < n && bits >= 1 && n * bits <= 63)
    val terms = for (k <- 0 until bits)
      yield shiftleft(shiftright(z, k * n + i).bitwiseAND(lit(1L)), k)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear min/max rank of `v` into `[0, 2^bits)`:
    * `least(floor((v - lo) / (hi - lo) * 2^bits), 2^bits - 1)`, with a
    * degenerate `hi == lo` column collapsing to rank 0. Double
    * division in exactly this shape — DuckDB's `/` is the same IEEE
    * double division, so oracles replay it bit-for-bit.
    */
  def linearRank(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = math.pow(2.0, bits)
    when(hi <= lo, lit(0L))
      .otherwise(least(floor((v - lo) / (hi - lo) * lit(cells)), lit(cells - 1.0))
        .cast(LongType))
  }

  /** Append z-value column `zCol` interleaving `cols` at `bits` bits
    * per dimension, with the min/max stats computed in-plan and
    * broadcast back (no driver collect). Numeric columns only.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 zCol: String = "_z"): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType],
        s"z-order column $c must be numeric, got $dt")
    }
    val statAggs = cols.flatMap(c =>
      Seq(min(col(c)).cast(DoubleType).as(s"_lo_$c"),
          max(col(c)).cast(DoubleType).as(s"_hi_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    // materialize each rank as its own column BEFORE interleaving:
    // interleave references every rank `bits` times, and inlining the
    // rank subtree that many times blows the generated method past
    // janino's limit (codegen falls back to interpreted — a silent
    // 10x). As plain column refs the terms stay tiny.
    val ranked = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (d, (c, i)) => d.withColumn(s"_r_$i",
        linearRank(col(c).cast(DoubleType), col(s"_lo_$c"), col(s"_hi_$c"), bits))
    }
    ranked
      .withColumn(zCol, interleave(cols.indices.map(i => col(s"_r_$i")), bits))
      .drop(cols.flatMap(c => Seq(s"_lo_$c", s"_hi_$c"))
        ++ cols.indices.map(i => s"_r_$i"): _*)
  }

  /** Write `df` z-ordered on `cols`: rank → interleave → range
    * partition on the z-value → sort within each partition → parquet.
    * Each output file then owns a contiguous z-range, so its footer
    * min/max on the ORIGINAL columns is a tight cell box — the file
    * skipping any stats-aware reader gets for free. The z column
    * itself is dropped unless `keepZ`.
    */
  def layout(df: DataFrame, cols: Seq[String], outPath: String,
             bits: Int = 16, partitions: Int = 0, keepZ: Boolean = false): Unit = {
    val z = withZValue(df, cols, bits)
    val parted =
      if (partitions > 0) z.repartitionByRange(partitions, col("_z"))
      else z.repartitionByRange(col("_z"))
    val sorted = parted.sortWithinPartitions("_z")
    val out = if (keepZ) sorted else sorted.drop("_z")
    out.write.mode("overwrite").parquet(outPath)
  }
}
