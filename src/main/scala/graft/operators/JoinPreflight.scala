package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Price a shuffle join BEFORE paying for it.
  *
  * At 100 TB the expensive join mistakes are made before the first
  * task runs: shuffling a side that would have broadcast, hash-joining
  * a key whose hottest value serializes one task, or discovering only
  * at executor-OOM time that the output is 400× the input. Each has a
  * cheap pre-flight tell, and this operator collects all of them in
  * two column-pruned jobs per side — the same "price it first"
  * contract as [[IntervalJoin.bucketReport]] (bucket width) and
  * [[graft.plans.AsOfJoin.detectSkew]] (as-of salting), generalized to
  * the plain equi-join:
  *
  *   - '''per-side volume''': exact row count + a schema-width byte
  *     estimate → is either side under the broadcast threshold?
  *   - '''key overlap''': a theta sketch of each side's key set (map-
  *     side partial aggregation; sketches, never keys, cross the wire;
  *     the intersection evaluates on the driver over two ≤64 KiB
  *     buffers) → DIRECT estimate of how many distinct keys actually
  *     match — the term NDV-based optimizers guess worst when the
  *     sides' key domains barely overlap.
  *   - '''multiplicity histogram''': a seeded SAMPLE of each side's
  *     keys, grouped → top-K heavy hitters + tail averages. The join
  *     output estimate is the standard decomposition: exact Σ aᵢ·bᵢ
  *     over hitters matched on BOTH top-K lists (the product term
  *     sampling gets right, because hitters are exactly the keys a
  *     sample cannot miss) + matched-tail-keys × (avg tail
  *     multiplicity)² for the rest.
  *   - '''skew''': the hottest matched PAIR's share of the estimated
  *     output — the join-shaped version of the as-of detector's
  *     left-share test (a key hot on one side but absent from the
  *     other inflates nothing).
  *
  * Honesty notes, in the report's own fields: `sampledRows` is the
  * evidence size (below [[minSampleRows]] on either side the verdict
  * is explicitly "insufficient-sample"); the tail term assumes tail
  * multiplicities are exchangeable within a side (true for the long
  * uniform tails real key distributions have, biased when hitters hide
  * below the sample's resolution — raise `sampleFraction` when the
  * histogram and `topKeyShare` disagree). Sketch error is theta's
  * ~1.6% at lgK=12, so `estMatchedKeys` on disjoint key domains reads
  * ~0 rather than an NDV-style worst case.
  *
  * Cost: per side, one full pass over the KEY COLUMNS ONLY (count +
  * sketch, collapsing map-side to one row) and one sampled groupBy at
  * key-column width. Both plans prune payload columns at the scan —
  * against parquet the pre-flight reads a fraction of what the join
  * itself would shuffle.
  */
object JoinPreflight {

  /** One side's evidence. `estBytes` = rows × schema default widths
    * (the CBO-less planner's own arithmetic — good to a small factor,
    * which is all a broadcast decision needs). */
  final case class SideStats(
      rows: Long,
      estBytes: Long,
      estDistinctKeys: Long,
      sampledRows: Long,
      topKeyShare: Double)

  /** The pre-flight verdict. `estOutputRows` is hitter-exact +
    * tail-average; `hotPairShare` is the hottest matched key pair's
    * share of it; `recommendation` ∈ broadcast-left | broadcast-right
    * | salted-shuffle | shuffle | insufficient-sample. */
  final case class Report(
      left: SideStats,
      right: SideStats,
      estMatchedKeys: Long,
      estOutputRows: Long,
      hotPairShare: Double,
      recommendation: String) {

    /** The report as a one-row DataFrame (the CLI's output shape). */
    def frame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      Seq((left.rows, left.estBytes, left.estDistinctKeys,
        right.rows, right.estBytes, right.estDistinctKeys,
        estMatchedKeys, estOutputRows, hotPairShare,
        left.topKeyShare, right.topKeyShare, recommendation))
        .toDF("left_rows", "left_est_bytes", "left_est_keys",
          "right_rows", "right_est_bytes", "right_est_keys",
          "est_matched_keys", "est_output_rows", "hot_pair_share",
          "left_top_key_share", "right_top_key_share", "recommendation")
    }
  }

  /** Same evidence floor as the as-of detector: under this many
    * sampled rows on either side the histogram is noise and the
    * verdict is explicitly "insufficient-sample". */
  val minSampleRows = 100L

  /** Spark's own default `autoBroadcastJoinThreshold`. */
  val defaultBroadcastBytes = 10L * 1024 * 1024

  /** Hottest-pair output share above which the report recommends a
    * salted build — aligned with the as-of detector's rationale: one
    * pair owning ≥ 20% of the output serializes ≥ 20% of the join's
    * work into one task against 32+ slots. */
  val defaultHotShareThreshold = 0.2

  def report(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String],
      sampleFraction: Double = 0.01,
      topK: Int = 64,
      broadcastBytes: Long = defaultBroadcastBytes,
      hotShareThreshold: Double = defaultHotShareThreshold): Report = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"key lists must be non-empty and same length, got $leftKeys / $rightKeys")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(topK > 0, s"topK must be positive, got $topK")

    val lEv = sideEvidence(left, leftKeys, sampleFraction, topK)
    val rEv = sideEvidence(right, rightKeys, sampleFraction, topK)
    // distinct keys present on BOTH sides: direct theta intersection of
    // the two full-pass sketches, on the driver (two ≤64 KiB buffers)
    val matchedKeys = intersectEstimate(lEv.sketch, rEv.sketch)

    val scale = 1.0 / sampleFraction
    // hitters matched on both top-K lists: the exact product term
    val both = lEv.hitters.keySet.intersect(rEv.hitters.keySet)
    val hitterProducts = both.toSeq.map { k =>
      (lEv.hitters(k) * scale) * (rEv.hitters(k) * scale)
    }
    val hitterOut = hitterProducts.sum
    // tail: matched keys the hitter term does not cover, at each side's
    // average tail multiplicity
    val tailMatched = math.max(0L, matchedKeys - both.size)
    val tailOut = tailMatched.toDouble * lEv.avgTailMult * rEv.avgTailMult
    val estOut = math.round(hitterOut + tailOut)
    val hotShare =
      if (estOut <= 0L) 0.0
      else hitterProducts.sorted.lastOption.getOrElse(0.0) / estOut.toDouble

    val enough = lEv.stats.sampledRows >= minSampleRows &&
      rEv.stats.sampledRows >= minSampleRows
    val rec =
      if (!enough) "insufficient-sample"
      else if (rEv.stats.estBytes <= broadcastBytes &&
        rEv.stats.estBytes <= lEv.stats.estBytes) "broadcast-right"
      else if (lEv.stats.estBytes <= broadcastBytes) "broadcast-left"
      else if (hotShare >= hotShareThreshold) "salted-shuffle"
      else "shuffle"
    Report(lEv.stats, rEv.stats, matchedKeys, estOut, hotShare, rec)
  }

  private final case class SideEvidence(
      stats: SideStats,
      sketch: Array[Byte],
      hitters: Map[String, Long],
      avgTailMult: Double)

  /** Composite key as one string, ''-separated so ("a","bc") and
    * ("ab","c") stay distinct. Rows with ANY null key component are
    * excluded everywhere — SQL equi-joins never match null keys. */
  private def keyExpr(keys: Seq[String]): Column =
    concat_ws("", keys.map(c => col(c).cast("string")): _*)

  private def keysNotNull(keys: Seq[String]): Column =
    keys.map(c => col(c).isNotNull).reduce(_ && _)

  /** Full-pass count/bytes/sketch + sampled histogram for one side. */
  private def sideEvidence(
      df: DataFrame, keys: Seq[String],
      sampleFraction: Double, topK: Int): SideEvidence = {
    keys.foreach(k => require(df.columns.contains(k),
      s"key column '$k' not in ${df.columns.mkString(",")}"))
    val rowWidth = df.schema.fields.map(_.dataType.defaultSize.toLong).sum
    val keyed = df
      .filter(keysNotNull(keys))
      .select(keyExpr(keys).as("__jp_key"))
    // ONE global aggregate: map-side partials; a sketch per partition
    // crosses the wire, never the keys
    val fullRow = keyed.agg(
      count(lit(1)).as("n"),
      graft.functions.ThetaSketch.sketchAgg(col("__jp_key")).as("sk"))
      .head()
    val rows = fullRow.getLong(0)
    val sketch = fullRow.getAs[Array[Byte]](1)
    val ndv = math.round(org.apache.datasketches.theta.Sketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(sketch))
      .getEstimate)

    val sampled =
      if (sampleFraction >= 1.0) keyed
      else keyed.sample(withReplacement = false, sampleFraction, seed = 42L)
    val hist = sampled.groupBy("__jp_key").agg(count(lit(1)).as("c"))
    // TakeOrdered: distributed top-K, only K rows reach the driver
    val hitterRows: Array[Row] =
      hist.orderBy(col("c").desc, col("__jp_key")).limit(topK).collect()
    val hitters = hitterRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val tailRow = hist
      .filter(if (hitters.isEmpty) lit(true)
        else !col("__jp_key").isin(hitters.keys.toSeq: _*))
      .agg(coalesce(sum("c"), lit(0L)).as("rows")).head()
    val tailRows = tailRow.getLong(0)
    // average tail multiplicity in FULL-data terms: sampled tail rows
    // scale by 1/f; the tail KEY count comes from the full-pass NDV
    // (sampled distinct undercounts rare keys, the sketch does not)
    val fullTailKeys = math.max(1L, ndv - hitters.size)
    val avgTail = (tailRows / sampleFraction) / fullTailKeys.toDouble
    val sampledN = hitters.values.sum + tailRows
    val topShare =
      if (sampledN == 0L) 0.0
      else hitterRows.headOption
        .map(_.getLong(1).toDouble / sampledN).getOrElse(0.0)
    SideEvidence(
      SideStats(rows, rows * rowWidth, ndv, sampledN, topShare),
      sketch, hitters, avgTail)
  }

  /** |A ∩ B| from two serialized theta sketches, on the driver. */
  private def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketch}
    val inter = SetOperation.builder()
      .setLogNominalEntries(graft.functions.ThetaSketch.LgK)
      .buildIntersection()
    inter.intersect(Sketch.heapify(Memory.wrap(a)))
    inter.intersect(Sketch.heapify(Memory.wrap(b)))
    math.max(0L, math.round(inter.getResult.getEstimate))
  }
}
