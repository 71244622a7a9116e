package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}

/** Price a shuffle join BEFORE paying for it.
  *
  * At 100 TB the expensive join mistakes are made before the first
  * task runs: shuffling a side that would have broadcast, hash-joining
  * a key whose hottest value serializes one task, or discovering only
  * at executor-OOM time that the output is 400× the input. Each has a
  * cheap pre-flight tell, and this operator collects all of them in
  * two column-pruned scans per side — the same "price it first"
  * contract as [[IntervalJoin.bucketReport]] (bucket width) and
  * [[graft.plans.AsOfJoin.detectSkew]] (as-of salting), generalized to
  * the plain equi-join:
  *
  *   - '''per-side volume''': exact row count + Catalyst's own
  *     `sizeInBytes` plan statistic (the number Spark itself compares
  *     against `autoBroadcastJoinThreshold`) → is either side under
  *     the broadcast threshold?
  *   - '''key overlap''': a theta sketch of each side's key set (map-
  *     side partial aggregation; sketches, never keys, cross the wire;
  *     the intersection evaluates on the driver over two ≤64 KiB
  *     buffers) → DIRECT estimate of how many distinct keys actually
  *     match — the term NDV-based optimizers guess worst when the
  *     sides' key domains barely overlap.
  *   - '''multiplicity histogram''': a seeded SAMPLE of each side's
  *     keys, grouped once and persisted → the PRICED key set is the
  *     union of both sides' top-K lists, and every priced key reads
  *     its sampled count from BOTH histograms. That one-sided lookup
  *     matters: a key that is a hitter on the left but mid-tail on the
  *     right still prices as (left count × right count), not as two
  *     tail averages — the exact shape where a skewed join hides from
  *     naive two-list estimators. Output estimate = Σ aᵢ·bᵢ over
  *     priced keys seen on both sides + matched-tail-keys × (avg tail
  *     multiplicity)², with tail KEY counts taken from the full-pass
  *     NDV so rare keys the sample missed still price in.
  *   - '''skew''': the hottest priced PAIR's share of the estimated
  *     output — the join-shaped version of the as-of detector's
  *     left-share test (a key hot on one side but ABSENT from the
  *     other contributes nothing, and must not read as skew).
  *
  * Key comparison mirrors the join's own coercion where it can: key
  * components are compared on a common type (both integral → LONG;
  * decimal vs decimal/integral → the widened common DECIMAL, the
  * exact compare SQL itself does there — a DOUBLE rendering would
  * collide distinct ids beyond 2^53; numeric mixed with FLOAT/DOUBLE
  * → DOUBLE, the lossy compare SQL does for `bigint = double`), then
  * rendered to a `\u0001`-separated composite string for sketching.
  * Exotic cross-type pairs (string vs numeric) fall back to per-side
  * string rendering and may under-count matches — the join would
  * coerce; the report says so here rather than pretending otherwise.
  *
  * Honesty notes, in the report's own fields: `sampledRows` is the
  * evidence size (below [[minSampleRows]] on either side the verdict
  * is explicitly "insufficient-sample"); the tail term assumes tail
  * multiplicities are exchangeable within a side (true for the long
  * uniform tails real key distributions have — raise `sampleFraction`
  * when the histogram and `topKeyShare` disagree). Sketch error is
  * theta's ~1.6% at lgK=12, so `estMatchedKeys` on disjoint key
  * domains reads ~0 rather than an NDV-style worst case.
  *
  * Cost: per side, one full pass over the KEY COLUMNS ONLY (count +
  * sketch, collapsing map-side to one row) and one sampled groupBy at
  * key-column width, persisted across its top-K / lookup / tail-sum
  * reads. Both plans prune payload columns at the scan — against
  * parquet the pre-flight reads a fraction of what the join itself
  * would shuffle.
  */
object JoinPreflight {

  /** One side's evidence. `estBytes` is Catalyst's `sizeInBytes` plan
    * statistic — the same number Spark's own broadcast decision uses
    * (file-size based for file sources), so string-heavy tables price
    * at their real width, not a per-type default. */
  final case class SideStats(
      rows: Long,
      estBytes: Long,
      estDistinctKeys: Long,
      sampledRows: Long,
      topKeyShare: Double)

  /** The pre-flight verdict. `estOutputRows` is priced-pair-exact +
    * tail-average; `hotPairShare` is the hottest priced key pair's
    * share of it; `recommendation` ∈ broadcast-left | broadcast-right
    * | salted-shuffle | shuffle | insufficient-sample. `hotKeys` are
    * the rendered composite keys whose priced pair individually owns
    * ≥ the hot-share threshold of the estimated output — the key set
    * [[joinAdvised]]'s salted arm isolates (bounded by the priced
    * set, ≤ 2·topK). */
  final case class Report(
      left: SideStats,
      right: SideStats,
      estMatchedKeys: Long,
      estOutputRows: Long,
      hotPairShare: Double,
      recommendation: String,
      hotKeys: Seq[String] = Nil) {

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

  /** Sentinel default for `broadcastBytes`: resolve the threshold
    * from the session's own `spark.sql.autoBroadcastJoinThreshold` at
    * report time, so the verdict compares against the number THIS
    * session's planner would actually use — including "broadcasting
    * disabled" (threshold ≤ 0), where a broadcast recommendation
    * would be advice the session cannot take. */
  val sessionBroadcastBytes = Long.MinValue

  /** Spark's own default `autoBroadcastJoinThreshold` — the fallback
    * documentation constant; [[report]] reads the live session value
    * unless the caller pins one. */
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
      broadcastBytes: Long = sessionBroadcastBytes,
      hotShareThreshold: Double = defaultHotShareThreshold): Report = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"key lists must be non-empty and same length, got $leftKeys / $rightKeys")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(topK > 0, s"topK must be positive, got $topK")
    Seq((left, leftKeys), (right, rightKeys)).foreach { case (df, ks) =>
      ks.foreach(k => require(df.columns.contains(k),
        s"key column '$k' not in ${df.columns.mkString(",")}"))
    }

    val (lKey, rKey) = coercedKeyExprs(left, leftKeys, right, rightKeys)
    // left evidence persists first; the nested try guarantees its
    // histogram unpersists even when the RIGHT side's construction
    // throws (bad column data, cancelled job)
    val lEv = sideEvidence(left, leftKeys, lKey, sampleFraction)
    try {
      val rEv = sideEvidence(right, rightKeys, rKey, sampleFraction)
      try {
        val bb =
          if (broadcastBytes != sessionBroadcastBytes) broadcastBytes
          else left.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
        verdict(lEv, rEv, sampleFraction, topK, bb, hotShareThreshold)
      } finally rEv.hist.unpersist()
    } finally lEv.hist.unpersist()
  }

  /** The pricing math over two sides' evidence — shared by [[report]]
    * (live scans) and [[reportFromStats]] (durable artifacts). */
  private def verdict(
      lEv: SideEvidence, rEv: SideEvidence, sampleFraction: Double,
      topK: Int, bb: Long, hotShareThreshold: Double): Report = {
    // distinct keys present on BOTH sides: direct theta intersection
    // of the two full-pass sketches, on the driver
    val matchedKeys = math.max(0L, math.round(graft.functions.ThetaSketch
      .intersectEstimateBytes(lEv.sketch, rEv.sketch)))

    // priced key set = union of both top-K lists; every priced key
    // reads its sampled count from BOTH histograms, so a one-sided
    // hitter prices by its true sampled count on the other side
    val priced = (topKeys(lEv, topK) ++ topKeys(rEv, topK)).distinct
    val lCnt = countsFor(lEv, priced)
    val rCnt = countsFor(rEv, priced)

    val scale = 1.0 / sampleFraction
    val pricedBoth = priced.filter(k => lCnt.contains(k) && rCnt.contains(k))
    val products = pricedBoth.map(k => (lCnt(k) * scale) * (rCnt(k) * scale))
    val pricedOut = products.sum
    // tail: matched keys the priced term does not cover, at each
    // side's average tail multiplicity (tail = everything outside
    // the priced keys present on that side)
    val tailMatched = math.max(0L, matchedKeys - pricedBoth.size)
    val tailOut = tailMatched.toDouble *
      tailAvg(lEv, lCnt, sampleFraction) * tailAvg(rEv, rCnt, sampleFraction)
    val estOut = math.round(pricedOut + tailOut)
    val hotShare =
      if (estOut <= 0L) 0.0
      else products.sorted.lastOption.getOrElse(0.0) / estOut.toDouble
    // the keys the salted arm would isolate: each priced pair that
    // individually crosses the threshold (bounded by the priced set)
    val hotKeys =
      if (estOut <= 0L) Nil
      else pricedBoth.zip(products)
        .filter { case (_, p) => p / estOut.toDouble >= hotShareThreshold }
        .map(_._1)

    // sampleFraction >= 1.0 IS the full population — a tiny exact
    // side (a 20-row dimension) is complete evidence, not a thin
    // sample, so the floor applies only to genuine samples
    val enough = sampleFraction >= 1.0 ||
      (lEv.stats.sampledRows >= minSampleRows &&
        rEv.stats.sampledRows >= minSampleRows)
    // bb <= 0 means broadcasting is disabled and must not be advised
    val rec =
      if (!enough) "insufficient-sample"
      else if (bb > 0 && rEv.stats.estBytes <= bb &&
        rEv.stats.estBytes <= lEv.stats.estBytes) "broadcast-right"
      else if (bb > 0 && lEv.stats.estBytes <= bb) "broadcast-left"
      else if (hotShare >= hotShareThreshold) "salted-shuffle"
      else "shuffle"
    Report(lEv.stats, rEv.stats, matchedKeys, estOut, hotShare, rec, hotKeys)
  }

  private final case class SideEvidence(
      stats: SideStats,
      sketch: Array[Byte],
      hist: DataFrame)

  /** Durable per-TABLE pre-flight evidence on the [[graft.queries.IndexArtifact]]
    * layout: full-pass row count, Catalyst byte estimate, theta key
    * sketch, and the top-`histK` sampled key histogram. Built once per
    * table per key set (one pass over the key columns), it prices
    * every future join of that table against any other stats-indexed
    * table WITHOUT touching either side's data — the recurring-join
    * complement of [[report]]'s live scans, the same evidence shape
    * ANALYZE feeds a warehouse CBO.
    *
    * Honest scope, enforced loudly by [[reportFromStats]]:
    *   - key TYPES must match pairwise between the two artifacts —
    *     the stored rendering is each side's native one, and a
    *     mixed-type pair joins on a coerced type whose rendering the
    *     artifacts cannot reconstruct (run the live report there);
    *   - both artifacts must share a sample fraction (the pricing
    *     scale is global);
    *   - the histogram is TRUNCATED at `histK`: a priced key below
    *     this side's top-histK reads as tail (average multiplicity)
    *     instead of its true sampled count — size histK well above
    *     the pricing topK so the one-sided-hitter precision survives;
    *   - `estBytes` is frozen at build time; a table that grew since
    *     should rebuild (the build is one pass over the key columns —
    *     nightly-rebuild cheap, like every artifact on this layout).
    */
  final case class KeyStats(
      keys: Seq[String], keyTypes: Seq[String],
      rows: Long, estBytes: Long, sampledRows: Long,
      sampleFraction: Double, histK: Int,
      sketch: Array[Byte], hist: DataFrame) {
    def save(path: String): Unit = {
      val spark = hist.sparkSession
      import spark.implicits._
      graft.queries.IndexArtifact.save(path,
        Map("hist" -> hist,
          // ordinal column: key PAIRING is positional, and a parquet
          // read returns rows in any order
          "keyinfo" -> keys.zip(keyTypes).zipWithIndex
            .map { case ((k, t), i) => (i, k, t) }.toDF("ord", "key", "type"),
          "sketch" -> Seq(Tuple1(sketch)).toDF("sk")),
        meta = Map("rows" -> rows, "est_bytes" -> estBytes,
          "sampled_rows" -> sampledRows,
          "sample_ppm" -> math.round(sampleFraction * 1e6),
          "hist_k" -> histK.toLong))
    }
  }

  object KeyStats {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): KeyStats = {
      val meta = graft.queries.IndexArtifact.meta(spark, path)
      val info = graft.queries.IndexArtifact.frame(spark, path, "keyinfo")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).map(t => (t._2, t._3)).toSeq
      KeyStats(info.map(_._1), info.map(_._2),
        meta("rows"), meta("est_bytes"), meta("sampled_rows"),
        meta("sample_ppm") / 1e6, meta("hist_k").toInt,
        graft.queries.IndexArtifact.frame(spark, path, "sketch")
          .head().getAs[Array[Byte]](0),
        graft.queries.IndexArtifact.frame(spark, path, "hist"))
    }
  }

  /** Build [[KeyStats]] in the same two passes [[report]] spends per
    * side: one full aggregate (count + theta sketch), one sampled
    * histogram kept to its top `histK` keys. Keys render NATIVELY
    * (`\u0001`-joined string casts) — identical to the live report's
    * rendering exactly when the joined types match, which is the
    * contract [[reportFromStats]] enforces. */
  def buildKeyStats(df: DataFrame, keys: Seq[String],
                    sampleFraction: Double = 0.01,
                    histK: Int = 8192): KeyStats = {
    require(keys.nonEmpty, "key stats need at least one key column")
    keys.foreach(k => require(df.columns.contains(k),
      s"key column '$k' not in ${df.columns.mkString(",")}"))
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(histK > 0, s"histK must be positive, got $histK")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    val keyed = df.filter(keysNotNull(keys))
      .select(concat_ws("\u0001", keys.map(col(_).cast("string")): _*)
        .as("__jp_key"))
    val fullRow = keyed.agg(
      count(lit(1)).as("n"),
      graft.functions.ThetaSketch.sketchAgg(col("__jp_key")).as("sk"))
      .head()
    val sampled =
      if (sampleFraction >= 1.0) keyed
      else keyed.sample(withReplacement = false, sampleFraction, seed = 42L)
    val histFull = sampled.groupBy("__jp_key")
      .agg(count(lit(1)).as("c")).persist()
    try {
      val sampledN = histFull.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
      val top = histFull.orderBy(col("c").desc, col("__jp_key"))
        .limit(histK).localCheckpoint(true)
      KeyStats(keys, keys.map(k => df.schema(k).dataType.catalogString),
        fullRow.getLong(0), estBytes, sampledN, sampleFraction, histK,
        fullRow.getAs[Array[Byte]](1), top)
    } finally histFull.unpersist()
  }

  /** Price a join from two [[KeyStats]] artifacts — no scan of either
    * table. Same verdict math as [[report]]; see [[KeyStats]] for the
    * loud scope checks. */
  def reportFromStats(
      spark: org.apache.spark.sql.SparkSession,
      l: KeyStats, r: KeyStats,
      topK: Int = 64,
      broadcastBytes: Long = sessionBroadcastBytes,
      hotShareThreshold: Double = defaultHotShareThreshold): Report = {
    require(l.keys.size == r.keys.size,
      s"key lists differ in arity: ${l.keys} vs ${r.keys}")
    val mismatched = l.keyTypes.zip(r.keyTypes).zipWithIndex
      .filter { case ((a, b), _) => a != b }
    require(mismatched.isEmpty,
      s"mixed-type key pair(s) ${mismatched.map { case ((a, b), i) =>
        s"${l.keys(i)}:$a vs ${r.keys(i)}:$b" }.mkString(", ")} — " +
        "stats artifacts store each side's NATIVE rendering and cannot " +
        "reconstruct the join's coerced type; run the live join-report")
    require(l.sampleFraction == r.sampleFraction,
      s"sample fractions differ (${l.sampleFraction} vs ${r.sampleFraction}) — " +
        "the pricing scale is global; rebuild one artifact to match")
    require(topK > 0, s"topK must be positive, got $topK")
    def ev(a: KeyStats): SideEvidence = {
      val ndv = math.round(org.apache.datasketches.theta.Sketch
        .heapify(org.apache.datasketches.memory.Memory.wrap(a.sketch))
        .getEstimate)
      val maxC = a.hist.agg(coalesce(max("c"), lit(0L))).head().getLong(0)
      val topShare =
        if (a.sampledRows == 0L) 0.0 else maxC.toDouble / a.sampledRows
      SideEvidence(
        SideStats(a.rows, a.estBytes, ndv, a.sampledRows, topShare),
        a.sketch, a.hist)
    }
    val bb =
      if (broadcastBytes != sessionBroadcastBytes) broadcastBytes
      else spark.sessionState.conf.autoBroadcastJoinThreshold
    verdict(ev(l), ev(r), l.sampleFraction, topK, bb, hotShareThreshold)
  }

  /** Composite key on the JOIN's comparison semantics where possible:
    * per component pair, same type → as-is; both integral → LONG;
    * decimal vs decimal/integral → the WIDENED COMMON DECIMAL (the
    * join compares exactly there; rendering through double would
    * collide distinct ids beyond 2^53 and over-count matches); mixed
    * with FLOAT/DOUBLE → DOUBLE (SQL's own lossy common type for
    * `bigint = double`); anything else falls back to per-side string
    * rendering (documented divergence). Both sides cast to the SAME
    * decimal type so the string renderings agree on trailing zeros.
    * Components render `\u0001`-separated so ("a","bc") and ("ab","c")
    * stay distinct. */
  private def coercedKeyExprs(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String]): (Column, Column) = {
    import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}
    def integral(dt: DataType): Boolean =
      dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    // exact numeric types as (precision, scale); None for float/double
    def decimalShape(dt: DataType): Option[(Int, Int)] = dt match {
      case d: DecimalType => Some((d.precision, d.scale))
      case ByteType       => Some((3, 0))
      case ShortType      => Some((5, 0))
      case IntegerType    => Some((10, 0))
      case LongType       => Some((20, 0))
      case _              => None
    }
    val pairs = leftKeys.zip(rightKeys).map { case (lk, rk) =>
      val (lt, rt) = (left.schema(lk).dataType, right.schema(rk).dataType)
      if (lt == rt) (col(lk), col(rk))
      else if (integral(lt) && integral(rt))
        (col(lk).cast("long"), col(rk).cast("long"))
      else if ((lt.isInstanceOf[DecimalType] || rt.isInstanceOf[DecimalType]) &&
        decimalShape(lt).isDefined && decimalShape(rt).isDefined) {
        // widened common decimal: integer digits and scale both cover
        // each side; at the 38-precision ceiling integer digits win
        // (key ids live there — losing scale only merges sub-cent
        // fractions, losing integer digits merges whole id ranges)
        val (Some((p1, s1)), Some((p2, s2))) = (decimalShape(lt), decimalShape(rt))
        val intDigits = math.max(p1 - s1, p2 - s2)
        val scale = math.min(math.max(s1, s2),
          math.max(0, DecimalType.MAX_PRECISION - intDigits))
        val common = DecimalType(
          math.min(DecimalType.MAX_PRECISION, intDigits + scale), scale)
        (col(lk).cast(common), col(rk).cast(common))
      }
      else if (lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType])
        (col(lk).cast("double"), col(rk).cast("double"))
      else (col(lk), col(rk))
    }
    (concat_ws("\u0001", pairs.map(_._1.cast("string")): _*),
      concat_ws("\u0001", pairs.map(_._2.cast("string")): _*))
  }

  /** SQL equi-joins never match null keys, so rows with any null key
    * component are excluded from every count, sketch, and histogram. */
  private def keysNotNull(keys: Seq[String]): Column =
    keys.map(c => col(c).isNotNull).reduce(_ && _)

  /** Full-pass count/bytes/sketch + the persisted sampled histogram
    * for one side. Scans: one full pass over the key columns, one
    * sampled pass materializing the histogram (top-K, priced-key
    * lookups and tail sums all read the persisted frame). */
  private def sideEvidence(
      df: DataFrame, keys: Seq[String], keyExpr: Column,
      sampleFraction: Double): SideEvidence = {
    // Catalyst's own size estimate — what Spark compares against
    // autoBroadcastJoinThreshold (file-size based for file sources)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    val keyed = df
      .filter(keysNotNull(keys))
      .select(keyExpr.as("__jp_key"))
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
    val hist = sampled.groupBy("__jp_key").agg(count(lit(1)).as("c")).persist()
    val sampledRow = hist
      .agg(coalesce(sum("c"), lit(0L)).as("n"),
        coalesce(max("c"), lit(0L)).as("mx"))
      .head()
    val (sampledN, maxC) = (sampledRow.getLong(0), sampledRow.getLong(1))
    val topShare = if (sampledN == 0L) 0.0 else maxC.toDouble / sampledN
    SideEvidence(
      SideStats(rows, estBytes, ndv, sampledN, topShare), sketch, hist)
  }

  /** Top-K sampled keys by count (TakeOrdered: K rows to the driver),
    * count-desc with a key tiebreak for determinism. */
  private def topKeys(ev: SideEvidence, topK: Int): Seq[String] =
    ev.hist.orderBy(col("c").desc, col("__jp_key")).limit(topK)
      .select("__jp_key").collect().map(_.getString(0)).toSeq

  /** Beyond this many priced keys an `isin` literal list stops being
    * the right plan: a multi-thousand-element In/InSet expression is
    * slow to construct, stringify, and ship with the plan. Bigger sets
    * semi-join the histogram against a broadcast literal frame. */
  private val maxIsinKeys = 256

  /** Sampled counts for the priced keys, read from the persisted
    * histogram — keys absent from this side's sample are absent from
    * the map (and contribute nothing to any product). Small priced
    * sets read through an `isin` (pushdown-friendly); large ones
    * through a broadcast join against a literal key frame, which
    * keeps the plan tree small at histogram-scale topK. */
  private def countsFor(
      ev: SideEvidence, priced: Seq[String]): Map[String, Long] = {
    if (priced.isEmpty) Map.empty
    else if (priced.size <= maxIsinKeys)
      ev.hist.filter(col("__jp_key").isin(priced: _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    else {
      val spark = ev.hist.sparkSession
      import spark.implicits._
      val pricedDf = priced.toDF("__jp_key")
      ev.hist.join(broadcast(pricedDf), "__jp_key")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
  }

  /** Average tail multiplicity in FULL-data terms: sampled tail rows
    * scale by 1/f; the tail KEY count comes from the full-pass NDV
    * (sampled distinct undercounts rare keys, the sketch does not). */
  private def tailAvg(
      ev: SideEvidence, pricedCnt: Map[String, Long],
      sampleFraction: Double): Double = {
    val tailRows = ev.stats.sampledRows - pricedCnt.values.sum
    val tailKeys = math.max(1L, ev.stats.estDistinctKeys - pricedCnt.size)
    if (tailRows <= 0L) 0.0
    else (tailRows / sampleFraction) / tailKeys.toDouble
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The EXECUTABLE pre-flight: run [[report]], then build the inner
    * equi-join the verdict prescribes — the same advice-to-plan step
    * [[graft.plans.AsOfJoin.joinSkewAware]] takes for the as-of join.
    * Returns the joined frame plus the report it acted on; every
    * routing decision logs loudly.
    *
    *   - `broadcast-left` / `broadcast-right`: a `broadcast()` hint on
    *     the small side — the plan the session's own threshold says it
    *     wants, forced so a stale or missing statistic can't shuffle a
    *     dimension table.
    *   - `salted-shuffle`: the hot keys (from the report — bounded,
    *     at most 1/threshold of them) split out of BOTH sides; hot
    *     left rows pick a random salt in [0, buckets), hot right rows
    *     replicate once per salt value, and the hot arm joins on
    *     (keys, salt) so the hottest key spreads over `buckets` tasks
    *     instead of serializing one. The tail arm joins plain, and
    *     the union is exactly the inner join's row set: routing is by
    *     the key VALUE (same rendering on both sides), so both sides
    *     of any matching pair land in the same arm, and null-keyed
    *     rows match nothing in either. Replication is hot-keys-only —
    *     the catastrophic "explode the whole build side" salting is
    *     never paid.
    *   - `shuffle` / `insufficient-sample`: the plain join untouched.
    *
    * Output columns are the plain join's: left's then right's, both
    * sides complete (key columns from both sides, like
    * `left.join(right, cond)`). Inner joins only — the split-arm
    * union argument above is an inner-join identity; outer variants
    * need null-extension bookkeeping this does not do.
    *
    * `saltBuckets` = 0 derives the bucket count from the session's
    * shuffle parallelism — the same ceiling the as-of salter uses. */
  def joinAdvised(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String],
      sampleFraction: Double = 0.01,
      topK: Int = 64,
      broadcastBytes: Long = sessionBroadcastBytes,
      hotShareThreshold: Double = defaultHotShareThreshold,
      saltBuckets: Int = 0): (DataFrame, Report) = {
    require(saltBuckets >= 0, s"saltBuckets must be >= 0, got $saltBuckets")
    val rep = report(left, leftKeys, right, rightKeys,
      sampleFraction, topK, broadcastBytes, hotShareThreshold)
    def cond(lf: DataFrame, rf: DataFrame): Column =
      leftKeys.zip(rightKeys).map { case (lk, rk) => lf(lk) === rf(rk) }
        .reduce(_ && _)
    val joined = rep.recommendation match {
      case "broadcast-right" =>
        log.info(s"join pre-flight: broadcasting right " +
          s"(${rep.right.estBytes} bytes, ${rep.right.rows} rows)")
        left.join(broadcast(right), cond(left, right), "inner")
      case "broadcast-left" =>
        log.info(s"join pre-flight: broadcasting left " +
          s"(${rep.left.estBytes} bytes, ${rep.left.rows} rows)")
        broadcast(left).join(right, cond(left, right), "inner")
      case "salted-shuffle" if rep.hotKeys.nonEmpty =>
        val spark = left.sparkSession
        val buckets =
          if (saltBuckets > 0) saltBuckets
          else math.max(2, spark.sessionState.conf.numShufflePartitions)
        log.info(s"join pre-flight: salting ${rep.hotKeys.size} hot " +
          s"key(s) over $buckets buckets (hot pair share " +
          f"${rep.hotPairShare}%.2f of est. ${rep.estOutputRows} rows)")
        val (lKey, rKey) = coercedKeyExprs(left, leftKeys, right, rightKeys)
        val hot = rep.hotKeys
        // routing is by the rendered key value — identical on both
        // sides, so matching rows always land in the same arm
        val lHot = left.filter(lKey.isin(hot: _*))
          .withColumn("__jp_salt",
            floor(rand(42L) * buckets).cast(IntegerType))
        val rHot = right.filter(rKey.isin(hot: _*))
          .withColumn("__jp_salt",
            explode(sequence(lit(0), lit(buckets - 1))))
        val hotArm = lHot.join(rHot,
            cond(lHot, rHot) && lHot("__jp_salt") === rHot("__jp_salt"),
            "inner")
          .drop(lHot("__jp_salt")).drop(rHot("__jp_salt"))
        val lTail = left.filter(!lKey.isin(hot: _*))
        val rTail = right.filter(!rKey.isin(hot: _*))
        hotArm.unionAll(lTail.join(rTail, cond(lTail, rTail), "inner"))
      case other =>
        log.info(s"join pre-flight: plain shuffle join ($other)")
        left.join(right, cond(left, right), "inner")
    }
    (joined, rep)
  }
}
