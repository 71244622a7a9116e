package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic distributed interval-overlap join — interval × interval,
  * the operator class `q_interval_overlap` instantiates (reference has
  * no joins at all; this is part of the additive analytics surface).
  *
  * Semantics: both sides carry half-open `[start, end)` intervals in
  * the same (integral, typically epoch-ms) unit; a pair matches iff the
  * intervals share a key AND genuinely overlap (`lStart < rEnd && rStart
  * < lEnd`, both nonempty). Spark has no native interval join and the
  * inequality-only formulation plans as a nested-loop cross product —
  * the scale-correct form BUCKETS both interval sets by the
  * `bucketMs`-wide slots they span (explode over span/bucket + 1
  * slots), equi-joins on (keys, bucket) — a hash join Catalyst can
  * shuffle, broadcast, and AQE-skew-split — with the exact overlap
  * predicate as a residual, and keeps each overlapping pair EXACTLY
  * ONCE with no distinct: a pair is counted only in the bucket
  * containing the overlap's START, `greatest(lStart, rStart) div
  * bucket`, which lies inside both intervals (the overlap is nonempty)
  * and therefore inside both sides' replication ranges. Correctness is
  * therefore INDEPENDENT of the bucket width (IntervalJoinSpec pins
  * result equality across widths); width only moves the
  * replication-vs-candidates tradeoff below.
  *
  * Bucket width: replication is O(intervalLen / bucket + 1) rows per
  * interval (too-small buckets explode the input), while every
  * interval pair of one key sharing a bucket becomes a hash-match
  * candidate evaluated against the residual (too-large buckets
  * degenerate toward a per-key cartesian — the all-day-sessions-in-
  * one-day-bucket case). The sweet spot is a bucket about as wide as a
  * typical interval: ~2× replication, candidates only near in time.
  * With `bucketMs = None` the width is chosen from the data — one
  * metadata-scale aggregate over both sides' interval lengths, then
  * the power of two at or above `max(p95 length, maxLength/1024, 1)`
  * (p95 tracks the typical interval while one outlier can't inflate
  * the width for everyone; the maxLength/1024 floor caps any single
  * interval's replication at ~1025 rows; the power of two keeps widths
  * stable under small stat drift). Pass an explicit width when the
  * caller already knows the granularity (the day-bucketed gate) or
  * when the extra stats pass over the inputs matters.
  *
  * Scale shape: ONE exchange per side on (keys, bucket) — or zero/
  * broadcast when a side is dimension-sized — identical to any
  * equi-join; the explode happens map-side before the shuffle. Empty
  * intervals (`end <= start`) never match (the textbook overlap
  * predicate is wrong for them — `[5,5)` overlaps nothing); on the
  * left they still surface in [[overlapCount]] with a zero count.
  *
  * Column-name clashes resolve like the CLI's merge_asof convention:
  * right columns whose names collide with a left column come out
  * prefixed `right_`.
  */
object IntervalJoin {

  private val LB = "__ij_bucket_l"
  private val RB = "__ij_bucket_r"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Interval endpoints must be INTEGRAL epoch values. A TIMESTAMP
    * would silently cast to epoch SECONDS inside the bucket math —
    * still CORRECT (bucket width never changes the answer) but sized
    * 1000× off against a millisecond `bucketMs`. Fractional numerics
    * (Double/Float/Decimal) are worse than a sizing hazard: every
    * bucket expression truncates via `CAST(... AS LONG)`, so a left
    * interval [5.5, 6.5) replicates only bucket {5} while the
    * overlapping right [6.2, 7.0) lands in {6} — the pair is silently
    * DROPPED and the bucket-width-independence invariant breaks (the
    * `end - 1` last-bucket rule and the exactly-once start-bucket rule
    * are integer-grid arguments; truncation also rounds negative
    * values the wrong way). Fail loudly on both; normalize upstream
    * with `unix_millis` / by scaling to an integer grid.
    */
  private[graft] def requireIntegral(df: org.apache.spark.sql.DataFrame,
      c: String, what: String): Unit = requireNumeric(df, c, what)

  private def requireNumeric(df: org.apache.spark.sql.DataFrame,
      c: String, what: String): Unit = {
    require(df.columns.contains(c), s"$what column '$c' not in ${df.columns.mkString(",")}")
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    val dt = df.schema(c).dataType
    // DECIMAL(p, 0) is integer-valued — CAST AS LONG is exact, so the
    // bucket-grid argument against fractional types does not apply;
    // rejecting it would break valid DB/Hive-ingested epoch columns
    val integral = dt == ByteType || dt == ShortType ||
      dt == IntegerType || dt == LongType ||
      (dt match { case d: DecimalType => d.scale == 0; case _ => false })
    require(integral,
      s"$what column '$c' must be an integral epoch value, got ${dt.simpleString} " +
        "— cast TIMESTAMP/DATE via unix_millis, scale fractional values " +
        "to an integer grid upstream")
  }

  /** Power of two at or above `max(p95 interval length, maxLen/1024,
    * 1)` over BOTH sides — one small aggregate job (two scans reduced
    * to one row; lengths only, payloads never move). Public so callers
    * and specs can observe the choice the `bucketMs = None` path makes.
    */
  def adaptiveBucketMs(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String): Long = {
    val lens = left
      .select((col(leftEnd) - col(leftStart)).cast("long").as("len"))
      .unionAll(right
        .select((col(rightEnd) - col(rightStart)).cast("long").as("len")))
      .filter(col("len") > 0)
    val row = lens.agg(
      expr("approx_percentile(len, 0.95, 10000)").as("p95"),
      max(col("len")).as("mx")).head()
    if (row.isNullAt(0)) 1L // both sides empty (or all-empty intervals)
    else {
      val want = math.max(1L, math.max(row.getLong(0), row.getLong(1) / 1024L))
      if (want <= 1L) 1L else java.lang.Long.highestOneBit(want - 1L) << 1
    }
  }

  /** What [[bucketReport]] measured for a candidate bucket width: the
    * per-side replication factors (rows each interval explodes into),
    * the exact candidate-pair count the equi-join would hash-match at
    * this width (the quadratic-pressure term the residual then
    * filters), and whether the adaptive width looks materially better.
    */
  final case class BucketReport(
      bucketMs: Long,
      adaptiveMs: Long,
      leftRows: Long,
      rightRows: Long,
      leftReplication: Double,
      rightReplication: Double,
      candidatePairs: Long,
      recommendAdaptive: Boolean)

  /** Diagnostic twin of the width heuristic — the detect half that
    * makes a PINNED `bucketMs` auditable before a 100 TB run. Cost:
    * payloads never move — each side is scanned for its persisted
    * (keys, bucket, count) slot frame plus once for its row count, and
    * the width stats pass scans the endpoint columns; everything after
    * that (totals, the candidate join) runs over the slot-scale
    * frames. The report prices a width as (replication per side,
    * exact candidate-pair count). Too-small buckets inflate replication; too-large buckets
    * collapse a key's intervals into few buckets and the candidate
    * count degenerates toward the per-key cartesian — the all-day-
    * sessions-in-one-day-bucket failure. `recommendAdaptive` fires
    * when the probed width sits ≥ 8× off the adaptive choice on
    * either side of the tradeoff; the join APIs stay silent — call
    * this explicitly (or just pass `bucketMs = None` and let the
    * adaptive path choose).
    */
  def bucketReport(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketMs: Option[Long] = None): BucketReport = {
    requireNumeric(left, leftStart, "left start")
    requireNumeric(left, leftEnd, "left end")
    requireNumeric(right, rightStart, "right start")
    requireNumeric(right, rightEnd, "right end")
    // same reserved-namespace rule as the operator itself: the slot
    // frames introduce __ij_b and __ij_n, and a key column shadowing
    // either would mis-bind the aggregates below
    (keys.flatMap(k => Seq(k._1, k._2)) ++
        Seq(leftStart, leftEnd, rightStart, rightEnd)).foreach { c =>
      require(c != "__ij_b" && c != "__ij_n",
        "__ij_b/__ij_n are reserved internal column names")
    }
    val adaptive = adaptiveBucketMs(
      left, leftStart, leftEnd, right, rightStart, rightEnd)
    val b = bucketMs.getOrElse(adaptive)
    require(b > 0, s"bucketMs must be positive, got $b")
    def slots(df: DataFrame, ks: Seq[String], s: String, e: String) = df
      .select((ks.map(col) :+ explode(sequence(
        expr(s"CAST($s AS LONG) div $b"),
        greatest(expr(s"CAST($s AS LONG) div $b"),
          expr(s"(CAST($e AS LONG) - 1) div $b")))).as("__ij_b")): _*)
      .groupBy((ks.map(col) :+ col("__ij_b")): _*)
      .agg(count(lit(1)).as("__ij_n"))
    // each slot frame feeds TWO consumers (its rows total and the
    // candidate join), and its lineage rescans the raw input — persist
    // so the report costs one pass per side plus the slot-scale join,
    // not a fresh input scan per consumer
    val lSlots = slots(left, keys.map(_._1), leftStart, leftEnd)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rSlots = slots(right, keys.map(_._2), rightStart, rightEnd)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val lAgg = lSlots.agg(sum("__ij_n").as("rows")).head()
    val rAgg = rSlots.agg(sum("__ij_n").as("rows")).head()
    val lRows = if (lAgg.isNullAt(0)) 0L else lAgg.getLong(0)
    val rRows = if (rAgg.isNullAt(0)) 0L else rAgg.getLong(0)
    val nLeft = left.count()
    val nRight = right.count()
    // exact candidate pressure: sum over shared (keys, bucket) slots of
    // |L_slot| x |R_slot| — what the equi-join hash-matches pre-residual
    val joinCond = keys.map { case (lk, rk) => lSlots(lk) === rSlots(rk) }
      .foldLeft(lSlots("__ij_b") === rSlots("__ij_b"))(_ && _)
    val candRow = lSlots.as("ls").join(rSlots.as("rs"), joinCond)
      .agg(sum(col("ls.__ij_n") * col("rs.__ij_n")).as("cand")).head()
    val cand = if (candRow.isNullAt(0)) 0L else candRow.getLong(0)
    val report = BucketReport(
      bucketMs = b,
      adaptiveMs = adaptive,
      leftRows = lRows,
      rightRows = rRows,
      leftReplication = if (nLeft == 0) 0.0 else lRows.toDouble / nLeft,
      rightReplication = if (nRight == 0) 0.0 else rRows.toDouble / nRight,
      candidatePairs = cand,
      recommendAdaptive =
        bucketMs.exists(w => w >= adaptive * 8 || w * 8 <= adaptive))
    if (report.recommendAdaptive)
      log.warn(s"interval-join bucket width $b ms sits >=8x off the " +
        s"adaptive choice $adaptive ms: replication " +
        f"${report.leftReplication}%.1fx/${report.rightReplication}%.1fx, " +
        s"$cand candidate pairs — consider bucketMs = None")
    report
    } finally { lSlots.unpersist(); rSlots.unpersist() }
  }

  /** The matched PAIRS, each exactly once: all left columns plus all
    * right columns (clashes prefixed `right_`). Inner by construction
    * — use [[overlapCount]] for the left-total census.
    */
  def overlap(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketMs: Option[Long] = None): DataFrame = {
    val (lB, rB, pred) = bucketed(left, right, keys,
      leftStart, leftEnd, rightStart, rightEnd, bucketMs)
    lB.join(rB, pred).drop(LB, RB)
  }

  /** Left-total overlap census: one row per DISTINCT left row carrying
    * every left column plus `n_overlaps` — zero for intervals nothing
    * overlaps (and for empty left intervals). Left-totality comes from
    * the LEFT OUTER join itself (every left interval keeps ≥ 1 bucket
    * row; all predicates live in the ON clause), so the left subtree is
    * never recomputed by a join-back; the aggregate groups by every
    * left column (constant across an interval's bucket replicas) — rows
    * identical in ALL columns therefore merge, with their matches
    * summed: feed a distinct-making id when that matters.
    */
  def overlapCount(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketMs: Option[Long] = None): DataFrame = {
    val (lB, rB, pred) = bucketed(left, right, keys,
      leftStart, leftEnd, rightStart, rightEnd, bucketMs)
    lB.join(rB, pred, "left_outer")
      .groupBy(left.columns.toIndexedSeq.map(col): _*)
      .agg(count(col(RB)).as("n_overlaps"))
  }

  /** Point-in-interval join (`start <= p < end`) — the q_range_join
    * shape generalized: each POINT lands in exactly one bucket, so only
    * the interval side replicates and no exactly-once residual is
    * needed. Returns the matched pairs (interval columns + point
    * columns, clashes `right_`-prefixed). Empty intervals contain
    * nothing (`p >= s && p < e` is unsatisfiable when `e <= s`).
    */
  def contains(
      intervals: DataFrame, points: DataFrame,
      keys: Seq[(String, String)],
      start: String, end: String, pointCol: String,
      bucketMs: Option[Long] = None): DataFrame = {
    val (iB, pB, pred) = bucketedContains(
      intervals, points, keys, start, end, pointCol, bucketMs)
    iB.join(pB, pred).drop(LB, RB)
  }

  /** Left-total point census: one row per distinct interval row with
    * `n_matches` — zero for intervals containing nothing. Same
    * zero-join-back construction as [[overlapCount]] (LEFT OUTER with
    * every predicate in ON, aggregate over the interval columns), so a
    * dimension-sized side keeps the whole census at ONE hash exchange.
    */
  def containsCount(
      intervals: DataFrame, points: DataFrame,
      keys: Seq[(String, String)],
      start: String, end: String, pointCol: String,
      bucketMs: Option[Long] = None): DataFrame = {
    val (iB, pB, pred) = bucketedContains(
      intervals, points, keys, start, end, pointCol, bucketMs)
    iB.join(pB, pred, "left_outer")
      .groupBy(intervals.columns.toIndexedSeq.map(col): _*)
      .agg(count(col(RB)).as("n_matches"))
  }

  private def bucketedContains(
      intervals: DataFrame, points: DataFrame,
      keys: Seq[(String, String)],
      start: String, end: String, pointCol: String,
      bucketMs: Option[Long]): (DataFrame, DataFrame, Column) = {
    require(!intervals.columns.contains(LB) && !points.columns.contains(RB),
      s"$LB/$RB are reserved internal column names")
    keys.foreach { case (lk, rk) =>
      require(intervals.columns.contains(lk),
        s"interval key '$lk' not in ${intervals.columns.mkString(",")}")
      require(points.columns.contains(rk),
        s"point key '$rk' not in ${points.columns.mkString(",")}")
    }
    requireNumeric(intervals, start, "interval start")
    requireNumeric(intervals, end, "interval end")
    requireNumeric(points, pointCol, "point")
    bucketMs.foreach(b => require(b > 0, s"bucketMs must be positive, got $b"))
    val leftCols = intervals.columns.toSet
    val clashes = points.columns.filter(leftCols).toSet
    val p2 = clashes.foldLeft(points)((df, c) => df.withColumnRenamed(c, s"right_$c"))
    def rn(c: String) = if (clashes(c)) s"right_$c" else c
    val pc = rn(pointCol)
    val b = bucketMs.getOrElse(
      adaptiveBucketMs(intervals, start, end, intervals, start, end))
    val iB = intervals.withColumn(LB, explode(sequence(
      expr(s"CAST($start AS LONG) div $b"),
      greatest(expr(s"CAST($start AS LONG) div $b"),
        expr(s"(CAST($end AS LONG) - 1) div $b")))))
    val pB = p2.withColumn(RB, expr(s"CAST($pc AS LONG) div $b"))
    val keyPred = keys.map { case (lk, rk) => iB(lk) === pB(rn(rk)) }
      .foldLeft(lit(true))(_ && _)
    val pred = keyPred && iB(LB) === pB(RB) &&
      pB(pc) >= iB(start) && pB(pc) < iB(end)
    (iB, pB, pred)
  }

  /** Shared bucket-explode + join predicate. Empty intervals get a
    * single degenerate bucket row (greatest clamp — `sequence(a, b)`
    * with a > b would otherwise count DOWN) and are excluded from
    * matching by the nonempty terms in the predicate.
    */
  private def bucketed(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketMs: Option[Long]): (DataFrame, DataFrame, Column) = {
    require(!left.columns.contains(LB) && !right.columns.contains(RB),
      s"$LB/$RB are reserved internal column names")
    keys.foreach { case (lk, rk) =>
      require(left.columns.contains(lk), s"left key '$lk' not in ${left.columns.mkString(",")}")
      require(right.columns.contains(rk), s"right key '$rk' not in ${right.columns.mkString(",")}")
    }
    requireNumeric(left, leftStart, "left start")
    requireNumeric(left, leftEnd, "left end")
    requireNumeric(right, rightStart, "right start")
    requireNumeric(right, rightEnd, "right end")
    bucketMs.foreach(b => require(b > 0, s"bucketMs must be positive, got $b"))
    // clash prefix BEFORE composing: predicates then bind by plain name
    // on the joined frame with no ambiguity
    val leftCols = left.columns.toSet
    val clashes = right.columns.filter(leftCols).toSet
    val r2 = clashes.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"right_$c"))
    def rn(c: String) = if (clashes(c)) s"right_$c" else c
    val (rS, rE) = (rn(rightStart), rn(rightEnd))
    val b = bucketMs.getOrElse(
      adaptiveBucketMs(left, leftStart, leftEnd, right, rightStart, rightEnd))
    def spans(df: DataFrame, s: String, e: String, out: String) =
      df.withColumn(out, explode(sequence(
        expr(s"CAST($s AS LONG) div $b"),
        greatest(expr(s"CAST($s AS LONG) div $b"),
          expr(s"(CAST($e AS LONG) - 1) div $b")))))
    val lB = spans(left, leftStart, leftEnd, LB)
    val rB = spans(r2, rS, rE, RB)
    val keyPred = keys.map { case (lk, rk) => lB(lk) === rB(rn(rk)) }
      .foldLeft(lit(true))(_ && _)
    val pred = keyPred &&
      lB(LB) === rB(RB) &&
      // exact overlap of NONEMPTY half-open intervals, as a residual
      lB(leftStart) < rB(rE) && rB(rS) < lB(leftEnd) &&
      lB(leftStart) < lB(leftEnd) && rB(rS) < rB(rE) &&
      // exactly-once: only the bucket holding the overlap's start counts
      lB(LB) === expr(s"greatest(CAST($leftStart AS LONG), CAST($rS AS LONG)) div $b")
    (lB, rB, pred)
  }
}
