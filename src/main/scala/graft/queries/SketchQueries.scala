package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable-sketch surface: HyperLogLog (DataSketches HLL via Spark's
  * native `hll_sketch_agg` / `hll_union` family) as a FIRST-CLASS
  * artifact rather than a per-query convenience.
  *
  * Why this is its own family: at 100 TB the expensive thing about
  * `count(DISTINCT x)` is not the counting, it is the re-scanning.
  * Every rolling window, every source pair, every "and how many after
  * today's batch?" re-shuffles the raw keys. A mergeable sketch inverts
  * the cost: ONE corpus-scale pass builds kilobyte summaries at some
  * grain (day, source, shard), and every downstream question — rolling
  * distinct, pairwise overlap, incremental refresh — is algebra over
  * those summaries, touching data proportional to the GRAIN COUNT, not
  * the corpus. Sketch union is closed and lossless at the register
  * level, so summaries can be persisted and re-merged across days
  * ([[HllIndex]]).
  *
  * Determinism contract — WEAKER than Spark's own
  * `approx_count_distinct` (order-free dense HLL++): DataSketches HLL
  * estimates through the HIP (Historical Inverse Probability)
  * accumulator, which is insertion- and merge-ORDER SENSITIVE, so the
  * same multiset can estimate sub-percent differently under different
  * partitionings (SketchSpec measures ~0.7% spread at 50k and BOUNDS
  * it). That is why every driver-facing gate here outputs the group
  * keys, the EXACT anchors, and integer accuracy verdicts the oracle
  * pins as literal 1s — a 5% envelope over sub-percent wobble keeps
  * the hash stable while still catching real register corruption; raw
  * estimates stay spec-gated.
  */
object SketchQueries {

  /** lgConfigK for every sketch this module builds: 2^14 registers ≈
    * 0.8% relative standard error, 16 KiB worst-case per sketch — small
    * enough that a year of daily sketches broadcasts, accurate enough
    * that inclusion–exclusion intersections stay inside a 5%-of-union
    * envelope. One constant everywhere: `hll_union` rejects mixed-lgK
    * inputs unless told otherwise, and silent precision downgrades are
    * exactly the kind of drift an index that lives across nightly runs
    * must not have. */
  val LgK = 14

  private val DayMs = 86400000L

  private def pq(spark: SparkSession, dir: String, t: String): DataFrame =
    graft.model.Tables.pq(spark, dir, t)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** `|approx − exact| · 20 ≤ max(exact, slack)` — the integer
    * cross-multiplied 5%-of-`rel` envelope (±`slack`/20 absolute slack
    * on tiny groups), the same shape `e_approx_distinct` gates with. */
  private def within5pct(approx: Column, exact: Column, rel: Column,
      slack: Long = 20L): Column =
    (abs(approx - exact) * 20 <= greatest(rel, lit(slack))).cast(LongType)

  /** Trailing 7-day distinct users per day, the sketch way: one
    * corpus-scale aggregate folds events into PER-DAY HLL sketches
    * (map-side partials carry registers, never user ids), then each
    * day's sketch is replicated to the ≤ 7 windows it serves — a
    * day-count-scale explode of kilobyte rows — and `hll_union_agg`
    * merges each window's ≤ 7 sketches. Total post-scan work is
    * O(days × 7 × 16 KiB) whatever the event count; the exact
    * formulation re-shuffles the (day, user) universe once per window
    * width and must hold each window's full user set to count it.
    *
    * The exact anchor below exists to make the gate checkable (the
    * driver hashes exact counts + verdicts, estimates are
    * engine-specific); production runs the sketch branch alone.
    * Windows are anchored on days that EXIST in the data (join back to
    * the day table), so a silent empty day shows up as a smaller
    * rolling count, never as a phantom row.
    */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = pq(spark, dir, "events")
      .select(expr(s"((ts div 1000000) div $DayMs) * $DayMs").as("day_ms"),
        col("user_id"))
    // sketch branch: the corpus touches this ONE aggregate; the result
    // is day-count-scale kilobytes, persisted so the day anchor, the
    // window estimates, and the final join all reuse it instead of
    // re-scanning events (column pruning would otherwise rewrite each
    // derived frame into its own scan)
    val perDay = ev.groupBy("day_ms")
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("sk"))
      .persist()
    val days = perDay.select(col("day_ms").as("target_day"))
    def toWindows(df: DataFrame): DataFrame = df
      .withColumn("target_day",
        explode(sequence(col("day_ms"), col("day_ms") + lit(6 * DayMs),
          lit(DayMs))))
      .drop("day_ms")
      .join(broadcast(days), "target_day")
    val est = toWindows(perDay)
      .groupBy("target_day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est"))
    // exact anchor (gate-only): distinct (day, user) pairs, re-keyed to
    // the windows they serve — the cost the sketch branch avoids
    val exact = toWindows(ev.distinct())
      .groupBy("target_day")
      .agg(countDistinct("user_id").as("n_exact"))
    graft.operators.CacheRelease.afterConsumer(perDay)
    exact.join(broadcast(est), "target_day")
      .select(col("target_day").as("day_ms"), col("n_exact"),
        within5pct(col("n_est"), col("n_exact"), col("n_exact"))
          .as("within_5pct"))
      .orderBy("day_ms")
  }

  /** Per-source distinct word-3-gram sketches over `documents` — the
    * reusable half of [[sourceOverlapSketch]] and the build step of the
    * `hll` index kind. One distinct (source, gram) pass (the SAME first
    * aggregate the exact [[TextQueries.sourceOverlap]] pays), folded to
    * one 16 KiB sketch + one exact gram count per source. */
  def sourceGramSketches(corpus: DataFrame): DataFrame =
    corpus
      .select(col("source"),
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      .distinct()
      .groupBy("source")
      .agg(hll_sketch_agg(col("g"), lit(LgK)).as("sk"),
        count(lit(1)).as("n_grams"))

  /** Inter-source content overlap via sketch inclusion–exclusion:
    * `|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)`, with the union estimated
    * by `hll_union` of the two PER-SOURCE sketches. The exact
    * [[TextQueries.sourceOverlap]] must carry every gram's source set
    * across an exchange; this variant's pair stage touches only
    * |sources|² sketch rows — per-source sketches broadcast onto the
    * pair list twice, and the vocabulary never crosses an exchange a
    * second time. At 100 TB the pair list itself comes from the
    * metadata-scale source catalog; here it rides the exact pair table
    * because the gate needs exact `n_shared` anyway (pairs sharing zero
    * grams stay omitted, matching the exact operator's contract).
    *
    * IE intersections are differences of three estimates, so their
    * error scales with the UNION, not the intersection — the verdict
    * envelope is 5% of the exact union (`na + nb − n_shared`), which at
    * lgK=14 (≈0.8% rsd per estimate) leaves ≥ 2× headroom while still
    * catching any real register corruption. SketchSpec asserts the
    * tighter raw accuracy on planted-overlap fixtures.
    */
  def sourceOverlapSketch(spark: SparkSession, dir: String): DataFrame = {
    // ONE distinct (source, gram) pass feeds both the exact pair anchor
    // and the per-source sketches — persisted so the corpus scans once
    // (vocab-scale rows, the same exchange output both aggregates need).
    // Column order (g, source) is deliberately NOT the exact operator's
    // (source, g): a sameResult fragment would let the cache manager
    // substitute this persisted-but-unmaterialized frame into
    // t_source_overlap's plan when both queries are PLANNED in one
    // session (the PlanSpec sweeps), silently changing that query's
    // recorded shape
    val g = docs(spark, dir)
      .select(
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"),
        col("source"))
      .distinct()
      .persist()
    // exact pair table (gate anchor): per-gram source sets exploded to
    // strict upper-triangle pair increments — pairs with zero shared
    // grams omitted, matching the exact operator's contract
    val pairs = g
      .groupBy("g").agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("cnt"))
    // per-source totals AND sketches from ONE aggregate over the shared
    // gram table (the exact operator needs its diagonal trick because it
    // has no second per-source pass; here the sketch build IS that pass)
    val perSrc = g.groupBy("source")
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(col("g"), lit(LgK)).as("sk"))
    graft.operators.CacheRelease.afterConsumer(g)
    pairs
      .join(broadcast(perSrc.select(col("source").as("src_a"),
        col("n").as("na"), col("sk").as("sk_a"))), "src_a")
      .join(broadcast(perSrc.select(col("source").as("src_b"),
        col("n").as("nb"), col("sk").as("sk_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("cnt").as("n_shared"),
        col("na").as("n_grams_a"), col("nb").as("n_grams_b"),
        within5pct(
          hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b"))
            - hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))),
          col("cnt"),
          col("na") + col("nb") - col("cnt")).as("within_env"))
      .orderBy("src_a", "src_b")
  }

  /** Source overlap through THETA sketches — the set-operation
    * complement of [[sourceOverlapSketch]]: theta's Intersection gives
    * a DIRECT |A ∩ B| estimate (error scaling with the intersection's
    * retained sample), where HLL can only difference three union-scale
    * estimates. Same plan skeleton (one distinct gram pass persisted,
    * pair anchor + per-source sketch aggregate from it, sketches
    * broadcast onto the sources²-scale pair list), run over word
    * 4-GRAMS: a deliberately different fragment from both the exact
    * 3-gram matrix and the HLL gate, so no persisted-but-unmaterialized
    * frame from one query can cache-substitute into another's plan
    * when the sweeps plan the whole board in one session — and the
    * board gets a second gram width exercised end-to-end for free.
    * SketchSpec measures the theta-vs-IE gap on a planted 1%-overlap
    * fixture where IE drowns in union-scale error.
    */
  def sourceOverlapTheta(spark: SparkSession, dir: String): DataFrame = {
    val g = docs(spark, dir)
      .select(
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 4)).as("g"),
        col("source"))
      .distinct()
      .persist()
    val pairs = g
      .groupBy("g").agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("cnt"))
    val perSrc = g.groupBy("source")
      .agg(count(lit(1)).as("n"),
        graft.functions.ThetaSketch.sketchAgg(col("g")).as("sk"))
    graft.operators.CacheRelease.afterConsumer(g)
    pairs
      .join(broadcast(perSrc.select(col("source").as("src_a"),
        col("n").as("na"), col("sk").as("sk_a"))), "src_a")
      .join(broadcast(perSrc.select(col("source").as("src_b"),
        col("n").as("nb"), col("sk").as("sk_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("cnt").as("n_shared"),
        col("na").as("n_grams_a"), col("nb").as("n_grams_b"),
        within5pct(
          graft.functions.ThetaSketch
            .intersectEstimate(col("sk_a"), col("sk_b")).cast(LongType),
          col("cnt"),
          col("na") + col("nb") - col("cnt")).as("within_env"))
      .orderBy("src_a", "src_b")
  }

  /** KLL quantile gate — and deliberately THROUGH the merge path: the
    * plan builds per-(type, day) sketches first, then folds each type's
    * day sketches with `kll_merge_agg`, because mergeability is the
    * property that justifies storing sketches at all (a week's p99 from
    * 7 daily rows, never from 7 days of raw values). Quantile estimates
    * are engine-specific, so the gate outputs the group key, the exact
    * count, and per-percentile RANK verdicts — est is a valid
    * p-quantile iff count(value < est) ≤ (p+ε)·n and
    * count(value ≤ est) ≥ (p−ε)·n, integer cross-multiplied in
    * thousandths with ε = 0.02 (KLL at k = 200 guarantees ≤ 1.65%
    * worst-case rank error even across merges) — the
    * `e_approx_quantiles` verdict shape, one broadcast of the 5-row
    * estimate table back into the events scan.
    */
  def kllQuantilesGate(spark: SparkSession, dir: String): DataFrame = {
    val ev = pq(spark, dir, "events")
      .select(col("event_type"),
        expr(s"((ts div 1000000) div $DayMs) * $DayMs").as("day_ms"),
        col("value"))
    val fns = graft.functions.KllSketch
    val est = ev
      .groupBy("event_type", "day_ms")
      .agg(fns.sketchAgg(col("value")).as("sk"), count(lit(1)).as("nd"))
      .groupBy("event_type")
      .agg(fns.mergeAgg(col("sk")).as("sk"), sum("nd").as("n"))
      .select(col("event_type"), col("n"),
        fns.quantile(col("sk"), lit(0.5)).as("p50"),
        fns.quantile(col("sk"), lit(0.9)).as("p90"),
        fns.quantile(col("sk"), lit(0.99)).as("p99"))
    val lt = (p: String) => sum((col("value") < col(p)).cast(LongType))
    val le = (p: String) => sum((col("value") <= col(p)).cast(LongType))
    val ok = (ltc: Column, lec: Column, milli: Int) =>
      (ltc * 1000 <= col("n") * (milli + 20) &&
        lec * 1000 >= col("n") * (milli - 20)).cast(LongType)
    ev.select(col("event_type"), col("value"))
      .join(broadcast(est), "event_type")
      .groupBy(col("event_type"), col("n"))
      .agg(lt("p50").as("lt50"), le("p50").as("le50"),
        lt("p90").as("lt90"), le("p90").as("le90"),
        lt("p99").as("lt99"), le("p99").as("le99"))
      .select(col("event_type"), col("n"),
        ok(col("lt50"), col("le50"), 500).as("p50_ok"),
        ok(col("lt90"), col("le90"), 900).as("p90_ok"),
        ok(col("lt99"), col("le99"), 990).as("p99_ok"))
      .orderBy("event_type")
  }

  /** Durable per-source KLL sketch artifact — the `kll` index kind:
    * one row per source holding the length-distribution sketch
    * (n_chars) and the doc count. Same nightly lifecycle as the `hll`
    * kind; [[updated]] merges batch sketches per source without
    * re-reading the indexed corpus, and [[quantiles]] answers
    * per-source (and, via [[globalQuantiles]], corpus-wide) length
    * percentiles from kilobytes — the data-card / packing-plan numbers
    * without a corpus pass. */
  final case class KllIndex(sketches: DataFrame) {
    def save(path: String): Unit =
      IndexArtifact.save(path, Map("sketches" -> sketches))

    def updated(batch: DataFrame): KllIndex = {
      val fns = graft.functions.KllSketch
      KllIndex(sketches.unionByName(buildKllIndex(batch).sketches)
        .groupBy("source")
        .agg(fns.mergeAgg(col("sk")).as("sk"), sum("n_docs").as("n_docs")))
    }

    /** Per-source quantiles of the sketched distribution. */
    def quantiles(ps: Seq[Double]): DataFrame = {
      val fns = graft.functions.KllSketch
      sketches.select(
        col("source") +: col("n_docs") +: ps.map(p =>
          fns.quantile(col("sk"), lit(p))
            .as(s"p${(p * 100).round}")): _*)
        .orderBy("source")
    }

    /** Corpus-wide quantiles by merging every source's sketch — the
      * whole point of keeping sketches instead of numbers. */
    def globalQuantiles(ps: Seq[Double]): DataFrame = {
      val fns = graft.functions.KllSketch
      val merged = sketches.agg(fns.mergeAgg(col("sk")).as("sk"),
        sum("n_docs").as("n_docs"))
      merged.select(
        col("n_docs") +: ps.map(p =>
          fns.quantile(col("sk"), lit(p)).as(s"p${(p * 100).round}")): _*)
    }
  }

  object KllIndex {
    def load(spark: SparkSession, path: String): KllIndex =
      KllIndex(IndexArtifact.frame(spark, path, "sketches"))
  }

  def buildKllIndex(corpus: DataFrame): KllIndex =
    KllIndex(corpus
      .select(col("source"), col("n_chars").cast("double").as("len"))
      .groupBy("source")
      .agg(graft.functions.KllSketch.sketchAgg(col("len")).as("sk"),
        count(lit(1)).as("n_docs")))

  /** Durable per-source HLL sketch artifact — the `hll` index kind.
    * One row per source: the gram sketch, the exact-at-build gram
    * count, and the doc count. Nightly lifecycle like every other
    * [[IndexArtifact]]: the build job pays one corpus pass, ingest-side
    * probes answer cardinality and batch-vs-corpus overlap questions
    * from kilobytes. [[updated]] is the whole point of choosing a
    * mergeable sketch: folding a batch in unions registers per source —
    * the indexed corpus is NEVER re-scanned, and estimates agree with a
    * full rebuild's to within the sketch's merge-order wobble
    * (sub-percent HIP drift; SketchSpec bounds it at 1% + 2).
    *
    * `n_grams` after [[updated]] becomes the sketch ESTIMATE for
    * sources the batch touched (the exact count would need the old
    * corpus back); `exact_grams` flags which rows still carry exact
    * counts so a probe can tell anchor from estimate.
    */
  final case class HllIndex(sketches: DataFrame) {
    def save(path: String): Unit =
      IndexArtifact.save(path, Map("sketches" -> sketches))

    /** Fold a new batch in: union batch rows per source, re-estimate
      * counts for touched sources. Old-corpus rows pass through the
      * same aggregate (union of one sketch is itself), so the merged
      * frame stays one row per source. */
    def updated(batch: DataFrame): HllIndex =
      mergeRows(buildHllIndex(batch).sketches)

    /** Fold already-built sketch rows (source, sk, n_docs) in — the
      * lambda seam: a streaming job emits closed-window sketch rows
      * ([[graft.streaming.StreamingAnalytics.streamingDistinctSketches]])
      * and the nightly fold unions them here, so the live path and the
      * durable artifact meet WITHOUT either side re-reading raw data.
      * Counts arriving as sketches are estimates by construction
      * (`exact_grams` = 0). */
    def updatedFromSketches(rows: DataFrame): HllIndex =
      mergeRows(rows.select(col("source"), col("sk"),
        hll_sketch_estimate(col("sk")).cast(LongType).as("n_grams"),
        col("n_docs"), lit(0L).as("exact_grams")))

    private def mergeRows(rows: DataFrame): HllIndex =
      HllIndex(mergeSketchRows(sketches, rows,
        sk => hll_union_agg(sk), sk => hll_sketch_estimate(sk)))

    /** Batch-vs-corpus overlap probe: sketch the incoming batch once,
      * then estimate per indexed source `|batch ∩ source|` by
      * inclusion–exclusion — the ingest-time "how much of today's crawl
      * is already in which slice?" question, answered without touching
      * the indexed corpus. Output is source-count-scale. */
    def probe(batch: DataFrame): DataFrame = {
      // GLOBAL aggregate, not a groupBy: it emits its one row even when
      // the batch yields zero grams (empty sketch, n_batch = 0), so a
      // degenerate batch probes to all-zero estimates instead of an
      // empty frame
      val bs = batch
        .select(explode(
          graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
        .distinct()
        .agg(hll_sketch_agg(col("g"), lit(LgK)).as("sk_b"),
          count(lit(1)).as("n_batch"))
      sketches
        .crossJoin(broadcast(bs))
        .select(col("source"), col("n_grams"), col("n_docs"), col("n_batch"),
          greatest(lit(0L),
            (hll_sketch_estimate(col("sk")) + hll_sketch_estimate(col("sk_b"))
              - hll_sketch_estimate(hll_union(col("sk"), col("sk_b"))))
              .cast(LongType)).as("n_shared_est"))
        .orderBy("source")
    }
  }

  object HllIndex {
    def load(spark: SparkSession, path: String): HllIndex =
      HllIndex(IndexArtifact.frame(spark, path, "sketches"))
  }

  /** One-row-per-source merge shared by the hll and theta index kinds:
    * union the sketches, sum the doc counts, and keep a stored count
    * EXACT only when its row passed through unmerged (one input row
    * carrying an exact flag); merged sources re-estimate from the
    * unioned sketch — the exact merged count would need the old corpus
    * back. */
  private def mergeSketchRows(stored: DataFrame, rows: DataFrame,
      unionAgg: Column => Column, estimate: Column => Column): DataFrame =
    stored.unionByName(rows)
      .groupBy("source")
      .agg(unionAgg(col("sk")).as("sk"),
        max("n_grams").as("n_grams_in"),
        sum("n_docs").as("n_docs"),
        count(lit(1)).as("n_rows"),
        min("exact_grams").as("exact_in"))
      .select(col("source"), col("sk"),
        when(col("n_rows") === 1, col("n_grams_in"))
          .otherwise(estimate(col("sk")).cast(LongType))
          .as("n_grams"),
        col("n_docs"),
        (col("n_rows") === 1 && col("exact_in") === 1L)
          .cast(LongType).as("exact_grams"))

  /** The theta twin of [[HllIndex]] — same artifact shape, same
    * lifecycle, DIRECT-intersection probes: where the hll kind's
    * [[HllIndex.probe]] estimates batch-vs-source containment by
    * inclusion–exclusion (error scaling with the union), this probe
    * intersects retained-key samples, so small overlaps against big
    * sources stay readable (the 7684-vs-2802 fixture in SketchSpec).
    * Trade: ~4× bigger rows (~64 KiB/source). Saved with a `_meta`
    * marker so the `overlap` CLI verb routes by artifact, not by flag.
    */
  final case class ThetaIndex(sketches: DataFrame) {
    def save(path: String): Unit =
      IndexArtifact.save(path, Map("sketches" -> sketches),
        meta = Map(ThetaIndex.MetaKey -> 1L))

    def updated(batch: DataFrame): ThetaIndex = {
      val fns = graft.functions.ThetaSketch
      ThetaIndex(mergeSketchRows(sketches, buildThetaIndex(batch).sketches,
        sk => fns.mergeAgg(sk), sk => fns.estimate(sk)))
    }

    /** Fold already-built theta sketch rows (source, sk, n_docs) in —
      * the same lambda seam [[HllIndex.updatedFromSketches]] gives the
      * hll kind: a streaming job emits closed-window sketch rows
      * ([[graft.streaming.StreamingAnalytics.streamingThetaSketches]])
      * and the nightly fold unions them here, so the live path and the
      * durable direct-intersection artifact meet WITHOUT either side
      * re-reading raw data. Counts arriving as sketches are estimates
      * by construction (`exact_grams` = 0). */
    def updatedFromSketches(rows: DataFrame): ThetaIndex = {
      val fns = graft.functions.ThetaSketch
      ThetaIndex(mergeSketchRows(sketches,
        rows.select(col("source"), col("sk"),
          fns.estimate(col("sk")).cast(LongType).as("n_grams"),
          col("n_docs"), lit(0L).as("exact_grams")),
        sk => fns.mergeAgg(sk), sk => fns.estimate(sk)))
    }

    /** Batch-vs-corpus containment via direct theta Intersection. */
    def probe(batch: DataFrame): DataFrame = {
      val fns = graft.functions.ThetaSketch
      val bs = batch
        .select(explode(
          graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
        .distinct()
        .agg(fns.sketchAgg(col("g")).as("sk_b"),
          count(lit(1)).as("n_batch"))
      sketches
        .crossJoin(broadcast(bs))
        .select(col("source"), col("n_grams"), col("n_docs"), col("n_batch"),
          greatest(lit(0L),
            fns.intersectEstimate(col("sk"), col("sk_b")).cast(LongType))
            .as("n_shared_est"))
        .orderBy("source")
    }
  }

  object ThetaIndex {
    /** `_meta` marker distinguishing a theta artifact from an hll one
      * (hll artifacts carry no `_meta`). */
    val MetaKey = "sketch_kind_theta"

    def load(spark: SparkSession, path: String): ThetaIndex =
      ThetaIndex(IndexArtifact.frame(spark, path, "sketches"))
  }

  private lazy val emptyThetaSketch: Array[Byte] =
    org.apache.datasketches.theta.UpdateSketch.builder()
      .setLogNominalEntries(graft.functions.ThetaSketch.LgK)
      .build().compact().toByteArray

  def buildThetaIndex(corpus: DataFrame): ThetaIndex = {
    val fns = graft.functions.ThetaSketch
    val nDocs = corpus.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val sk = corpus
      .select(col("source"),
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      .distinct()
      .groupBy("source")
      .agg(fns.sketchAgg(col("g")).as("sk"), count(lit(1)).as("n_grams"))
    ThetaIndex(nDocs
      .join(sk, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("sk"), lit(emptyThetaSketch)).as("sk"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("n_docs"),
        lit(1L).as("exact_grams")))
  }

  /** A valid EMPTY HLL sketch at [[LgK]] — the default for sources
    * whose docs yield zero grams (every doc shorter than the gram
    * width). `hll_union`/estimate accept it like any other sketch, so
    * such a source stays a first-class index row instead of silently
    * vanishing (which would also drop its `n_docs` from later folds). */
  private lazy val emptyHllSketch: Array[Byte] =
    new org.apache.datasketches.hll.HllSketch(LgK).toCompactByteArray

  def buildHllIndex(corpus: DataFrame): HllIndex = {
    val nDocs = corpus.groupBy("source").agg(count(lit(1)).as("n_docs"))
    // LEFT join from the doc counts: a source is defined by having
    // docs, not by having grams
    HllIndex(nDocs
      .join(sourceGramSketches(corpus), Seq("source"), "left")
      .select(col("source"),
        coalesce(col("sk"), lit(emptyHllSketch)).as("sk"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("n_docs"),
        lit(1L).as("exact_grams")))
  }
}
