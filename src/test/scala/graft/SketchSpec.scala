package graft

import graft.queries.SketchQueries
import org.apache.spark.sql.functions._

/** Mergeable-HLL surface: raw-estimate accuracy, partition-order
  * determinism, inclusion–exclusion accuracy on planted overlap, the
  * rolling-distinct gate vs a driver-side brute force, and the `hll`
  * index kind's incremental == rebuild contract. The driver gates
  * (`e_rolling_distinct`, `t_overlap_sketch`) hash exact anchors +
  * verdicts; the estimates themselves are pinned HERE.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  private def estimate(ids: org.apache.spark.sql.DataFrame): Long =
    ids.agg(hll_sketch_estimate(
        hll_sketch_agg(col("id"), lit(SketchQueries.LgK))).cast("long"))
      .head().getLong(0)

  test("hll estimate is within 3% at 50k planted distincts") {
    val est = estimate((1L to 50000L).toDF("id"))
    assert(math.abs(est - 50000L) <= 1500,
      s"estimate $est outside 3% of 50000 at lgK=${SketchQueries.LgK}")
  }

  test("hll estimate merge-order wobble is bounded (HIP estimator is order-sensitive)") {
    // DataSketches HLL is NOT exactly merge-order independent: its HIP
    // (Historical Inverse Probability) estimator depends on insertion /
    // merge order, so different partitionings land slightly different
    // estimates (measured here: ~0.7% spread at 50k). This is exactly
    // why the driver gates hash exact anchors + envelope VERDICTS and
    // never raw estimates. This test pins the wobble stays sub-percent
    // — far inside the 5% verdict envelope.
    val ids = (1L to 50000L).toDF("id")
    val ests = Seq(
      estimate(ids.repartition(1)),
      estimate(ids.repartition(13, pmod(hash(col("id")), lit(13)))),
      estimate(ids.orderBy(col("id").desc)))
    val spread = ests.max - ests.min
    assert(spread <= 1000,
      s"merge-order spread $spread > 2% of 50000 (estimates: $ests)")
    ests.foreach(e => assert(math.abs(e - 50000L) <= 1500,
      s"estimate $e outside 3% of 50000"))
  }

  test("union of split sketches equals the directly-built estimate") {
    val ids = (1L to 50000L).toDF("id")
    val direct = estimate(ids)
    val viaUnion = ids
      .withColumn("part", pmod(col("id"), lit(7)))
      .groupBy("part")
      .agg(hll_sketch_agg(col("id"), lit(SketchQueries.LgK)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long"))
      .head().getLong(0)
    assert(direct == viaUnion,
      s"union-merged estimate $viaUnion != direct $direct")
  }

  test("inclusion-exclusion intersection is accurate on planted overlap") {
    // |A| = 30k (1..30000), |B| = 30k (20001..50000): true ∩ = 10000,
    // ∪ = 50000. Each estimate carries ~0.8% rsd at lgK=14; the IE
    // difference must stay well inside the 5%-of-union gate envelope.
    val a = (1L to 30000L).toDF("id")
      .agg(hll_sketch_agg(col("id"), lit(SketchQueries.LgK)).as("sk"))
    val b = (20001L to 50000L).toDF("id")
      .agg(hll_sketch_agg(col("id"), lit(SketchQueries.LgK)).as("sk"))
    val est = a.select(col("sk").as("sk_a"))
      .join(b.select(col("sk").as("sk_b")))
      .select((hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b"))
        - hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
        .cast("long"))
      .head().getLong(0)
    assert(math.abs(est - 10000L) <= 1500,
      s"IE intersection $est outside 1500 of true 10000 (union 50000)")
  }

  test("theta sketch: estimate accurate at 50k, SQL-callable, order spread bounded") {
    val ids = (1L to 50000L).toDF("id")
    ids.createOrReplaceTempView("theta_ids")
    // registered through GraftExtensions — the pure-SQL surface
    val est = spark.sql(
      "SELECT CAST(theta_estimate(theta_sketch_agg(id)) AS BIGINT) FROM theta_ids")
      .head().getLong(0)
    assert(math.abs(est - 50000L) <= 2500,
      s"theta estimate $est outside 5% of 50000 at lgK=${graft.functions.ThetaSketch.LgK}")
    // unlike HLL's HIP estimator, the retained-key set is a function of
    // the input set at fixed θ; θ itself can shift with downsample
    // order, so bound the spread rather than assert equality
    def estOf(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(graft.functions.ThetaSketch.estimate(
        graft.functions.ThetaSketch.sketchAgg(col("id"))).cast("long"))
      .head().getLong(0)
    val ests = Seq(
      estOf(ids.repartition(1)),
      estOf(ids.repartition(13, pmod(hash(col("id")), lit(13)))),
      estOf(ids.orderBy(col("id").desc)))
    assert(ests.max - ests.min <= 1500, s"theta order spread too wide: $ests")
  }

  test("theta intersection beats HLL inclusion-exclusion on a small planted overlap") {
    // |A| = |B| = 300k, true ∩ = 3k (1% of either side): IE differences
    // three ~600k-union-scale estimates whose individual errors (~0.8%
    // rsd at lgK=14 ≈ ±5k) are LARGER than the answer; theta retains a
    // uniform key sample and intersects it directly. The gate envelopes
    // stay at 5%-of-union for both; this test pins the reason the theta
    // family exists.
    val a = spark.range(1L, 300001L).toDF("id")        // 1..300000
    val b = spark.range(297001L, 597001L).toDF("id")   // overlap 297001..300000
    val trueI = 3000.0
    val hllI = a.agg(hll_sketch_agg(col("id"), lit(SketchQueries.LgK)).as("ska"))
      .join(b.agg(hll_sketch_agg(col("id"), lit(SketchQueries.LgK)).as("skb")))
      .select((hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
        - hll_sketch_estimate(hll_union(col("ska"), col("skb")))).cast("double"))
      .head().getDouble(0)
    val thetaI = a.agg(graft.functions.ThetaSketch.sketchAgg(col("id")).as("ska"))
      .join(b.agg(graft.functions.ThetaSketch.sketchAgg(col("id")).as("skb")))
      .select(graft.functions.ThetaSketch.intersectEstimate(col("ska"), col("skb")))
      .head().getDouble(0)
    val (hllErr, thetaErr) = (math.abs(hllI - trueI), math.abs(thetaI - trueI))
    // theta must land within 35% of the true intersection (≈2σ for
    // ~3000·4096/600k ≈ 20 retained intersection keys at lgK=12)...
    assert(thetaErr <= trueI * 0.35,
      s"theta intersection $thetaI too far from $trueI")
    // ...and clearly beat IE (typically off by 2-5k here — union-scale)
    assert(thetaErr * 2 <= hllErr,
      s"theta err $thetaErr not clearly better than IE err $hllErr (IE $hllI)")
  }

  test("theta overlap gate: verdicts green, anchors match an exact 4-gram recount") {
    val got = SketchQueries.sourceOverlapTheta(spark, sf)
      .select("src_a", "src_b", "n_shared", "within_env")
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, ok) =>
      assert(ok == 1L, s"($a,$b): theta verdict red at sf0.001")
    }
    // independent exact recount of one pair via a different plan shape
    val g = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 4)).as("g"))
      .distinct()
    val (pa, pb, n) = (got.head._1, got.head._2, got.head._3)
    val recount = g.filter(col("source") === pa).select("g")
      .intersect(g.filter(col("source") === pb).select("g")).count()
    assert(recount == n, s"($pa,$pb): anchor $n != recount $recount")
  }

  test("kll sketch: rank accuracy on a skewed distribution, SQL-callable, empty -> null") {
    import graft.functions.KllSketch
    // heavily skewed (id²): quantile VALUES spread over 10 orders, so a
    // rank-correct sketch is actually being tested, not a uniform grid
    val vals = spark.range(1L, 100001L)
      .select((col("id") * col("id")).cast("double").as("v"))
    val exact = (1L to 100000L).map(i => (i * i).toDouble).toArray // sorted
    def rankOf(q: Double): Double = {
      val le = exact.count(_ <= q)
      le.toDouble / exact.length
    }
    val got = vals.agg(
        KllSketch.quantile(KllSketch.sketchAgg(col("v")), lit(0.5)).as("p50"),
        KllSketch.quantile(KllSketch.sketchAgg(col("v")), lit(0.9)).as("p90"),
        KllSketch.quantile(KllSketch.sketchAgg(col("v")), lit(0.99)).as("p99"))
      .head()
    Seq(0.5 -> got.getDouble(0), 0.9 -> got.getDouble(1), 0.99 -> got.getDouble(2))
      .foreach { case (p, est) =>
        assert(math.abs(rankOf(est) - p) <= 0.02,
          s"p$p estimate $est has rank ${rankOf(est)} — outside 2%")
      }
    // SQL registration through GraftExtensions
    vals.createOrReplaceTempView("kll_vals")
    val sqlP50 = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(v), 0.5d) FROM kll_vals")
      .head().getDouble(0)
    assert(math.abs(rankOf(sqlP50) - 0.5) <= 0.02)
    // rank function inverts quantile within tolerance
    val r = vals.agg(KllSketch.rank(
        KllSketch.sketchAgg(col("v")), lit(2.5e9)).as("r"))
      .head().getDouble(0)
    assert(math.abs(r - rankOf(2.5e9)) <= 0.02, s"rank $r vs ${rankOf(2.5e9)}")
    // a quantile of an empty sketch is null, not an exception
    val empty = vals.filter(col("v") < 0)
      .agg(KllSketch.quantile(KllSketch.sketchAgg(col("v")), lit(0.5)).as("q"))
      .head()
    assert(empty.isNullAt(0), "empty sketch must yield null quantile")
  }

  test("kll merge path: per-part sketches folded with kll_merge_agg match the direct build") {
    import graft.functions.KllSketch
    val vals = spark.range(1L, 100001L)
      .select((col("id") * col("id")).cast("double").as("v"),
        pmod(col("id"), lit(10)).as("part"))
    val direct = vals.agg(KllSketch.quantile(
        KllSketch.sketchAgg(col("v")), lit(0.9))).head().getDouble(0)
    val merged = vals.groupBy("part")
      .agg(KllSketch.sketchAgg(col("v")).as("sk"))
      .agg(KllSketch.quantile(KllSketch.mergeAgg(col("sk")), lit(0.9)))
      .head().getDouble(0)
    // both are rank-correct within the sketch guarantee; require the
    // merged read to sit within the same 2% rank envelope of the direct
    val exact = (1L to 100000L).map(i => (i * i).toDouble).toArray
    def rankOf(q: Double): Double = exact.count(_ <= q).toDouble / exact.length
    assert(math.abs(rankOf(merged) - rankOf(direct)) <= 0.03,
      s"merged p90 $merged (rank ${rankOf(merged)}) drifted from direct " +
        s"$direct (rank ${rankOf(direct)})")
  }

  test("kll gate is green at sf0.001; kll index merges and answers quantiles") {
    val gate = SketchQueries.kllQuantilesGate(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(gate.nonEmpty)
    gate.foreach { case (t, n, a, b, c) =>
      assert(n > 0 && a == 1L && b == 1L && c == 1L, s"$t: rank verdict red")
    }
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val old = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val full = SketchQueries.buildKllIndex(corpus)
    val incr = SketchQueries.buildKllIndex(old).updated(batch)
    def q50(ix: SketchQueries.KllIndex): Map[String, (Long, Double)] =
      ix.quantiles(Seq(0.5)).as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val (f, i) = (q50(full), q50(incr))
    assert(f.keySet == i.keySet)
    // n_chars is LongType-exact in the fixture; medians from merged vs
    // direct sketches must agree within the 2% rank envelope — compare
    // against the exact per-source median rank
    f.foreach { case (s, (fn, fq)) =>
      val (in, iq) = i(s)
      assert(fn == in, s"$s: doc counts diverge")
      val lens = corpus.filter(col("source") === s)
        .select(col("n_chars").cast("double")).as[Double].collect().sorted
      def rankOf(q: Double): Double = lens.count(_ <= q).toDouble / lens.length
      assert(math.abs(rankOf(fq) - rankOf(iq)) <= 0.05,
        s"$s: incremental median $iq vs rebuild $fq")
    }
    // global rollup: corpus-wide median from per-source sketches tracks
    // the exact corpus median
    val g = full.globalQuantiles(Seq(0.5)).head()
    val allLens = corpus.select(col("n_chars").cast("double"))
      .as[Double].collect().sorted
    val gRank = allLens.count(_ <= g.getDouble(1)).toDouble / allLens.length
    assert(g.getLong(0) == allLens.length)
    assert(math.abs(gRank - 0.5) <= 0.05,
      s"global median ${g.getDouble(1)} has rank $gRank")
  }

  test("rolling distinct gate matches a driver-side brute force, verdicts all green") {
    val got = SketchQueries.rollingDistinct(spark, sf)
      .select("day_ms", "n_exact", "within_5pct")
      .as[(Long, Long, Long)].collect()
    // brute force over the collected (day, user) pairs
    val du = graft.model.Tables.pq(spark, sf, "events")
      .select(expr("((ts div 1000000) div 86400000) * 86400000").as("d"),
        col("user_id"))
      .distinct().as[(Long, Long)].collect()
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keySet.toSeq.sorted
    val want = days.map { d =>
      d -> days.filter(s => s >= d - 6 * 86400000L && s <= d)
        .flatMap(byDay).toSet.size.toLong
    }.toMap
    assert(got.length == days.size, s"${got.length} rows for ${days.size} days")
    got.foreach { case (d, n, ok) =>
      assert(want(d) == n, s"day $d: exact $n != brute ${want(d)}")
      assert(ok == 1L, s"day $d: sketch verdict red at sf0.001")
    }
  }

  test("source overlap sketch verdicts are green and anchors match the exact operator") {
    val sketch = SketchQueries.sourceOverlapSketch(spark, sf)
      .select("src_a", "src_b", "n_shared", "within_env")
      .as[(String, String, Long, Long)].collect()
    val exact = graft.queries.TextQueries.sourceOverlap(spark, sf)
      .select("src_a", "src_b", "n_shared")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(sketch.nonEmpty)
    assert(sketch.map(r => (r._1, r._2)).toSet == exact.keySet,
      "sketch variant must emit exactly the exact operator's pair set")
    sketch.foreach { case (a, b, n, ok) =>
      assert(exact((a, b)) == n, s"($a,$b): anchor $n != exact ${exact((a, b))}")
      assert(ok == 1L, s"($a,$b): IE verdict red at sf0.001")
    }
  }

  test("hll index: incremental update matches a full rebuild within sketch wobble") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val old = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val full = SketchQueries.buildHllIndex(corpus)
    val incr = SketchQueries.buildHllIndex(old).updated(batch)
    def ests(ix: SketchQueries.HllIndex): Map[String, (Long, Long)] = ix.sketches
      .select(col("source"), hll_sketch_estimate(col("sk")).cast("long"),
        col("n_docs"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (f, i) = (ests(full), ests(incr))
    assert(f.keySet == i.keySet, "source sets diverge")
    f.foreach { case (s, (fe, fd)) =>
      val (ie, id) = i(s)
      // HIP merge-order wobble: union-of-halves vs one-shot build may
      // differ by a hair (measured ±1 at ~1.5k grams) — bound it at
      // 1% + 2 absolute, far inside the probe-side envelopes
      assert(math.abs(fe - ie) <= fe / 100 + 2,
        s"$s: incremental estimate $ie drifted from rebuild $fe")
      assert(fd == id, s"$s: doc counts diverge")
    }
    // a source whose row actually MERGED (present in both the old index
    // and the batch) carries an estimate; a source living wholly in one
    // side was built fresh there and stays exact
    val inOld = old.select("source").distinct().as[String].collect().toSet
    val inBatch = batch.select("source").distinct().as[String].collect().toSet
    val flags = incr.sketches.select(col("source"), col("exact_grams"))
      .as[(String, Long)].collect().toMap
    flags.foreach { case (s, fl) =>
      assert(fl == (if (inOld(s) && inBatch(s)) 0L else 1L),
        s"$s: exact_grams flag $fl inconsistent with merge membership")
    }
    val freshFlags = full.sketches.select(col("source"), col("exact_grams"))
      .as[(String, Long)].collect().toMap
    assert(freshFlags.values.forall(_ == 1L),
      "a fresh build carries exact gram counts")
  }

  test("hll index: untouched sources keep their exact counts through an update") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val sources = corpus.select("source").distinct().as[String].collect().sorted
    assert(sources.length >= 2, "fixture needs at least two sources")
    val touched = sources.head
    val ix = SketchQueries.buildHllIndex(corpus)
    val before = ix.sketches.select(col("source"), col("n_grams"))
      .as[(String, Long)].collect().toMap
    val upd = ix.updated(corpus.filter(col("source") === touched).limit(3))
    val after = upd.sketches
      .select(col("source"), col("n_grams"), col("exact_grams"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    sources.filterNot(_ == touched).foreach { s =>
      assert(after(s) == ((before(s), 1L)),
        s"untouched $s must keep its exact build-time count")
    }
    assert(after(touched)._2 == 0L, "touched source must be flagged estimated")
  }

  test("streaming distinct sketches: shuffled arrival matches batch exact; closed rows merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val hour = 3600000L
    // 3 hourly windows × 2 keys; per-(window,key) id sets overlap across
    // windows (rolling ids) so window unions are a real test of merging
    val rows = for {
      w <- 0 until 3; k <- Seq("click", "view"); i <- 0 until 500
    } yield (w * hour + (i % 60) * 60000L,
      (w * 150 + i % (200 + 50 * w) + (if (k == "click") 0 else 100000)).toLong,
      k)
    val shuffled = new scala.util.Random(42).shuffle(rows)
    val mem = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.StreamingAnalytics.streamingDistinctSketches(
        mem.toDF().toDF("ts_ms", "user_id", "event_type"),
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sds_sketch")
      .outputMode("append").start()
    // interleaved micro-batch slices of a globally shuffled feed — the
    // window's SET is arrival-order free, so estimates must match the
    // ordered batch build up to HIP wobble
    shuffled.grouped(300).foreach { s => mem.addData(s); q.processAllAvailable() }
    mem.addData((20L * hour, 1L, "click")) // far-future: closes all windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sds_sketch")
      .select("win_start_ms", "event_type", "n_est", "sk")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Array[Byte]](3))).toMap
    val exact = rows.groupBy(r => (r._1 / hour * hour, r._3))
      .view.mapValues(_.map(_._2).toSet.size.toLong).toMap
    assert(got.keySet.intersect(exact.keySet) == exact.keySet,
      s"missing closed windows: ${exact.keySet -- got.keySet}")
    exact.foreach { case (k, n) =>
      val (est, _) = got(k)
      assert(math.abs(est - n) * 20 <= math.max(n, 20),
        s"$k: streaming estimate $est outside 5% of exact $n")
    }
    // closed rows are mergeable facts: roll the 3 hourly windows per key
    // into a "daily" cardinality by sketch union, no event re-read
    val daily = spark.table("sds_sketch")
      .filter(col("win_start_ms") < 10L * hour)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    val dailyExact = rows.groupBy(_._3)
      .view.mapValues(_.map(_._2).toSet.size.toLong).toMap
    dailyExact.foreach { case (k, n) =>
      assert(math.abs(daily(k) - n) * 20 <= math.max(n, 20),
        s"$k: rolled-up estimate ${daily(k)} outside 5% of exact $n")
    }
  }

  test("streaming quantile sketches: shuffled arrival is rank-correct; closed rows merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val hour = 3600000L
    // 3 hourly windows × 2 keys, per-group value distributions differ
    // (w shifts the scale) — shuffled feed, interleaved micro-batches
    val rows = for {
      w <- 0 until 3; k <- Seq("click", "view"); i <- 1 to 500
    } yield (w * hour + (i % 60) * 60000L,
      (i * i).toDouble * (w + 1) + (if (k == "view") 1e7 else 0.0), k)
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val mem = MemoryStream[(Long, Double, String)]
    val q = graft.streaming.StreamingAnalytics.streamingQuantileSketches(
        mem.toDF().toDF("ts_ms", "value", "event_type"),
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sqs_sketch")
      .outputMode("append").start()
    shuffled.grouped(300).foreach { s => mem.addData(s); q.processAllAvailable() }
    mem.addData((20L * hour, 0.0, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sqs_sketch")
      .select("win_start_ms", "event_type", "n", "p50", "p90")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val groups = rows.groupBy(r => (r._1 / hour * hour, r._3))
      .view.mapValues(_.map(_._2).sorted.toArray).toMap
    assert(got.keySet.intersect(groups.keySet) == groups.keySet)
    groups.foreach { case (k, vals) =>
      val (n, p50, p90) = got(k)
      assert(n == vals.length, s"$k: n $n != ${vals.length}")
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.02, s"$k: p50 $p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.02, s"$k: p90 $p90 rank ${rankOf(p90)}")
    }
    // closed rows merge: all 3 windows per key → the key's full-period
    // p90, checked against the exact rank over all the key's values
    val merged = spark.table("sqs_sketch")
      .filter(col("win_start_ms") < 10L * hour)
      .groupBy("event_type")
      .agg(graft.functions.KllSketch.quantile(
        graft.functions.KllSketch.mergeAgg(col("sk")), lit(0.9)).as("p90"))
      .as[(String, Double)].collect().toMap
    rows.groupBy(_._3).foreach { case (k, rs) =>
      val vals = rs.map(_._2).sorted
      val r = vals.count(_ <= merged(k)).toDouble / vals.length
      assert(math.abs(r - 0.9) <= 0.03, s"$k: merged p90 rank $r")
    }
  }

  test("updatedFromSketches folds sketch rows like updated folds the raw batch") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val old = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val viaRaw = SketchQueries.buildHllIndex(old).updated(batch)
    // the lambda seam: the same batch arriving as already-built sketch
    // rows (what a streaming job emits) must fold to the same index,
    // up to HIP wobble
    val skRows = SketchQueries.sourceGramSketches(batch)
      .join(batch.groupBy("source").count().withColumnRenamed("count", "n_docs"),
        "source")
      .select("source", "sk", "n_docs")
    val viaSketches = SketchQueries.buildHllIndex(old).updatedFromSketches(skRows)
    def snap(ix: SketchQueries.HllIndex): Map[String, (Long, Long)] = ix.sketches
      .select(col("source"), hll_sketch_estimate(col("sk")).cast("long"),
        col("n_docs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (a, b) = (snap(viaRaw), snap(viaSketches))
    assert(a.keySet == b.keySet)
    a.foreach { case (s, (ae, ad)) =>
      val (be, bd) = b(s)
      assert(math.abs(ae - be) <= ae / 100 + 2, s"$s: $ae vs $be")
      assert(ad == bd, s"$s: doc counts diverge")
    }
  }

  test("hll index: gramless sources and gramless batches stay first-class, not dropped") {
    // a source whose docs are all shorter than the gram width yields
    // zero grams — it must still hold an index row (empty sketch,
    // n_grams 0) or its n_docs silently vanish from later folds
    val mixed = Seq(
      (0L, "one two three four five six", "en", "srcFull", 27L),
      (1L, "tiny doc", "en", "srcTiny", 8L),
      (2L, "so small", "en", "srcTiny", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ix = SketchQueries.buildHllIndex(mixed)
    val rows = ix.sketches
      .select(col("source"), col("n_grams"), col("n_docs"), col("exact_grams"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("srcFull", "srcTiny"))
    assert(rows("srcTiny") == (("srcTiny", 0L, 2L, 1L)),
      "gramless source must keep an exact zero-gram row")
    assert(rows("srcFull")._2 > 0)
    // the empty sketch is a VALID sketch: it unions and probes cleanly
    val upd = ix.updated(Seq((3L, "third tiny", "en", "srcTiny", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val tiny = upd.sketches.filter(col("source") === "srcTiny")
      .select("n_docs").as[Long].head()
    assert(tiny == 3L, "gramless source's doc count must keep folding")
    // a gramless BATCH probes to one row per source with zero estimates,
    // not an empty frame
    val probe = ix.probe(Seq((9L, "zz", "en", "srcX", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("source", "n_batch", "n_shared_est")
      .as[(String, Long, Long)].collect()
    assert(probe.length == 2)
    probe.foreach { case (s, nb, sh) =>
      assert(nb == 0L && sh == 0L, s"$s: gramless batch must probe to zeros")
    }
  }

  test("theta index: build/update/probe, direct intersection tracks exact containment") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val old = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val full = SketchQueries.buildThetaIndex(corpus)
    val incr = SketchQueries.buildThetaIndex(old).updated(batch)
    def ests(ix: SketchQueries.ThetaIndex): Map[String, (Long, Long)] = ix.sketches
      .select(col("source"),
        graft.functions.ThetaSketch.estimate(col("sk")).cast("long"),
        col("n_docs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (f, i) = (ests(full), ests(incr))
    assert(f.keySet == i.keySet)
    f.foreach { case (s, (fe, fd)) =>
      val (ie, id) = i(s)
      // at sf0.001 gram counts sit far below 2^lgK retained keys, so the
      // sketch is EXACT and union-of-halves must equal the direct build
      assert(fe == ie, s"$s: incremental $ie != rebuild $fe in exact mode")
      assert(fd == id, s"$s: doc counts diverge")
    }
    // probe: a batch that IS one source reads ~total containment there,
    // and exact equality in sub-sampling mode
    val src = corpus.groupBy("source").count().orderBy(col("count").desc)
      .select("source").as[String].head()
    val got = full.probe(corpus.filter(col("source") === src))
      .select("source", "n_batch", "n_shared_est")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (nb, sh) = got(src)
    assert(nb > 0 && sh * 10 >= nb * 9, s"self-probe $sh / $nb below 90%")
  }

  test("streaming theta sketches: shuffled arrival matches batch exact; rows fold into the index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val hour = 3600000L
    // 3 hourly windows × 2 sources; token streams overlap across
    // windows (rolling vocabulary) so gram sets genuinely intersect,
    // and source "web" window 2 carries ONLY gramless docs (2 tokens)
    // — the first-class-empty-row contract
    val rows: Seq[(Long, String, String)] = (for {
      w <- 0 until 3; s <- Seq("web", "books"); i <- 0 until 40
      if !(s == "web" && w == 2)
    } yield {
      val base = w * 25 + i
      (w * hour + (i % 60) * 60000L, s,
        s"${s}tok$base ${s}tok${base + 1} ${s}tok${base + 2} ${s}tok${base + 3}")
    }) ++ (0 until 7).map(i => (2 * hour + i * 60000L, "web", "too short"))
    val shuffled = new scala.util.Random(11).shuffle(rows)
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamingAnalytics.streamingThetaSketches(
        mem.toDF().toDF("ts_ms", "source", "text"),
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sts_sketch")
      .outputMode("append").start()
    shuffled.grouped(40).foreach { s => mem.addData(s); q.processAllAvailable() }
    mem.addData((20L * hour, "web", "a b c")) // far-future: closes all windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sts_sketch")
      .filter(col("win_start_ms") < 10L * hour)
      .select("win_start_ms", "source", "n_docs", "n_grams_est")
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // exact anchors from the same gram function run in batch
    val batchDf = rows.toDF("ts_ms", "source", "text")
    val exactGrams = batchDf
      .select((col("ts_ms") / hour).cast("long") * hour as "win", col("source"),
        explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      .groupBy("win", "source").agg(countDistinct("g").as("n"))
      .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exactDocs = rows.groupBy(r => (r._1 / hour * hour, r._2))
      .view.mapValues(_.size.toLong).toMap
    assert(got.keySet == exactDocs.keySet,
      s"closed windows ${got.keySet} != expected ${exactDocs.keySet}")
    exactDocs.foreach { case (k, nd) =>
      val (gotDocs, gotGrams) = got(k)
      assert(gotDocs == nd, s"$k: n_docs $gotDocs != exact $nd")
      // theta update sketches below 2^lgK retained keys are EXACT and
      // order-free — shuffled streaming arrival must equal batch
      assert(gotGrams == exactGrams.getOrElse(k, 0L),
        s"$k: n_grams_est $gotGrams != exact ${exactGrams.getOrElse(k, 0L)}")
    }
    // the gramless-window row exists with an empty sketch, not dropped
    assert(got((2 * hour, "web")) == ((7L, 0L)))
    // lambda seam: fold the closed rows into a durable theta index built
    // on an "old" corpus and compare against folding the raw batch
    val oldCorpus = Seq((1L, "books", "bookstok0 bookstok1 bookstok2 oldonly x"))
      .toDF("doc_id", "source", "text")
    val viaSketches = SketchQueries.buildThetaIndex(oldCorpus)
      .updatedFromSketches(spark.table("sts_sketch")
        .filter(col("win_start_ms") < 10L * hour)
        .select("source", "sk", "n_docs"))
    val viaRaw = SketchQueries.buildThetaIndex(oldCorpus)
      .updated(batchDf.withColumn("doc_id", col("ts_ms")))
    def snap(ix: SketchQueries.ThetaIndex): Map[String, (Long, Long)] = ix.sketches
      .select(col("source"),
        graft.functions.ThetaSketch.estimate(col("sk")).cast("long"),
        col("n_docs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (a, b) = (snap(viaRaw), snap(viaSketches))
    assert(a.keySet == b.keySet)
    a.foreach { case (s, (ae, ad)) =>
      val (be, bd) = b(s)
      assert(ae == be, s"$s: sketch-row fold $be != raw fold $ae in exact mode")
      assert(ad == bd, s"$s: doc counts diverge ($bd vs $ad)")
    }
  }

  test("hll index probe: a batch drawn from one source shows near-total containment there") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val src = corpus.groupBy("source").count().orderBy(col("count").desc)
      .select("source").as[String].head()
    val ix = SketchQueries.buildHllIndex(corpus)
    val batch = corpus.filter(col("source") === src)
    val got = ix.probe(batch)
      .select("source", "n_batch", "n_shared_est")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (nBatch, shared) = got(src)
    assert(nBatch > 0)
    // the batch IS that source: IE must report ≥ 90% containment
    assert(shared * 10 >= nBatch * 9,
      s"self-probe containment $shared / $nBatch below 90%")
    // and no estimate can exceed the batch side by more than sketch noise
    got.values.foreach { case (nb, sh) =>
      assert(sh <= (nb * 21) / 20 + 20, s"shared $sh exceeds batch $nb + noise")
    }
  }
}
