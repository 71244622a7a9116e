package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, SimilarityQueries, TextQueries}

/** Round-10 operators: CUSUM changepoint census, RANGE-frame burst
  * detection, per-source readability, b-bit MinHash calibration, and
  * max-inner-product top-k — semantics on crafted fixtures plus
  * driver-side brute-force parity on sf0.001.
  */
class Round10OpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = SparkSuite.sf0001

  test("cusum peak equals the driver-side recursive CUSUM on every type") {
    // the closed form S_t = P_t - min(0, min P_j) must equal the
    // textbook recursion S_t = max(0, S_{t-1} + y_t)
    val hourly = graft.model.Tables.pq(spark, sf, "events")
      .select(col("event_type"), expr("(ts div 1000000) div 3600000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val want = hourly.map { case (tpe, rows) =>
      val m = rows.length.toLong
      val s = rows.map(_._3).sum
      var st = 0L
      var best = Long.MinValue
      var bestH = 0L
      rows.foreach { case (_, h, x) =>
        st = math.max(0L, st + (m * x - s))
        if (st > best) { best = st; bestH = h } // strict: earliest peak wins
      }
      tpe -> ((m, bestH * 3600000L, best.toDouble / m.toDouble))
    }
    val got = AnalyticsQueries.cusumChangepoint(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want, s"closed form diverged from the recursion:\n$got\n$want")
  }

  test("burst peak equals a driver-side trailing-24h scan per user") {
    val ev = graft.model.Tables.pq(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000000").as("ms"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = ev.map { case (u, ts) =>
      // burst at t = count of events in (t - 86400000, t]
      val bursts = ts.map(t => (t, ts.count(x => x > t - 86400000L && x <= t)))
      val peak = bursts.maxBy { case (t, b) => (b, -t) } // max burst, earliest ms
      u -> ((ts.length.toLong, peak._2.toLong, peak._1))
    }
    val got = AnalyticsQueries.burstDetect(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want, "range-frame burst diverged from the brute scan")
  }

  test("burst semantics: simultaneous events share a frame (tie-order-free)") {
    val dir = tmpDir("burst-fixture")
    // user 1: three events at the same ms + one 25h later; the peak is 3
    // no matter how the equal-ms rows are ordered
    val rows = Seq(
      (1L, 1000L * 3600 * 1000), (1L, 1000L * 3600 * 1000),
      (1L, 1000L * 3600 * 1000), (1L, 1025L * 3600 * 1000))
    rows.toDF("user_id", "ms")
      .select(col("user_id"), (col("ms") * 1000000L).as("ts"),
        lit(0L).as("event_id"), lit("x").as("event_type"), lit(0.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.burstDetect(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 3L, 1000L * 3600 * 1000)))
  }

  test("readability counts sentences, words and chars exactly") {
    val dir = tmpDir("readability-fixture")
    Seq(
      (1L, "One two three. Four five!", "en", "srcA", 0L),
      (2L, "Six  seven?", "en", "srcA", 0L), // double space: not a word
      (3L, "nopunct here", "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.readabilityProfile(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // srcA: 7 words, 3 terminators, 21 + 9 = 30 non-space chars
    // srcB: 2 words, 0 terminators (ratio guards divide by max(st,1))
    assert(got == Seq(
      ("srcA", 2L, 7L, 3L, 7.0 / 3.0, 30.0 / 7.0),
      ("srcB", 1L, 2L, 0L, 2.0 / 1.0, 11.0 / 2.0)))
  }

  test("b-bit estimator stays near the exact Jaccard on verified pairs") {
    val rows = TextQueries.bbitMinhash(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id1, id2, agree, jEst, jExact) =>
      assert(agree >= 0 && agree <= 64, s"($id1,$id2): agree $agree out of range")
      assert(jExact >= 0.8, s"($id1,$id2): pair below the join threshold")
      // E[agree/64] = (1+J)/2 >= 0.9 here; 64 bits give sd ~0.037 on the
      // share — 0.3 absolute on J is an 8-sigma bound (deterministic
      // data, the assert pins the estimator never degenerates)
      assert(math.abs(jEst - jExact) < 0.3,
        s"($id1,$id2): b-bit estimate $jEst too far from exact $jExact")
    }
  }

  test("mips top-k equals the driver-side integer-dot brute force") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 1048576.0).toLong))
      }
    val queries = vecs.filter(_._1 < 10)
    val want = queries.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, qv.zip(v).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, d) => (-d, id) }
        .take(5).zipWithIndex
        .map { case ((id, d), i) =>
          (qid, i + 1, id, d.toDouble / 1099511627776.0)
        }
    }.toSeq
    val got = SimilarityQueries.mipsTopK(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == want.sortBy(r => (r._1, r._2)))
  }

  test("round-10 operators survive empty and single-row inputs") {
    val dir = tmpDir("r10-degenerate")
    Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(AnalyticsQueries.cusumChangepoint(spark, dir).count() == 0)
    assert(AnalyticsQueries.burstDetect(spark, dir).count() == 0)
    assert(TextQueries.readabilityProfile(spark, dir).count() == 0)
    assert(TextQueries.bbitMinhash(spark, dir).count() == 0)
    assert(SimilarityQueries.mipsTopK(spark, dir).count() == 0)
    val one = tmpDir("r10-single")
    Seq((7L, 42L * 1000000L, 0L, "t", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$one/events.parquet")
    // one event: one observed hour, cusum = m*x - s = 0, burst peak 1
    assert(AnalyticsQueries.cusumChangepoint(spark, one)
      .as[(String, Long, Long, Double)].collect().toSeq ==
      Seq(("t", 1L, 0L, 0.0)))
    assert(AnalyticsQueries.burstDetect(spark, one)
      .as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((7L, 1L, 1L, 42L)))
  }

  test("ohlc open/close follow the packed (ms, event_id) order, ties included") {
    val dir = tmpDir("ohlc-fixture")
    // one user, one hour; two events share a ms (open = lower event_id),
    // the latest event closes the bar
    Seq(
      (1L, 1000L * 1000000L, 1L, "t", 5.0),
      (1L, 1000L * 1000000L, 2L, "t", 7.0),
      (1L, 2000L * 1000000L, 0L, "t", 3.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.ohlcBars(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(got == Seq((1L, 0L, 5.0, 7.0, 3.0, 3.0, 3L, 15.0)),
      s"bar must open at the ms-tie's lower event_id and close at the last ms: $got")
  }

  test("twap weights each value by its holding time; last event carries none") {
    val dir = tmpDir("twap-fixture")
    // segments: 10 held 1000 ms, 20 held 2000 ms; the value 30 never
    // gets a successor so it is weightless — twap = 50000/3000
    Seq(
      (1L, 0L, 0L, "t", 10.0),
      (1L, 1000L * 1000000L, 1L, "t", 20.0),
      (1L, 3000L * 1000000L, 2L, "t", 30.0),
      (2L, 500L * 1000000L, 3L, "t", 99.0)) // single event: no segment, no row
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.timeWeightedAvg(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3000L, 16.666667)),
      s"twap must be the duration-weighted mean, single-event users dropped: $got")
  }

  test("interval union needs the RUNNING max of ends, not the previous row's") {
    val dir = tmpDir("iunion-fixture")
    // a long interval [0, 10000) swallows two later short ones — the
    // third starts AFTER the second ENDS, so a lag(end) formulation
    // would wrongly open a new island; the running max keeps them merged
    Seq(
      (1L, 0L, 0L, "t", 1.0),                  // [0, 10000)
      (1L, 2000L * 1000000L, 1L, "t", 0.1),    // [2000, 3000)  inside
      (1L, 5000L * 1000000L, 2L, "t", 0.01),   // [5000, 5100)  inside, starts past 3000
      (1L, 20000L * 1000000L, 3L, "t", 0.05))  // [20000, 20500) new island
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.intervalUnion(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 10500L, 10000L)),
      s"overlap merge must ride the running max of interval ends: $got")
  }

  test("seasonal baseline: the same value is an anomaly at one hour, baseline at another") {
    val dir = tmpDir("seasonal-fixture")
    val h = 3600000L
    // hod 0 runs quiet (1,1,1,4): the 4.0 exceeds 2x its hour's mean;
    // hod 1 runs hot (5,5,5,4): the SAME 4.0 is below baseline there —
    // a global-mean test could never split the two
    val rows = Seq(
      (0L * h, 0L, 1.0), (0L * h + 1, 1L, 1.0), (0L * h + 2, 2L, 1.0),
      (0L * h + 3, 3L, 4.0),
      (1L * h, 4L, 5.0), (1L * h + 1, 5L, 5.0), (1L * h + 2, 6L, 5.0),
      (1L * h + 3, 7L, 4.0))
    rows.map { case (ms, id, v) => (1L, ms * 1000000L, id, "t", v) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.seasonalBaseline(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("t", 8L, 2L, 1L)),
      s"exactly the quiet-hour 4.0 exceeds 2x its own hod mean: $got")
  }

  test("ohlc/twap/interval-union survive empty and single-event inputs") {
    val dir = tmpDir("ts-degenerate")
    Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(AnalyticsQueries.ohlcBars(spark, dir).count() == 0)
    assert(AnalyticsQueries.timeWeightedAvg(spark, dir).count() == 0)
    assert(AnalyticsQueries.intervalUnion(spark, dir).count() == 0)
    assert(AnalyticsQueries.seasonalBaseline(spark, dir).count() == 0)
    val one = tmpDir("ts-single")
    Seq((7L, 42L * 1000000L, 0L, "t", 2.5))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$one/events.parquet")
    // one event: a degenerate bar (open=close=high=low), no twap
    // segment, one island of the interval's own length (25000 ms)
    assert(AnalyticsQueries.ohlcBars(spark, one)
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq == Seq((7L, 0L, 2.5, 2.5, 2.5, 2.5, 1L, 2.5)))
    assert(AnalyticsQueries.timeWeightedAvg(spark, one).count() == 0)
    assert(AnalyticsQueries.intervalUnion(spark, one)
      .as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((7L, 1L, 25000L, 25000L)))
    // one event is its own baseline: u*1 > 2*u never holds
    assert(AnalyticsQueries.seasonalBaseline(spark, one)
      .as[(String, Long, Long, Long)].collect().toSeq ==
      Seq(("t", 1L, 1L, 0L)))
  }

  test("mips ranks by magnitude where cosine would tie (crafted)") {
    // two corpus vectors share the query's DIRECTION (cosine ties at 1,
    // lower id would win) but differ in norm — MIPS must put the
    // larger-norm vector first; the harness embeddings are near unit
    // norm, which is why this property needs a crafted fixture
    val dir = tmpDir("mips-fixture")
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // the query head
      (10L, Array(0.5f, 0.0f, 0.0f, 0.0f)),  // same direction, small
      (11L, Array(0.9f, 0.0f, 0.0f, 0.0f)),  // same direction, large
      (12L, Array(0.1f, 0.9f, 0.0f, 0.0f)))  // off-direction
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.mipsTopK(spark, dir)
      .select("query_id", "rnk", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((0L, 1, 11L), (0L, 2, 10L), (0L, 3, 12L)),
      s"magnitude must break the cosine tie: $got")
  }
}
