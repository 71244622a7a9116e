package graft

import graft.streaming.{AsOfStreamMode, StreamingAnalytics}
import graft.streaming.StreamingAnalytics.{ClosedSession, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming analytics properties: watermark-closed windows in append
  * mode, and flatMapGroupsWithState sessionization (gap close + event-
  * time timeout close).
  */
class StreamingAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private val h0 = 1700000000000L - (1700000000000L % 3600000L) // hour-aligned

  private def rec(offset: Long, tsMs: Long) =
    graft.model.ReducedConsumerRecord("t1", 0, offset, None, "dg==", tsMs, 0)

  test("windowed counts emit closed windows once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[graft.model.ReducedConsumerRecord]
    val counts = StreamingAnalytics.windowedEventCounts(
      mem.toDF().withColumnRenamed("timestampType", "timestamp_type"))
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    // hour 0 data, then hour 2 data: watermark (max - 1h) passes hour 0
    mem.addData((0 until 10).map(i => rec(i, h0 + i * 1000L)): _*)
    q.processAllAvailable()
    mem.addData(rec(100, h0 + 2 * 3600000L))
    q.processAllAvailable()
    // one more batch so the new watermark finalizes hour 0
    mem.addData(rec(101, h0 + 2 * 3600000L + 1000L))
    q.processAllAvailable()
    val closed = spark.table("wc")
      .select("window_start_ms", "n_records").as[(Long, Long)].collect().toMap
    q.stop()
    assert(closed.get(h0).contains(10L), s"hour-0 window should be closed: $closed")
  }

  test("streaming near-dup probe equals the batch probe, stateless across batches") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    // pick a planted near-dup pair (a, b): doc a plays the "new" stream
    // while b stays in the corpus; c is an unrelated second stream doc
    val (a, b, _) = graft.queries.TextQueries.ngramJaccard(spark, sf)
      .as[(Long, Long, Double)].head()
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val c = d.select("doc_id").as[Long].collect().sorted
      .find(i => i != a && i != b).get
    val streamIds = Seq(a, c).map(Long.box)
    val corpus = d.filter(!col("doc_id").isin(streamIds: _*))
    val index = graft.queries.TextQueries.buildNearDupIndex(corpus)
    val streamDocs = d.filter(col("doc_id").isin(streamIds: _*))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = StreamingAnalytics.streamingNearDupProbe(
      mem.toDF().toDF("doc_id", "text"), index, tmpDir("ndp-ckpt"),
      batch => got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    // one doc per micro-batch: the probe must not depend on batching
    streamDocs.foreach { doc => mem.addData(doc); q.processAllAvailable() }
    q.stop()
    val expected = graft.queries.TextQueries.probeNearDups(
      d.filter(col("doc_id").isin(streamIds: _*)), index)
      .as[(Long, Long, Double)].collect().toSet
    index.unpersist()
    assert(expected.exists(p => p._1 == a && p._2 == b),
      "planted dup must surface via the probe")
    assert(got.toSet == expected,
      s"streaming probe diverged: got ${got.toSet} expected $expected")
  }

  test("streaming chunk probe equals the batch probe through a disk round-trip") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val ids = d.select("doc_id").as[Long].collect().sorted.take(2).map(Long.box)
    val corpus = d.filter(!col("doc_id").isin(ids.toSeq: _*))
    // the streaming query probes the RELOADED index — proving the
    // nightly-artifact flow (build, save, load elsewhere, probe) in one
    val path = tmpDir("chunk-index")
    graft.queries.TextQueries.buildChunkIndex(corpus).save(path)
    val index = graft.queries.TextQueries.ChunkIndex.load(spark, path)
    val streamDocs = d.filter(col("doc_id").isin(ids.toSeq: _*))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StreamingAnalytics.streamingChunkProbe(
      mem.toDF().toDF("doc_id", "text"), index, tmpDir("chunk-ckpt"),
      batch => got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    streamDocs.foreach { doc => mem.addData(doc); q.processAllAvailable() }
    q.stop()
    val expected = graft.queries.TextQueries.probeChunks(
      d.filter(col("doc_id").isin(ids.toSeq: _*)), index)
      .as[(Long, Long, Long)].collect().toSet
    index.unpersist()
    assert(expected.nonEmpty && expected.forall(_._2 > 0))
    assert(got.toSet == expected,
      s"streaming chunk probe diverged: got ${got.toSet} expected $expected")
  }

  test("streaming scrub probe equals the batch probe through a disk round-trip") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val batchIds = d.filter(col("doc_id") % 7 === 0)
      .select("doc_id").as[Long].collect().toSet
    val corpus = d.filter(!col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
    val path = tmpDir("scrub-index")
    graft.queries.TextQueries.buildScrubIndex(corpus).save(path)
    val index = graft.queries.TextQueries.ScrubIndex.load(spark, path)
    val streamDocs = d.filter(col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val q = StreamingAnalytics.streamingScrubProbe(
      mem.toDF().toDF("doc_id", "text"), index, tmpDir("scrub-ckpt"),
      batch => got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))))
    // one micro-batch with ALL docs so the within-batch multiplicity
    // rule sees what the equivalent batch probe sees
    mem.addData(streamDocs: _*)
    q.processAllAvailable()
    q.stop()
    val expected = graft.queries.TextQueries.probeScrub(
      d.filter(col("doc_id").isin(batchIds.toSeq.map(Long.box): _*)), index)
      .as[(Long, Long, Long, String)].collect().toSet
    index.unpersist()
    assert(expected.exists(_._3 > 0), "fixtures should scrub something")
    assert(got.toSet == expected)
  }

  test("streaming heavy hitters: k-bounded running sketch keeps the guarantee") {
    implicit val ctx = spark.sqlContext
    val k = 8
    val mem = MemoryStream[(Long, String)]
    val sketchDf = StreamingAnalytics.streamingHeavyHitters(
      mem.toDF().toDF("doc_id", "text"), k)
    val q = sketchDf.writeStream.outputMode("complete")
      .format("memory").queryName("hh_sketch").start()
    // 3 micro-batches, 30-term vocab >> k, one planted heavy term
    val batches = (0 until 3).map { b =>
      (0 until 40).map { i =>
        val words =
          if (i % 2 == 0) Seq("heavy", s"tail${(b * 40 + i) % 30}", "heavy")
          else Seq(s"tail${i % 30}", s"tail${(i + 7) % 30}")
        ((b * 40 + i).toLong, words.mkString(" "))
      }
    }
    batches.foreach { docs => mem.addData(docs: _*); q.processAllAvailable() }
    val row = spark.table("hh_sketch").select("sketch.counters", "sketch.n").head()
    q.stop()
    val counters = row.getMap[String, Long](0).toMap
    val fed = batches.flatten.flatMap(_._2.split(" "))
    assert(row.getLong(1) == fed.size)
    assert(counters.size <= k)
    val exact = fed.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    // "heavy" is ~1/3 of the stream: must survive with a sane estimate
    assert(counters.contains("heavy"))
    assert(counters("heavy") <= exact("heavy"))
    assert(counters("heavy") >= exact("heavy") - fed.size / (k + 1))
  }

  test("streaming drift probe: in-distribution batch scores below a skewed one, through disk") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // the streaming query probes the RELOADED reference — the nightly-
    // artifact flow (build, save, load elsewhere, probe) in one test
    val path = tmpDir("term-dist")
    graft.queries.TextQueries.buildTermDistribution(d).save(path)
    val ref = graft.queries.TextQueries.TermDistribution.load(spark, path)
    val inDist = d.as[(Long, String)].head() // a corpus doc: low drift
    val skewed = (9999L, "qqxx qqxx qqxx zzyy zzyy wwvv") // unseen terms
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingAnalytics.streamingDriftProbe(
      mem.toDF().toDF("doc_id", "text"), ref, tmpDir("drift-ckpt"),
      batch => got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
    Seq(inDist, skewed).foreach { doc => mem.addData(doc); q.processAllAvailable() }
    q.stop()
    ref.unpersist()
    assert(got.size == 2, s"one drift row per micro-batch: $got")
    val Seq(low, high) = got.toSeq
    assert(low._3 == 0, s"corpus doc has no unseen terms: $low")
    assert(high._3 == 3, s"skewed batch has 3 unseen terms: $high")
    assert(high._4 > low._4 + 1.0,
      s"skewed batch must show much larger drift: $low vs $high")
    // the streaming row equals the batch kernel on the same frame
    val batchRow = graft.queries.TextQueries.klAgainst(
      Seq(skewed).toDF("doc_id", "text"), ref)
      .as[(Long, Long, Long, Double)].head()
    assert(batchRow == high, s"streaming diverged from batch: $batchRow vs $high")
  }

  test("drift kernel survives empty inputs with typed zeros, not nulls") {
    val sf = SparkSuite.sf0001
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val ref = graft.queries.TextQueries.buildTermDistribution(d)
    // empty micro-batch (a restart's first trigger): every column must
    // read as its typed zero — getLong/getDouble sinks crash on nulls
    val row = graft.queries.TextQueries.klAgainst(d.limit(0), ref)
      .as[(Long, Long, Long, Double)].head()
    assert(row == ((0L, 0L, 0L, 0.0)), s"empty batch must yield zeros: $row")
    // empty corpus: the reference builds with zero totals, no NPE
    val empty = graft.queries.TextQueries.buildTermDistribution(d.limit(0))
    assert(empty.gt == 0L && empty.vocab == 0L)
  }

  test("streaming IVF probe equals the batch probe and resumes from its checkpoint") {
    import graft.queries.SimilarityQueries
    val emb = spark.read.parquet(s"${SparkSuite.sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 6)
    val path = tmpDir("sivf-index")
    SimilarityQueries.buildIvfIndex(corpus).save(path)
    val index = SimilarityQueries.IvfIndex.load(spark, path)
    val q1 = emb.filter(col("vec_id") < 3)
    val q2 = emb.filter(col("vec_id") >= 3 && col("vec_id") < 6)
    // file-source query stream + checkpoint: run AvailableNow over the
    // first head, stop, append a second head, rerun with the SAME
    // checkpoint — the probe must resume past the consumed files
    val qdir = tmpDir("sivf-queries")
    val ckpt = tmpDir("sivf-ckpt")
    def runOnce(): Set[(Long, Long, Long, Double)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      val stream = spark.readStream.schema(emb.schema).parquet(qdir)
      val q = StreamingAnalytics.streamingIvfProbe(
        stream, index, ckpt,
        b => got ++= b.as[(Long, Long, Long, Double)].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      got.toSet
    }
    q1.write.mode("append").parquet(qdir)
    val first = runOnce()
    val batch1 = SimilarityQueries.probeIvfIndex(index, q1)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch1.nonEmpty, "batch probe must find neighbors")
    assert(first == batch1, s"streaming probe diverged: $first vs $batch1")
    q2.write.mode("append").parquet(qdir)
    val second = runOnce()
    val batch2 = SimilarityQueries.probeIvfIndex(index, q2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(second == batch2,
      s"restart must probe ONLY the new queries: $second vs $batch2")
    index.centroids.unpersist()
  }

  test("streaming ohlc bars equal the batch bars once the watermark closes the hour") {
    implicit val ctx = spark.sqlContext
    // the batch fixture's hour-0 bar: ms-tie opens at the lower
    // event_id, the last ms closes; hour-2 rows only advance the
    // watermark past hour 0
    val rows = Seq(
      (1L, 1000L, 1L, 5.0), (1L, 1000L, 2L, 7.0), (1L, 2000L, 0L, 3.0))
    val flush = Seq(
      (1L, 2 * 3600000L, 10L, 1.0), (1L, 2 * 3600000L + 300000L, 11L, 1.0))
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val bars = StreamingAnalytics.streamingOhlcBars(
      mem.toDF().toDF("user_id", "ts_ms", "event_id", "value"))
    val q = bars.writeStream.format("memory").queryName("ohlc_bars")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    flush.foreach { r => mem.addData(r); q.processAllAvailable() }
    val got = spark.table("ohlc_bars")
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq
    q.stop()
    // batch twin over the same hour-0 rows
    val dir = tmpDir("stream-ohlc-batch")
    rows.map { case (u, ms, id, v) => (u, ms * 1000000L, id, "t", v) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.queries.AnalyticsQueries.ohlcBars(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(got == want && want == Seq((1L, 0L, 5.0, 7.0, 3.0, 3.0, 3L, 15.0)),
      s"closed streaming bar must equal the batch bar: $got vs $want")
  }

  test("streaming as-of probe equals the batch native as-of, one event per batch") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    val ev = graft.model.Tables.pq(spark, sf, "events")
      .selectExpr("user_id", "ts div 1000000 AS ts_ms", "event_id")
    val ord = graft.model.Tables.pq(spark, sf, "orders")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS odate_ms",
        "o_orderkey")
    // five events with a matching order, plus any without one (sf0.001
    // may have none — the null case is pinned on crafted fixtures in
    // AsOfJoinSpec)
    val batchAll = graft.queries.AnalyticsQueries.asofJoin(spark, sf)
      .select("event_id", "asof_orderkey")
      .as[(Long, Option[Long])].collect()
    val withM = batchAll.filter(_._2.isDefined).take(3).map(_._1)
    val withoutM = batchAll.filter(_._2.isEmpty).take(2).map(_._1)
    val ids = (withM ++ withoutM).toSeq
    assert(withM.nonEmpty, "need matched events in the fixture")
    val streamRows = ev.filter(col("event_id").isin(ids.map(Long.box): _*))
      .as[(Long, Long, Long)].collect().toSeq
    val mem = MemoryStream[(Long, Long, Long)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = StreamingAnalytics.streamingAsOfProbe(
      mem.toDF().toDF("user_id", "ts_ms", "event_id"), ord,
      keys = Seq("user_id" -> "o_custkey"),
      leftTimeCol = "ts_ms", rightTimeCol = "odate_ms",
      rightTiebreak = Seq("o_orderkey"),
      checkpoint = tmpDir("asof-ckpt"),
      sink = (b, _) => got ++= b.select(col("event_id"), col("o_orderkey"))
        .as[(Long, Option[Long])].collect())
    // one row per micro-batch: the probe must not depend on batching
    streamRows.foreach { r => mem.addData(r); q.processAllAvailable() }
    q.stop()
    val expected = batchAll.filter(r => ids.contains(r._1)).toSet
    assert(got.toSet == expected,
      s"streaming as-of diverged: ${got.toSet} vs $expected")
  }

  test("stream-stream as-of: two file streams, restart mid-stream, equals the batch join") {
    val dir = tmpDir("ss-asof")
    // phase 1: dimension writes land, then facts arrive
    Seq((1L, 10L, 100L), (1L, 10L, 101L), (2L, 5L, 200L))
      .toDF("k", "rt", "rid").write.mode("overwrite").parquet(s"$dir/right")
    Seq((1L, 18L, 0L), (2L, 10L, 1L), (3L, 7L, 2L))
      .toDF("k", "t", "lid").write.mode("overwrite").parquet(s"$dir/left")
    val lSchema = spark.read.parquet(s"$dir/left").schema
    val rSchema = spark.read.parquet(s"$dir/right").schema
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    def runOnce(): Unit = {
      val l = spark.readStream.schema(lSchema).parquet(s"$dir/left")
      val r = spark.readStream.schema(rSchema).parquet(s"$dir/right")
      val joined = StreamingAnalytics.streamingAsOfJoinStream(
        l, r, Seq("k" -> "k"), "t", "rt", rightTiebreak = Seq("rid"),
        mode = AsOfStreamMode.Arrival)
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // clash prefix applies to "k" only; "rid" is unique to the right
          got ++= b.select(col("lid"), col("rid"))
            .as[(Long, Option[Long])].collect()
          ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    // backward semantics inside one batch: tie on rt=10 -> last rid wins
    assert(got.toMap == Map(0L -> Some(101L), 1L -> Some(200L), 2L -> None),
      s"phase 1 diverged: ${got.toMap}")
    // phase 2: BOTH streams advance; the restarted query must resume
    // from the checkpoint and key 2's held dimension row (written in
    // phase 1) must still enrich a phase-2 fact
    Seq((1L, 30L, 102L))
      .toDF("k", "rt", "rid").write.mode("append").parquet(s"$dir/right")
    Seq((1L, 31L, 3L), (2L, 6L, 4L))
      .toDF("k", "t", "lid").write.mode("append").parquet(s"$dir/left")
    runOnce()
    assert(got.size == 5, s"restart must process only the new files: $got")
    // the full streamed result equals the BATCH native as-of join over
    // the complete inputs (the feeds are time-ordered, so arrival
    // matching and retroactive truth coincide)
    val lB = spark.read.parquet(s"$dir/left")
    val rB = spark.read.parquet(s"$dir/right")
    val batch = graft.plans.AsOfJoin.backward(lB, rB,
      Seq(lB("k")), Seq(rB("k")), lB("t"), rB("rt"), Seq(rB("rid")))
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got.toMap == batch,
      s"stream-stream as-of diverged from batch: ${got.toMap} vs $batch")
  }

  test("stream-stream as-of: randomized time-sliced feeds equal the batch join") {
    // the equality contract: on feeds that arrive in time order (sliced
    // into phases along a shared time axis, both sides advancing each
    // phase), arrival-order matching and retroactive batch truth
    // coincide — for ANY key/time layout, with and without tolerance.
    // Random keys/times; equal-time ties stay within one phase by
    // construction (phase boundaries cut the time axis, not row counts),
    // so the in-batch (time, right-first, tiebreak) sort governs them.
    val rnd = new scala.util.Random(11)
    for (tol <- Seq(None, Some(40L))) {
      val dir = tmpDir(s"ss-asof-rand-tol${tol.isDefined}")
      def gen(n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map(i => (rnd.nextInt(5).toLong + 1L, rnd.nextInt(300).toLong, i.toLong))
      val right = gen(120) // (k, rt, rid)
      val left = gen(120)  // (k, t, lid)
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
      var first = true
      for ((lo, hi) <- Seq((0L, 100L), (100L, 200L), (200L, 300L))) {
        val mode = if (first) "overwrite" else "append"
        right.filter(r => r._2 >= lo && r._2 < hi)
          .toDF("k", "rt", "rid").write.mode(mode).parquet(s"$dir/right")
        left.filter(r => r._2 >= lo && r._2 < hi)
          .toDF("k", "t", "lid").write.mode(mode).parquet(s"$dir/left")
        first = false
        val lSchema = spark.read.parquet(s"$dir/left").schema
        val rSchema = spark.read.parquet(s"$dir/right").schema
        val joined = StreamingAnalytics.streamingAsOfJoinStream(
          spark.readStream.schema(lSchema).parquet(s"$dir/left"),
          spark.readStream.schema(rSchema).parquet(s"$dir/right"),
          Seq("k" -> "k"), "t", "rt",
          rightTiebreak = Seq("rid"), toleranceMs = tol,
          mode = AsOfStreamMode.Arrival)
        val q = joined.writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$dir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            got ++= b.select(col("lid"), col("rid"))
              .as[(Long, Option[Long])].collect()
            ()
          }
          .start()
        q.awaitTermination()
      }
      val lB = spark.read.parquet(s"$dir/left")
      val rB = spark.read.parquet(s"$dir/right")
      val batch = graft.plans.AsOfJoin.backward(lB, rB,
        Seq(lB("k")), Seq(rB("k")), lB("t"), rB("rt"), Seq(rB("rid")),
        toleranceMs = tol)
        .select(col("lid"), col("rid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got.size == left.size, s"left-total violated: ${got.size}")
      assert(got.toMap == batch,
        s"randomized stream-stream (tol=$tol) diverged from batch")
    }
  }

  test("stream-stream as-of: TIMESTAMP time columns mean milliseconds, nulls raise") {
    // the batch operator normalizes TIMESTAMP via unix_millis; a bare
    // cast(LongType) yields SECONDS — same flags would silently mean a
    // 1000x wider tolerance on the streaming path
    val dir = tmpDir("ss-asof-ts")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-01-01 00:00:00"), 100L))
      .toDF("k", "rt", "rid").write.mode("overwrite").parquet(s"$dir/right")
    Seq((1L, ts("2024-01-01 00:00:03"), 0L),  // 3s stale: within 5s tolerance
        (1L, ts("2024-01-01 00:00:10"), 1L))  // 10s stale: must NOT match
      .toDF("k", "t", "lid").write.mode("overwrite").parquet(s"$dir/left")
    val lSchema = spark.read.parquet(s"$dir/left").schema
    val rSchema = spark.read.parquet(s"$dir/right").schema
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = StreamingAnalytics.streamingAsOfJoinStream(
      spark.readStream.schema(lSchema).parquet(s"$dir/left"),
      spark.readStream.schema(rSchema).parquet(s"$dir/right"),
      Seq("k" -> "k"), "t", "rt", toleranceMs = Some(5000L),
      mode = AsOfStreamMode.Arrival)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= b.select(col("lid"), col("rid")).as[(Long, Option[Long])].collect()
        ()
      }
      .start()
    q.awaitTermination()
    assert(got.toMap == Map(0L -> Some(100L), 1L -> None),
      s"tolerance must be MILLISECONDS on timestamp columns: ${got.toMap}")
    // null time: the same loud per-row contract as the batch API
    Seq((Some(1L), Option.empty[java.sql.Timestamp], Some(2L)))
      .toDF("k", "t", "lid").write.mode("append").parquet(s"$dir/left")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = StreamingAnalytics.streamingAsOfJoinStream(
        spark.readStream.schema(lSchema).parquet(s"$dir/left"),
        spark.readStream.schema(rSchema).parquet(s"$dir/right"),
        Seq("k" -> "k"), "t", "rt")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("noop")
        .start()
      q2.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("null left-side time")),
      s"null time must raise the batch API's message: ${messages(err)}")
  }

  test("stream-stream as-of EventTime: arbitrary arrival order equals the batch join") {
    // the out-of-order-safe contract: rows buffer until the watermark
    // passes them and replay in event-time order, so the output equals
    // the batch native join for ANY arrival order within the watermark
    // — here both sides are shuffled into interleaved micro-batch
    // slices that share NOTHING with event-time order (facts routinely
    // arrive before the dimension writes they must match)
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(12)
    for (tol <- Seq(None, Some(40L))) {
      val right = (0 until 100).map(i =>
        (rnd.nextInt(5) + 1L, h0 + rnd.nextInt(300).toLong, i.toLong))
      val left = (0 until 100).map(i =>
        (rnd.nextInt(5) + 1L, h0 + rnd.nextInt(300).toLong, i.toLong))
      val lSlices = rnd.shuffle(left).grouped(20).toSeq
      val rSlices = rnd.shuffle(right).grouped(20).toSeq
      val lMem = MemoryStream[(Long, Long, Long)]
      val rMem = MemoryStream[(Long, Long, Long)]
      val joined = StreamingAnalytics.streamingAsOfJoinStream(
        lMem.toDF().toDF("k", "t", "lid"), rMem.toDF().toDF("k", "rt", "rid"),
        Seq("k" -> "k"), "t", "rt", rightTiebreak = Seq("rid"),
        toleranceMs = tol) // default mode: EventTime
      val name = s"ssa_et_${tol.isDefined}"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      lSlices.map(Option(_)).zipAll(rSlices.map(Option(_)), None, None)
        .foreach { case (ls, rs) =>
          ls.foreach(s => lMem.addData(s: _*))
          rs.foreach(s => rMem.addData(s: _*))
          q.processAllAvailable()
        }
      // two flush rows on the RIGHT side (rights emit nothing): the
      // first advances the watermark past every real row, the second
      // runs a batch under that watermark so every key's replay timeout
      // fires and drains its buffer
      rMem.addData((99L, h0 + 7200000L, 900L)); q.processAllAvailable()
      rMem.addData((99L, h0 + 7200001L, 901L)); q.processAllAvailable()
      val got = spark.table(name).select("lid", "rid")
        .as[(Long, Option[Long])].collect()
      q.stop()
      val lB = left.toDF("k", "t", "lid")
      val rB = right.toDF("k", "rt", "rid")
      val batch = graft.plans.AsOfJoin.backward(lB, rB,
        Seq(lB("k")), Seq(rB("k")), lB("t"), rB("rt"), Seq(rB("rid")),
        toleranceMs = tol)
        .select(col("lid"), col("rid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got.length == left.size, s"left-total violated: ${got.length}")
      assert(got.toMap == batch,
        s"EventTime mode (tol=$tol) diverged from the batch join")
    }
  }

  test("stream-stream as-of EventTime: a fact arriving BEFORE its dimension write still matches, across restart") {
    // the exact case Arrival mode cannot express: the left row lands in
    // run 1, the right row it must match (rt < t) only in run 2 — and
    // the buffered fact survives the checkpoint restart in between
    val dir = tmpDir("ss-asof-et-restart")
    Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    val lSchema = spark.read.parquet(s"$dir/left").schema
    val rSchema = new org.apache.spark.sql.types.StructType()
      .add("k", "long", nullable = false).add("rt", "long", nullable = false)
      .add("rid", "long", nullable = false)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    def runOnce(): Unit = {
      val joined = StreamingAnalytics.streamingAsOfJoinStream(
        spark.readStream.schema(lSchema).parquet(s"$dir/left"),
        spark.readStream.schema(rSchema).parquet(s"$dir/right"),
        Seq("k" -> "k"), "t", "rt", rightTiebreak = Seq("rid"),
        watermark = "1 minute")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got ++= b.select(col("lid"), col("rid")).as[(Long, Option[Long])].collect()
          ()
        }
        .start()
      q.awaitTermination()
    }
    // run 1: only the fact exists; nothing can emit (watermark at 0)
    Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rid")
      .write.mode("overwrite").parquet(s"$dir/right")
    runOnce()
    assert(got.isEmpty, s"nothing may emit before the watermark passes: $got")
    // run 2: the dimension write the fact should match arrives LATE
    Seq((1L, 10L, 100L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    // runs 3+4: flush rows push the watermark past the real rows, then
    // run a batch under it so the replay timeout fires
    Seq((9L, 10000000L, 900L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    Seq((9L, 10000001L, 901L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    assert(got.toList == List((0L, Some(100L))),
      s"the retro-match must emit exactly once after the watermark: $got")
  }

  test("keyless stream-stream as-of: global dimension timeline, across restart") {
    // the streaming twin of q_asof_global: no join key, every fact
    // matches the single global rate table (EventTime replay, so rate
    // writes may arrive after the facts they calibrate)
    val dir = tmpDir("ss-asof-keyless")
    Seq((5L, 0L), (12L, 1L), (30L, 2L)).toDF("t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    Seq((10L, 100L)).toDF("rt", "rate")
      .write.mode("overwrite").parquet(s"$dir/right")
    val lSchema = spark.read.parquet(s"$dir/left").schema
    val rSchema = spark.read.parquet(s"$dir/right").schema
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    def runOnce(): Unit = {
      val joined = StreamingAnalytics.streamingAsOfJoinStream(
        spark.readStream.schema(lSchema).parquet(s"$dir/left"),
        spark.readStream.schema(rSchema).parquet(s"$dir/right"),
        keys = Nil, "t", "rt", rightTiebreak = Seq("rate"),
        watermark = "1 minute")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got ++= b.select(col("lid"), col("rate")).as[(Long, Option[Long])].collect()
          ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    // restart with a newer global rate write, then flush twice
    Seq((25L, 101L)).toDF("rt", "rate")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    Seq((10000000L, 900L)).toDF("rt", "rate")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    Seq((10000001L, 901L)).toDF("rt", "rate")
      .write.mode("append").parquet(s"$dir/right")
    runOnce()
    // lid 0 (t=5) predates every rate; lid 1 (t=12) takes the rt=10
    // write; lid 2 (t=30) takes the rt=25 write from the SECOND run.
    // (the flush rows are future rates no fact reaches)
    assert(got.toMap == Map(0L -> None, 1L -> Some(100L), 2L -> Some(101L)),
      s"keyless global as-of diverged: ${got.toMap}")
    // and the batch keyless join over the same inputs agrees
    val lB = spark.read.parquet(s"$dir/left")
    val rB = spark.read.parquet(s"$dir/right")
    val batch = graft.plans.AsOfJoin.backward(lB, rB, Nil, Nil,
      lB("t"), rB("rt"), Seq(rB("rate")))
      .select(col("lid"), col("rate")).as[(Long, Option[Long])].collect().toMap
    assert(got.toMap == batch, s"keyless stream diverged from batch: $batch")
  }

  test("streaming interval-overlap: windows bleed across sessions, survive timeout closes") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.StreamingAnalytics.{OverlapEvent, SessionOverlap}
    def m(x: Long) = h0 + x * 60000L
    val mem = MemoryStream[OverlapEvent]
    val q = StreamingAnalytics.streamingIntervalOverlap(
        mem.toDS(), gapMs = 30L * 60000, winMs = 60L * 60000,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ovl").outputMode("append").start()
    // the watermark is GLOBAL across users, so the timeline interleaves:
    // no row may be added once the watermark (max event time, 0s delay)
    // has passed it
    // b1 — user 1 session A: error at 0m (window [0,60m)), click at 10m;
    //      user 3's error session (the timeout-path subject)
    mem.addData(OverlapEvent(1L, m(0), isError = true),
      OverlapEvent(1L, m(10), isError = false),
      OverlapEvent(3L, m(0), isError = true))
    q.processAllAvailable()
    // b2 — 35m gap closes A in-stream; session B opens at 45m and must
    // count the STILL-LIVE window from A (w_end 60m > 45m) + its own
    // error (window to 106m). Watermark after b2: 46m.
    mem.addData(OverlapEvent(1L, m(45), isError = false),
      OverlapEvent(1L, m(46), isError = true))
    q.processAllAvailable()
    // b3 — dummy row fires user 3's event-time timeout (46m > 0m+30m):
    // the session emits and its live window (to 60m) must be HELD
    mem.addData(OverlapEvent(2L, m(46), isError = false))
    q.processAllAvailable()
    // b4 — user 3 returns at 47m, inside the held window -> counts it
    mem.addData(OverlapEvent(3L, m(47), isError = false))
    q.processAllAvailable()
    // b5 — 32m gap closes user 1's B; session C opens at 78m counting
    // only B's window (106m > 78m; A's expired at 60m — unasserted,
    // C never closes)
    mem.addData(OverlapEvent(1L, m(78), isError = false))
    q.processAllAvailable()
    // b6 — 32m gap closes user 3's second session
    mem.addData(OverlapEvent(3L, m(79), isError = false))
    q.processAllAvailable()
    val out = spark.table("ovl").as[SessionOverlap].collect()
    q.stop()
    val u1 = out.filter(_.userId == 1L).sortBy(_.start)
    assert(u1.map(s => (s.start, s.end, s.nOverlaps)).toSeq == Seq(
      (m(0), m(10) + 1, 1L),   // A: its own error window only
      (m(45), m(46) + 1, 2L)), // B: A's live window + its own error
      s"user-1 sessions diverged: ${u1.toSeq}")
    val u3 = out.filter(_.userId == 3L).sortBy(_.start)
    assert(u3.map(s => (s.start, s.end, s.nOverlaps)).toSeq == Seq(
      (m(0), m(0) + 1, 1L),    // timed out; emitted with its own window
      (m(47), m(47) + 1, 1L)), // the held window survived the timeout
      s"user-3 sessions diverged: ${u3.toSeq}")
  }

  test("streaming interval-overlap: arbitrary arrival order equals the batch gate query") {
    // the out-of-order-safe contract: events buffer until the watermark
    // passes them and replay through the session logic in event-time
    // order, so the closed sessions equal the batch day-bucketed join
    // for ANY arrival order within the watermark — here the feed is a
    // seeded random shuffle sliced across micro-batches
    implicit val ctx = spark.sqlContext
    import graft.streaming.StreamingAnalytics.{OverlapEvent, SessionOverlap}
    val rnd = new scala.util.Random(21)
    // 7-minute steps over ~17.5h: per-user gaps straddle the 30-min
    // session gap, and 60-min windows outlast it (cross-session bleed)
    val events = (0 until 150).map { i =>
      (rnd.nextInt(6) + 1L, h0 + i * 7L * 60000L, i.toLong,
        if (rnd.nextInt(10) < 3) "error" else "click")
    }
    // the batch gate query over the identical events table
    val dir = tmpDir("ovl-ooo-batch")
    events.map { case (u, ms, id, tpe) => (u, ms * 1000000L, id, tpe, 1.0) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.queries.AnalyticsQueries.intervalOverlapJoin(spark, dir)
      .select("user_id", "s_start", "s_end", "n_overlaps")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.size > 20 && want.exists(_._4 >= 2L),
      s"fixture must produce many sessions with real overlap counts: ${want.size}")
    // stream the SAME events in shuffled order across 5 micro-batches
    val mem = MemoryStream[OverlapEvent]
    val q = StreamingAnalytics.streamingIntervalOverlap(
        mem.toDS(), gapMs = 30L * 60000, winMs = 60L * 60000,
        watermarkDelay = "18 hours")
      .writeStream.format("memory").queryName("ovl_ooo")
      .outputMode("append").start()
    rnd.shuffle(events).grouped(30).foreach { slice =>
      mem.addData(slice.map(e => OverlapEvent(e._1, e._2, e._4 == "error")): _*)
      q.processAllAvailable()
    }
    // flush twice: advance the watermark past every session's gap
    // horizon, then run a batch under it so the close timeouts fire
    val flushT = h0 + 1000L * 3600000L
    mem.addData(OverlapEvent(99L, flushT, isError = false))
    q.processAllAvailable()
    mem.addData(OverlapEvent(99L, flushT + 1L, isError = false))
    q.processAllAvailable()
    val got = spark.table("ovl_ooo").as[SessionOverlap].collect()
      .filter(_.userId != 99L)
      .map(s => (s.userId, s.start, s.end, s.nOverlaps)).toSet
    q.stop()
    assert(got == want,
      s"shuffled-arrival streaming diverged from the batch join:\n" +
        s"missing: ${want -- got}\nextra: ${got -- want}")
  }

  test("streaming cusum equals the batch changepoint census on a replayed feed") {
    implicit val ctx = spark.sqlContext
    val sf = SparkSuite.sf0001
    // the batch baseline: per type, (m observed hours, S total events)
    val hourlyRows = graft.model.Tables.pq(spark, sf, "events")
      .select(col("event_type"), org.apache.spark.sql.functions.expr(
        "(ts div 1000000) div 3600000").as("h"))
      .groupBy("event_type", "h")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val baseline = hourlyRows.groupBy(_._1).map { case (t, rs) =>
      t -> ((rs.length.toLong, rs.map(_._3).sum))
    }
    val mem = MemoryStream[StreamingAnalytics.HourCount]
    val got = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    val q = StreamingAnalytics.streamingCusum(mem.toDS(), baseline)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("append").start()
    // two micro-batches split mid-stream: state must carry across
    val feed = hourlyRows.map(r => StreamingAnalytics.HourCount(r._1, r._2, r._3))
    val (a, b) = feed.splitAt(feed.length / 2)
    mem.addData(a.toIndexedSeq); q.processAllAvailable()
    mem.addData(b.toIndexedSeq); q.processAllAvailable()
    q.stop()
    spark.table("cusum").as[StreamingAnalytics.CusumPoint].collect()
      .groupBy(_.event_type).foreach { case (t, ps) =>
        val last = ps.maxBy(_.h)
        got(t) = ((baseline(t)._1, last.peak, last.peak_h))
      }
    val want = graft.queries.AnalyticsQueries.cusumChangepoint(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, m, peakMs, excess) =>
        t -> ((m, math.round(excess * m), peakMs / 3600000L))
      }.toMap
    assert(got.toMap == want,
      s"streaming cusum diverged from the batch census:\n$got\n$want")
  }

  test("streaming compaction maintains latest value per key across batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[graft.model.ReducedConsumerRecord]
    def r(key: Option[String], offset: Long, value: String) =
      graft.model.ReducedConsumerRecord("t1", 0, offset, key, value, h0 + offset, 0)
    val compacted = StreamingAnalytics.streamingCompact(
      mem.toDF().withColumnRenamed("timestampType", "timestamp_type"))
    val q = compacted.writeStream.format("memory").queryName("comp")
      .outputMode("update").start()
    // "" and None are DIFFERENT keys (batch latestPerKey parity)
    mem.addData(r(Some("a"), 0, "v0"), r(Some("a"), 1, "v1"), r(Some("b"), 2, "v2"),
      r(Some(""), 5, "vEmpty"), r(None, 10, "vNull"))
    q.processAllAvailable()
    mem.addData(r(Some("a"), 3, "v3")) // supersedes a; others untouched
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("comp").as[StreamingAnalytics.LatestRecord].collect()
    val latest = emitted.groupBy(_.key).map { case (k, rs) =>
      k -> rs.maxBy(_.offset).value
    }
    assert(latest == Map(
      Some("a") -> "v3", Some("b") -> "v2", Some("") -> "vEmpty", None -> "vNull"))
    // the second batch re-emitted ONLY the touched key with its new latest
    assert(emitted.count(e => e.key.contains("a") && e.offset == 3L) == 1)
  }

  test("sessionize: gap closes sessions in-batch and via event-time timeout") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val sessions = StreamingAnalytics.sessionize(mem.toDS(), gapMs = 60000L,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // user 1: two events 2 min apart -> first session closes in-batch
    mem.addData(UserEvent(1L, h0), UserEvent(1L, h0 + 1000L), UserEvent(1L, h0 + 130000L))
    q.processAllAvailable()
    // advance the watermark far past user 1's open session -> timeout close
    mem.addData(UserEvent(2L, h0 + 1000L * 3600))
    q.processAllAvailable()
    mem.addData(UserEvent(2L, h0 + 1000L * 3600 + 1000L))
    q.processAllAvailable()
    val out = spark.table("sess").as[ClosedSession].collect()
    q.stop()
    val u1 = out.filter(_.userId == 1L).sortBy(_.start)
    assert(u1.length == 2, s"expected both user-1 sessions closed, got ${u1.toSeq}")
    assert(u1(0).n == 2 && u1(0).durationMs == 1000L)
    assert(u1(1).n == 1 && u1(1).durationMs == 0L)
  }

  test("stream-static enrichment joins the broadcast dimension, keeps unmatched") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (event_id, user_id)
    val dim = Seq((7L, "gold"), (9L, "basic")).toDF("c_custkey", "tier")
    val q = StreamingAnalytics.enrichStream(
        mem.toDF().toDF("event_id", "user_id"), dim, "c_custkey")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    mem.addData((1L, 7L), (2L, 42L))
    q.processAllAvailable()
    val out = spark.table("enriched")
      .as[(Long, Long, Option[String])].collect().toSet
    q.stop()
    assert(out == Set((1L, 7L, Some("gold")), (2L, 42L, None)),
      s"dimension must enrich matches and keep unmatched rows, got $out")
  }

  test("stream-stream join matches events to orders within the time window") {
    implicit val ctx = spark.sqlContext
    val ordersMem = MemoryStream[(Long, Long, Long)] // (o_orderkey, o_custkey, odate_ms)
    val eventsMem = MemoryStream[(Long, Long, Long)] // (event_id, user_id, ts_ms)
    val joined = StreamingAnalytics.streamStreamJoin(
      ordersMem.toDF().toDF("o_orderkey", "o_custkey", "odate_ms"),
      eventsMem.toDF().toDF("event_id", "user_id", "ts_ms"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    // order for customer 7 at h0; matching event 30 min later arrives in a
    // LATER batch (state must hold the order); event 2h later must not match
    ordersMem.addData((100L, 7L, h0))
    q.processAllAvailable()
    eventsMem.addData((1L, 7L, h0 + 1800000L), (2L, 7L, h0 + 7200000L), (3L, 9L, h0 + 60000L))
    q.processAllAvailable()
    val out = spark.table("ssj")
      .select("o_orderkey", "event_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(out == Set((100L, 1L)),
      s"only the in-window same-customer event joins, got $out")
  }

  test("sessionize: arbitrary arrival order equals batch gap sessionization") {
    // sessionize now rides the OrderedReplay combinator: closed sessions
    // must equal the batch gaps-and-islands answer for ANY arrival
    // order within the watermark
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val gap = 200000L
    val events = (0 until 200).map(i => UserEvent(rnd.nextInt(5) + 1L, h0 + i * 37000L))
    val want: Set[(Long, Long, Long, Long)] = events.groupBy(_.userId)
      .flatMap { case (u, es) =>
        val ts = es.map(_.tsMs).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head > gap) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }
        sessions.map(s => (u, s.min, s.length.toLong, s.max - s.min))
      }.toSet
    assert(want.size > 30, s"fixture must split into many sessions: ${want.size}")
    val mem = MemoryStream[UserEvent]
    val q = StreamingAnalytics.sessionize(mem.toDS(), gapMs = gap,
        watermarkDelay = "3 hours") // covers the full ~2h span: nothing is late
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    rnd.shuffle(events).grouped(40).foreach { slice =>
      mem.addData(slice: _*); q.processAllAvailable()
    }
    val flushT = h0 + 1000L * 3600000L
    mem.addData(UserEvent(99L, flushT)); q.processAllAvailable()
    mem.addData(UserEvent(99L, flushT + 1L)); q.processAllAvailable()
    val got = spark.table("sess_ooo").as[ClosedSession].collect()
      .filter(_.userId != 99L)
      .map(s => (s.userId, s.start, s.n, s.durationMs)).toSet
    q.stop()
    assert(got == want,
      s"shuffled sessionize diverged:\nmissing: ${want -- got}\nextra: ${got -- want}")
  }

  test("streaming funnel event-time arm: shuffled arrival equals the batch chained-minima") {
    implicit val ctx = spark.sqlContext
    import StreamingAnalytics.{TypedEvent, FunnelCompletion}
    val rnd = new scala.util.Random(41)
    val types = Seq("signup", "view", "purchase", "click")
    val events = (0 until 300).map(i =>
      TypedEvent(rnd.nextInt(6) + 1L, h0 + i * 1000L, types(rnd.nextInt(4))))
    // the batch semantics: earliest signup, first view at-or-after it,
    // first purchase at-or-after that
    val want: Set[(Long, Long, Long, Long)] = events.groupBy(_.userId)
      .flatMap { case (u, es) =>
        val sorted = es.sortBy(_.tsMs)
        for {
          t1 <- sorted.filter(_.eventType == "signup").map(_.tsMs).minOption
          t2 <- sorted.filter(e => e.eventType == "view" && e.tsMs >= t1)
            .map(_.tsMs).minOption
          tp <- sorted.filter(e => e.eventType == "purchase" && e.tsMs >= t2)
            .map(_.tsMs).minOption
        } yield (u, t1, tp, tp - t1)
      }.toSet
    assert(want.nonEmpty, "fixture must complete some funnels")
    val mem = MemoryStream[TypedEvent]
    val q = StreamingAnalytics.streamingFunnel(mem.toDS(),
        watermarkDelay = Some("10 minutes")) // covers the 5-min span
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append").start()
    rnd.shuffle(events).grouped(60).foreach { slice =>
      mem.addData(slice: _*); q.processAllAvailable()
    }
    val flushT = h0 + 1000L * 3600000L
    mem.addData(TypedEvent(99L, flushT, "click")); q.processAllAvailable()
    mem.addData(TypedEvent(99L, flushT + 1L, "click")); q.processAllAvailable()
    val got = spark.table("funnel_ooo").as[FunnelCompletion].collect()
      .map(c => (c.userId, c.signupMs, c.purchaseMs, c.convMs)).toSet
    q.stop()
    assert(got == want,
      s"event-time funnel diverged:\nmissing: ${want -- got}\nextra: ${got -- want}")
  }

  test("streaming funnel advances stages across batches, emits completion once") {
    implicit val ctx = spark.sqlContext
    import StreamingAnalytics.{TypedEvent, FunnelCompletion}
    val mem = MemoryStream[TypedEvent]
    val q = StreamingAnalytics.streamingFunnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    // batch 1: user 1 signs up and views; user 2 purchases with no signup
    mem.addData(
      TypedEvent(1L, h0, "signup"), TypedEvent(1L, h0 + 1000L, "view"),
      TypedEvent(2L, h0, "purchase"))
    q.processAllAvailable()
    assert(spark.table("funnel").count() == 0, "no completion before the last stage")
    // batch 2: user 1 purchases (completes); a second purchase must not re-emit
    mem.addData(
      TypedEvent(1L, h0 + 5000L, "purchase"),
      TypedEvent(1L, h0 + 9000L, "purchase"))
    q.processAllAvailable()
    // batch 3: user 2 signup->view->purchase all in one batch, any order
    mem.addData(
      TypedEvent(2L, h0 + 3000L, "purchase"),
      TypedEvent(2L, h0 + 1000L, "signup"),
      TypedEvent(2L, h0 + 2000L, "view"))
    q.processAllAvailable()
    val out = spark.table("funnel").as[FunnelCompletion].collect().sortBy(_.userId)
    q.stop()
    assert(out.length == 2, s"one completion per user, got ${out.toSeq}")
    assert(out(0) == FunnelCompletion(1L, h0, h0 + 5000L, 5000L))
    assert(out(1) == FunnelCompletion(2L, h0 + 1000L, h0 + 3000L, 2000L))
  }

  test("streaming dedup keeps first-seen doc per fingerprint within the watermark") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val deduped = StreamingAnalytics.streamingDedup(
      mem.toDF().toDF("doc_id", "text", "ts_ms"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    // same normalized content under ids 1/2 (whitespace variants), distinct id 3
    mem.addData((1L, "Hello  world", h0), (2L, "hello world", h0 + 1000L),
      (3L, "something else", h0 + 2000L))
    q.processAllAvailable()
    // a later in-watermark duplicate of id 1 is still suppressed
    mem.addData((4L, "HELLO   WORLD", h0 + 3000L))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dd").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"expected first-seen survivors, got $kept")
  }

  test("streaming decontamination filters docs sharing a 3-gram, statelessly") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val clean = StreamingAnalytics.streamingDecontaminate(
      mem.toDF().toDF("doc_id", "text"),
      benchGrams = Seq("the quick fox"))
    val q = clean.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    mem.addData(
      (1L, "today the quick fox jumped"), // contaminated
      (2L, "the quick dog slept"),        // shares words, not the 3-gram
      (3L, "unrelated text entirely ok"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("decon").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"expected contaminated doc dropped, got $kept")
  }

  test("stateless pipeline columns (sampling, redaction) run unchanged on streams") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "src0", "customer paid the key value"),
      (2L, "src1", "no deny terms here"),
      (3L, "src9", "value value value"),
      (4L, "src2", "key material"))
    val mem = MemoryStream[(Long, String, String)]
    // the SAME column expressions the batch operators use — no state,
    // no watermark, append mode: the stateless subset of the pipeline
    // is streaming-reusable verbatim
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bucket", graft.queries.TextQueries.sampleBucket(col("doc_id")))
      .withColumn("red", graft.queries.TextQueries.redactedText(col("text")))
      .select("doc_id", "bucket", "red")
    val q = shape(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("stateless_reuse")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stateless_reuse")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = shape(rows.toDF("doc_id", "source", "text"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "stream and batch must produce identical rows")
    assert(streamed.exists(_._3.contains("<MASK>")))
  }

  test("token accounting accumulates per source across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingAnalytics.streamingTokenAccount(
      mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("tok_acct")
      .outputMode("complete").start()
    mem.addData((1L, "srcA", "one two three"), (2L, "srcB", "four"))
    q.processAllAvailable()
    mem.addData((3L, "srcA", "five six"))
    q.processAllAvailable()
    val got = spark.table("tok_acct")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    q.stop()
    // running totals: srcA = 2 docs / 5 tokens, srcB = 1 doc / 1 token
    assert(got == Seq(("srcA", 2L, 5L), ("srcB", 1L, 1L)), got.toString)
  }

  test("streaming shard offsets continue per source across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    // tiny budget so shard cuts happen inside the test
    val q = StreamingAnalytics.streamingShardOffsets(
      mem.toDF().toDF("doc_id", "source", "text"), budget = 10L)
      .writeStream.format("memory").queryName("shard_offs")
      .outputMode("append").start()
    // batch 1: srcA has 6 then 7 bytes (doc order must win, not arrival
    // order), srcB has 4
    mem.addData((2L, "srcA", "44 6 77"), (1L, "srcA", "666666"), (10L, "srcB", "4444"))
    q.processAllAvailable()
    // batch 2: srcA continues at offset 13, srcB at 4
    mem.addData((3L, "srcA", "88888888"), (11L, "srcB", "999999999"))
    q.processAllAvailable()
    val got = spark.table("shard_offs")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    q.stop()
    assert(got == Seq(
      ("srcA", 1L, 6L, 0L, 0L),   // bytes [0, 6)   -> shard 0 off 0
      ("srcA", 2L, 7L, 0L, 6L),   // bytes [6, 13)  -> shard 0 off 6
      ("srcA", 3L, 8L, 1L, 3L),   // bytes [13, 21) -> shard 1 off 3 (state carried)
      ("srcB", 10L, 4L, 0L, 0L),
      ("srcB", 11L, 9L, 0L, 4L)), got.toString)
    // per-source semantics match the batch packer's prefix rule
    got.groupBy(_._1).foreach { case (src, rows) =>
      var pre = 0L
      rows.sortBy(_._2).foreach { case (_, _, nb, sh, off) =>
        assert(sh == pre / 10L && off == pre % 10L, s"$src prefix rule")
        pre += nb
      }
    }
  }

  test("streaming token budget admits whole docs in id order until the source budget fills") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingAnalytics.streamingTokenBudget(
      mem.toDF().toDF("doc_id", "source", "text"), budget = 5L)
      .writeStream.format("memory").queryName("tok_budget")
      .outputMode("append").start()
    // batch 1: srcA docs 1 (3 tokens) and 2 (2 tokens) fill the budget
    mem.addData((2L, "srcA", "four five"), (1L, "srcA", "one two three"))
    q.processAllAvailable()
    // batch 2: srcA doc 3 is over budget (state carried); srcB starts fresh
    mem.addData((3L, "srcA", "six"), (10L, "srcB", "a b c d e f g"))
    q.processAllAvailable()
    val got = spark.table("tok_budget")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    q.stop()
    assert(got == Seq(
      ("srcA", 1L, 3L, 3L, true),
      ("srcA", 2L, 2L, 5L, true),
      ("srcA", 3L, 1L, 5L, false),   // budget already full across batches
      ("srcB", 10L, 7L, 0L, false)), // a doc larger than the budget never fits
      got.toString)
  }

  test("streaming interval-contains: shuffled two-sided arrival equals the batch API") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    // interval dimension: per key, windows of varied width, some
    // overlapping (a point may land in several), some empty
    val ivRows = (0 until 60).map { i =>
      val k = i % 4 + 1L
      val s = h0 + rnd.nextInt(400) * 10000L
      val w = rnd.nextInt(8) match {
        case 0 => 0L // empty interval: contains nothing
        case n => n * 30000L
      }
      (k, s, s + w, i.toLong)
    }
    // point facts, same span plus strays outside every window
    val ptRows = (0 until 300).map { i =>
      (i % 5 + 1L, h0 + rnd.nextInt(4200) * 1000L, i.toLong)
    }
    val ivDF = ivRows.toDF("k", "s", "e", "iid")
    val ptDF = ptRows.toDF("pk", "p", "pid")
    val want = graft.operators.IntervalJoin.contains(
        ivDF, ptDF, Seq("k" -> "pk"), "s", "e", "p", bucketMs = Some(60000L))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(want.size > 50, s"fixture too sparse: ${want.size} matches")
    val ivMem = MemoryStream[(Long, Long, Long, Long)]
    val ptMem = MemoryStream[(Long, Long, Long)]
    val joined = StreamingAnalytics.streamingIntervalContains(
      ivMem.toDF().toDF("k", "s", "e", "iid"),
      ptMem.toDF().toDF("pk", "p", "pid"),
      Seq("k" -> "pk"), "s", "e", "p",
      watermark = "3 hours") // covers the fixture span: nothing is late
    val q = joined.writeStream.format("memory").queryName("sic")
      .outputMode("append").start()
    // both sides shuffled independently and interleaved across batches
    val ivSlices = rnd.shuffle(ivRows).grouped(15).toSeq
    val ptSlices = rnd.shuffle(ptRows).grouped(60).toSeq
    (0 until math.max(ivSlices.length, ptSlices.length)).foreach { i =>
      ivSlices.lift(i).foreach(s => ivMem.addData(s: _*))
      ptSlices.lift(i).foreach(s => ptMem.addData(s: _*))
      q.processAllAvailable()
    }
    // flush: far-future rows on both sides advance the watermark past
    // every buffered event (twice so the new watermark takes effect)
    val flushT = h0 + 1000L * 3600000L
    (0 until 2).foreach { j =>
      ivMem.addData((99L, flushT + j, flushT + j, 9990L + j))
      ptMem.addData((99L, flushT + j, 9990L + j))
      q.processAllAvailable()
    }
    val got = spark.table("sic").select("iid", "pid")
      .as[(Long, Long)].collect().filter(_._1 < 9990L).toSet
    q.stop()
    assert(got == want,
      s"shuffled interval-contains diverged:\nmissing: ${want -- got}\nextra: ${got -- want}")
    // column contract matches the batch API: interval cols then point
    // cols, clashes right_-prefixed (none here)
    assert(joined.columns.toSeq == Seq("k", "s", "e", "iid", "pk", "p", "pid"))
  }

  test("streaming interval-overlap join: shuffled two-sided arrival equals the batch API") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val maxLen = 240000L
    def mkIv(n: Int, keyMod: Int) = (0 until n).map { i =>
      val s = h0 + rnd.nextInt(400) * 10000L
      (i % keyMod + 1L, s, s + (rnd.nextInt(8) * 30000L), i.toLong) // some empty
    }
    val lRows = mkIv(80, 4)
    val rRows = mkIv(120, 5)
    val lDF = lRows.toDF("k", "s", "e", "lid")
    val rDF = rRows.toDF("rk", "rs", "re", "rid")
    val want = graft.operators.IntervalJoin.overlap(
        lDF, rDF, Seq("k" -> "rk"), "s", "e", "rs", "re", bucketMs = Some(60000L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(want.size > 40, s"fixture too sparse: ${want.size}")
    val lMem = MemoryStream[(Long, Long, Long, Long)]
    val rMem = MemoryStream[(Long, Long, Long, Long)]
    val joined = StreamingAnalytics.streamingIntervalOverlapJoin(
      lMem.toDF().toDF("k", "s", "e", "lid"),
      rMem.toDF().toDF("rk", "rs", "re", "rid"),
      Seq("k" -> "rk"), "s", "e", "rs", "re",
      maxLenMs = maxLen, watermark = "3 hours")
    // batch-API column contract: left cols then right cols (no clashes here)
    assert(joined.columns.toSeq == Seq("k", "s", "e", "lid", "rk", "rs", "re", "rid"))
    val q = joined.writeStream.format("memory").queryName("siov")
      .outputMode("append").start()
    val lSlices = rnd.shuffle(lRows).grouped(25).toSeq
    val rSlices = rnd.shuffle(rRows).grouped(35).toSeq
    (0 until math.max(lSlices.length, rSlices.length)).foreach { i =>
      lSlices.lift(i).foreach(s => lMem.addData(s: _*))
      rSlices.lift(i).foreach(s => rMem.addData(s: _*))
      q.processAllAvailable()
    }
    // inner stream-stream join emits as both sides arrive — no flush
    // needed for matches, but run one empty trigger for completeness
    q.processAllAvailable()
    val got = spark.table("siov").select("lid", "rid")
      .as[(Long, Long)].collect()
    q.stop()
    assert(got.length == got.toSet.size, "a pair must emit exactly once")
    assert(got.toSet == want,
      s"missing: ${want -- got.toSet}\nextra: ${got.toSet -- want}")
  }

  test("streaming interval-overlap: null endpoints drop (batch parity), keyless matches on overlap alone") {
    implicit val ctx = spark.sqlContext
    // null endpoints must be DROPPED like the batch operator drops
    // them — routed into the length guard they would raise, and in a
    // stream that is a poison pill (the uncommitted batch replays the
    // same rows forever)
    val lMem = MemoryStream[(Long, Option[Long], Option[Long], Long)]
    val rMem = MemoryStream[(Long, Option[Long], Option[Long], Long)]
    val joined = StreamingAnalytics.streamingIntervalOverlapJoin(
      lMem.toDF().toDF("k", "s", "e", "lid"),
      rMem.toDF().toDF("rk", "rs", "re", "rid"),
      Seq("k" -> "rk"), "s", "e", "rs", "re", maxLenMs = 60000L)
    val q = joined.writeStream.format("memory").queryName("siov_null")
      .outputMode("append").start()
    lMem.addData(
      (1L, Some(h0), Some(h0 + 30000L), 1L),
      (1L, None, Some(h0 + 30000L), 2L),     // null start
      (1L, Some(h0), None, 3L))              // null end
    rMem.addData(
      (1L, Some(h0 + 1000L), Some(h0 + 2000L), 10L),
      (1L, None, None, 11L))
    q.processAllAvailable()                  // must not throw
    val got = spark.table("siov_null").select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((1L, 10L)),
      s"only the non-null pair may match, got $got")
    // keyless: Spark rejects stream-stream joins with no equality
    // predicate, so the twin synthesizes a constant key — overlap
    // must match ACROSS what would otherwise be different keys
    val l2 = MemoryStream[(Long, Long, Long)]
    val r2 = MemoryStream[(Long, Long, Long)]
    val j2 = StreamingAnalytics.streamingIntervalOverlapJoin(
      l2.toDF().toDF("s", "e", "lid"),
      r2.toDF().toDF("rs", "re", "rid"),
      keys = Nil, "s", "e", "rs", "re", maxLenMs = 60000L)
    assert(j2.columns.toSeq == Seq("s", "e", "lid", "rs", "re", "rid"))
    val q2 = j2.writeStream.format("memory").queryName("siov_keyless")
      .outputMode("append").start()
    l2.addData((h0, h0 + 30000L, 1L), (h0 + 50000L, h0 + 55000L, 2L))
    r2.addData((h0 + 10000L, h0 + 20000L, 10L), (h0 + 200000L, h0 + 210000L, 11L))
    q2.processAllAvailable()
    val got2 = spark.table("siov_keyless").select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    q2.stop()
    assert(got2 == Set((1L, 10L)), s"keyless overlap diverged: $got2")
  }

  test("streaming interval-contains: null interval endpoints and null points drop, not NPE") {
    implicit val ctx = spark.sqlContext
    val ivMem = MemoryStream[(Long, Option[Long], Option[Long], Long)]
    val ptMem = MemoryStream[(Long, Option[Long], Long)]
    val joined = StreamingAnalytics.streamingIntervalContains(
      ivMem.toDF().toDF("k", "s", "e", "iid"),
      ptMem.toDF().toDF("pk", "p", "pid"),
      Seq("k" -> "pk"), "s", "e", "p", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sic_null")
      .outputMode("append").start()
    ivMem.addData(
      (1L, Some(h0), Some(h0 + 60000L), 1L),
      (1L, None, Some(h0 + 60000L), 2L),
      (1L, Some(h0), None, 3L))
    ptMem.addData((1L, Some(h0 + 1000L), 10L), (1L, None, 11L))
    q.processAllAvailable()                  // must not throw (NPE poison)
    // flush the watermark so the buffered point emits
    val flushT = h0 + 1000L * 3600000L
    (0 until 2).foreach { j =>
      ivMem.addData((99L, Some(flushT + j), Some(flushT + j + 1), 999L))
      ptMem.addData((99L, Some(flushT + j), 999L))
      q.processAllAvailable()
    }
    val got = spark.table("sic_null").select("iid", "pid")
      .as[(Long, Long)].collect().filter(_._1 != 999L).toSet
    q.stop()
    assert(got == Set((1L, 10L)), s"only the non-null pair may match: $got")
  }

  test("streaming interval-overlap join: over-long intervals raise, zero maxLen rejected") {
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Long, Long)]
    val rMem = MemoryStream[(Long, Long, Long, Long)]
    intercept[IllegalArgumentException] {
      StreamingAnalytics.streamingIntervalOverlapJoin(
        lMem.toDF().toDF("k", "s", "e", "lid"),
        rMem.toDF().toDF("rk", "rs", "re", "rid"),
        Seq("k" -> "rk"), "s", "e", "rs", "re", maxLenMs = 0L)
    }
    val joined = StreamingAnalytics.streamingIntervalOverlapJoin(
      lMem.toDF().toDF("k", "s", "e", "lid"),
      rMem.toDF().toDF("rk", "rs", "re", "rid"),
      Seq("k" -> "rk"), "s", "e", "rs", "re", maxLenMs = 60000L)
    val q = joined.writeStream.format("memory").queryName("siov_guard")
      .outputMode("append").start()
    // an interval longer than maxLenMs must fail the query loudly, not
    // silently lose its far matches
    lMem.addData((1L, h0, h0 + 120000L, 0L))
    rMem.addData((1L, h0 + 1000L, h0 + 2000L, 0L))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(err.getMessage.contains("maxLenMs") ||
      Option(err.getCause).exists(_.getMessage.contains("maxLenMs")), err.getMessage)
  }

  test("streaming interval-contains: dead intervals prune, state drains to zero") {
    implicit val ctx = spark.sqlContext
    val ivMem = MemoryStream[(Long, Long, Long, Long)]
    val ptMem = MemoryStream[(Long, Long, Long)]
    val joined = StreamingAnalytics.streamingIntervalContains(
      ivMem.toDF().toDF("k", "s", "e", "iid"),
      ptMem.toDF().toDF("pk", "p", "pid"),
      Seq("k" -> "pk"), "s", "e", "p", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sic_prune")
      .outputMode("append").start()
    ivMem.addData((1L, h0, h0 + 60000L, 0L))
    ptMem.addData((1L, h0 + 30000L, 0L)) // inside
    q.processAllAvailable()
    // advance the watermark far past the interval's end: the point
    // replays (matched), then the interval dies and key-1 state drops
    ptMem.addData((1L, h0 + 3600000L, 1L))
    q.processAllAvailable()
    ptMem.addData((1L, h0 + 7200000L, 2L))
    q.processAllAvailable()
    val got = spark.table("sic_prune").select("iid", "pid")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L)), s"only the in-window point matches: $got")
    // a later point far past the window: no state resurrection, no match
    ptMem.addData((1L, h0 + 10800000L, 3L))
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    val rows = progress.stateOperators.map(_.numRowsTotal).sum
    // key 1's live set and buffer drained; only the newest pending
    // point rows may remain buffered
    assert(rows <= 2, s"state must drain to the pending tail, got $rows rows")
  }
}
