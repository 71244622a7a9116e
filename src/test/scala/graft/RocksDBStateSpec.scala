package graft

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.{ClosedSession, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** The streaming family under the RocksDB state store provider — the
  * 100 TB posture for every `flatMapGroupsWithState` twin: the default
  * HDFS-backed store keeps ALL keys' state on the executor HEAP, which
  * at 100M+ keys (or deep replay buffers) is executor death; RocksDB
  * spills to local disk with a bounded block cache. The provider is a
  * session conf read at QUERY START and baked into the checkpoint's
  * state format — flip it only with a fresh checkpoint (restarts must
  * keep the provider they started with), which these specs also pin by
  * restarting the replay-buffer join mid-stream under RocksDB.
  */
class RocksDBStateSpec extends SparkSuite {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDB[A](f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    // RocksDBFileManager uploads checkpoints via FileSystem.getLocal,
    // which casts the `file:` FS to LocalFileSystem — this repo pins
    // RawLocalFileSystem instead (ISO backup keys contain ':',
    // HADOOP-14829), so restore the stock local FS UNCACHED for the
    // duration: fresh instances honor the override while the cached
    // RawLocal instance every other suite uses stays untouched. A real
    // cluster checkpoints to HDFS/S3 and never hits this.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.file.impl", "org.apache.hadoop.fs.LocalFileSystem")
    hc.set("fs.file.impl.disable.cache", "true")
    try f finally {
      hc.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      hc.unset("fs.file.impl.disable.cache")
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  /** The query must actually run on RocksDB: its state-operator
    * progress carries rocksdb custom metrics under the provider. */
  private def assertRocksDb(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    assert(q.recentProgress.exists(_.json.contains("rocksdb")),
      "expected rocksdb state-store metrics in the query progress")

  test("sessionize on RocksDB: gap and timeout closes match the default-store behavior") {
    withRocksDB {
      implicit val ctx = spark.sqlContext
      val h0 = 1700000000000L - (1700000000000L % 3600000L)
      val mem = MemoryStream[UserEvent]
      val sessions = StreamingAnalytics.sessionize(mem.toDS(), gapMs = 60000L,
        watermarkDelay = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("rdb_sess")
        .outputMode("append").start()
      mem.addData(UserEvent(1L, h0), UserEvent(1L, h0 + 1000L), UserEvent(1L, h0 + 130000L))
      q.processAllAvailable()
      mem.addData(UserEvent(2L, h0 + 1000L * 3600))
      q.processAllAvailable()
      mem.addData(UserEvent(2L, h0 + 1000L * 3600 + 1000L))
      q.processAllAvailable()
      val out = spark.table("rdb_sess").as[ClosedSession].collect()
      assertRocksDb(q)
      q.stop()
      val u1 = out.filter(_.userId == 1L).sortBy(_.start)
      assert(u1.length == 2 && u1(0).n == 2 && u1(0).durationMs == 1000L &&
        u1(1).n == 1 && u1(1).durationMs == 0L,
        s"RocksDB run diverged from the pinned sessionize behavior: ${u1.toSeq}")
    }
  }

  test("EventTime as-of replay buffer on RocksDB: retro-match survives a checkpoint restart") {
    withRocksDB {
      // the state-heaviest new shape: the watermark replay buffer plus
      // the dimension memory, round-tripped through RocksDB across FOUR
      // restarts of the same checkpoint
      val dir = tmpDir("rdb-asof-et")
      Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
        .write.mode("overwrite").parquet(s"$dir/left")
      Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rid")
        .write.mode("overwrite").parquet(s"$dir/right")
      val lSchema = spark.read.parquet(s"$dir/left").schema
      val rSchema = spark.read.parquet(s"$dir/right").schema
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
        assertRocksDb(q)
      }
      runOnce()
      assert(got.isEmpty)
      Seq((1L, 10L, 100L)).toDF("k", "rt", "rid")
        .write.mode("append").parquet(s"$dir/right")
      runOnce()
      Seq((9L, 10000000L, 900L)).toDF("k", "rt", "rid")
        .write.mode("append").parquet(s"$dir/right")
      runOnce()
      Seq((9L, 10000001L, 901L)).toDF("k", "rt", "rid")
        .write.mode("append").parquet(s"$dir/right")
      runOnce()
      assert(got.toList == List((0L, Some(100L))),
        s"RocksDB-backed replay must retro-match exactly once: $got")
    }
  }

  test("interval-overlap replay on RocksDB: held windows and sentinels round-trip") {
    withRocksDB {
      implicit val ctx = spark.sqlContext
      import graft.streaming.StreamingAnalytics.{OverlapEvent, SessionOverlap}
      val h0 = 1700000000000L - (1700000000000L % 3600000L)
      def m(x: Long) = h0 + x * 60000L
      val mem = MemoryStream[OverlapEvent]
      val q = StreamingAnalytics.streamingIntervalOverlap(
          mem.toDS(), gapMs = 30L * 60000, winMs = 60L * 60000,
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("rdb_ovl")
        .outputMode("append").start()
      // the existing spec's cross-session-bleed core, now with every
      // state round-trip (replay buffer, open session, windows-only
      // sentinel) through RocksDB
      mem.addData(OverlapEvent(1L, m(0), isError = true),
        OverlapEvent(1L, m(10), isError = false))
      q.processAllAvailable()
      mem.addData(OverlapEvent(1L, m(45), isError = false),
        OverlapEvent(1L, m(46), isError = true))
      q.processAllAvailable()
      mem.addData(OverlapEvent(1L, m(78), isError = false))
      q.processAllAvailable()
      mem.addData(OverlapEvent(2L, m(200), isError = false))
      q.processAllAvailable()
      mem.addData(OverlapEvent(2L, m(201), isError = false))
      q.processAllAvailable()
      val out = spark.table("rdb_ovl").as[SessionOverlap].collect()
      assertRocksDb(q)
      q.stop()
      val u1 = out.filter(_.userId == 1L).sortBy(_.start)
      assert(u1.map(s => (s.start, s.end, s.nOverlaps)).toSeq == Seq(
        (m(0), m(10) + 1, 1L),
        (m(45), m(46) + 1, 2L),  // prior session's live window + own error
        (m(78), m(78) + 1, 1L)), // session B's window bleeds in
        s"RocksDB interval-overlap diverged: ${u1.toSeq}")
    }
  }

  test("sketch aggregation state on RocksDB: theta window sketches stay exact") {
    // the streaming sketch twins hold TypedImperativeAggregate buffers
    // (serialized theta Union gadgets) in streaming-aggregation state —
    // a different state path than the flatMapGroupsWithState twins
    // above; this pins that the buffers round-trip through RocksDB's
    // value serialization with estimates still EXACT below capacity
    withRocksDB {
      implicit val ctx = spark.sqlContext
      val hour = 3600000L
      val rows = for {
        w <- 0 until 2; s <- Seq("web", "books"); i <- 0 until 30
      } yield (w * hour + (i % 50) * 60000L, s,
        s"${s}g${w * 20 + i} ${s}g${w * 20 + i + 1} ${s}g${w * 20 + i + 2}")
      val shuffled = new scala.util.Random(5).shuffle(rows)
      val mem = MemoryStream[(Long, String, String)]
      val q = StreamingAnalytics.streamingThetaSketches(
          mem.toDF().toDF("ts_ms", "source", "text"),
          watermark = "3 hours")
        .writeStream.format("memory").queryName("rocks_theta")
        .outputMode("append").start()
      shuffled.grouped(30).foreach { s => mem.addData(s); q.processAllAvailable() }
      mem.addData((10L * hour, "web", "a b c"))
      q.processAllAvailable()
      assertRocksDb(q)
      q.stop()
      val got = spark.table("rocks_theta")
        .filter(col("win_start_ms") < 5L * hour)
        .select("win_start_ms", "source", "n_docs", "n_grams_est")
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val exact = rows.groupBy(r => (r._1 / hour * hour, r._2))
        .map { case (k, rs) =>
          k -> (rs.size.toLong,
            rs.flatMap(_._3.split(' ').sliding(3).map(_.mkString(" ")))
              .toSet.size.toLong)
        }
      assert(got == exact, s"RocksDB theta sketches diverged: got $got want $exact")
    }
  }
}
