package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.UserEvent

/** A/B harness for OrderedReplay's DEEP-BUFFER posture: each key's
  * whole pending buffer is ONE state row (`ReplayState.pending`), so
  * every touch of a key deserializes and reserializes the full buffer
  * — with a long watermark × a hot key that is O(depth) per trigger
  * and O(batches × depth) over a backlog. This prices that cost, per
  * provider: the default HDFS-backed store (state on heap) vs RocksDB
  * (state on local disk, per-row get/put through the block cache).
  *
  * Fixture: sessionize with EVERYTHING on one key, timestamps inside
  * the watermark so nothing ever drains — the buffer grows by
  * `rowsPerBatch` each trigger while the session logic stays idle; the
  * final flush batch advances the watermark past the whole buffer and
  * replays it in one drain. Measured per-trigger wall-clock at each
  * depth plus the final drain, printed as one JSON line per provider.
  *
  * Usage: `runMain graft.tools.ReplayBufferAb [batches] [rowsPerBatch] [reps]`
  */
object ReplayBufferAb {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val rowsPerBatch = args.lift(1).map(_.toInt).getOrElse(5000)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val RocksDB =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val h0 = 1700000000000L - (1700000000000L % 3600000L)

    def run(provider: Option[String]): String = {
      val b = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.constraintPropagation.enabled", "false")
      // RocksDBFileManager needs the stock LocalFileSystem (see
      // RocksDBStateSpec); the default provider runs with it too so the
      // A/B differs ONLY in the provider
      val spark = b
        .config("spark.hadoop.fs.file.impl",
          "org.apache.hadoop.fs.LocalFileSystem")
        .getOrCreate()
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[UserEvent]
      val ckpt = java.nio.file.Files
        .createTempDirectory("replay_ab_ck").toString
      // gap larger than the event spacing: ONE giant session, so the
      // drain is one fold pass, not per-session output churn
      val q = StreamingAnalytics
        .sessionize(mem.toDS(), gapMs = 3600000L, watermarkDelay = "6 hours")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // all rows on key 1, timestamps packed inside ONE hour: the 6h
      // watermark never passes them, the buffer only grows
      val perBatch = (0 until batches).map { bi =>
        val rows = (0 until rowsPerBatch).map { i =>
          UserEvent(1L, h0 + ((bi.toLong * rowsPerBatch + i) % 3600L) * 1000L)
        }
        time { mem.addData(rows: _*); q.processAllAvailable() }
      }
      // flush: far-future rows advance the watermark past the buffer;
      // the whole depth replays through the fold in one drain
      val drain = time {
        mem.addData(UserEvent(99L, h0 + 400L * 3600000L))
        q.processAllAvailable()
        mem.addData(UserEvent(99L, h0 + 401L * 3600000L))
        q.processAllAvailable()
      }
      q.stop()
      spark.stop()
      val name = provider.map(_ => "rocksdb").getOrElse("hdfs-default")
      val depths = (1 to batches).map(_ * rowsPerBatch)
      // Locale.ROOT: comma-decimal JVM locales would break the JSON
      def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      s""""$name":{"per_batch_s":[${perBatch.map(d3).mkString(",")}],
         |"depths":[${depths.mkString(",")}],
         |"drain_s":${d3(drain)}}""".stripMargin.replaceAll("\n", "")
    }

    // rep index in the key: reps > 1 would otherwise emit duplicate
    // "hdfs-default"/"rocksdb" keys in one object, and standard JSON
    // parsers silently keep only the LAST rep
    val lines = (1 to reps).flatMap { rep =>
      val tag = if (reps == 1) "" else s"_rep$rep"
      Seq(run(None), run(Some(RocksDB))).map(_.replaceFirst("\":", s"$tag\":"))
    }
    println(lines.mkString("{", ",",
      s""","batches":$batches,"rows_per_batch":$rowsPerBatch}"""))
  }
}
