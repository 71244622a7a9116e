package graft

import graft.model._
import graft.restore.RestoreEngine
import graft.streaming.StreamingBackup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.time.temporal.ChronoUnit

/** Structured Streaming backup properties: micro-batch append semantics,
  * restart resume (ChronoUnitSlice appends to the in-flight object;
  * reference RealS3BackupClientTest.scala:296-379), replay suppression,
  * and compression-change-on-restart
  * (ConfigurationChangeRestartSpec.scala:53-180).
  */
class StreamingBackupSpec extends SparkSuite {
  import spark.implicits._

  private def rec(offset: Long, tsMs: Long, topic: String = "t1") =
    ReducedConsumerRecord(topic, 0, offset, Some("a2V5"),
      java.util.Base64.getEncoder.encodeToString(s"v$offset".getBytes), tsMs, 0)

  private def wire(rs: Seq[ReducedConsumerRecord]) =
    spark.createDataset(rs).toDF().withColumnRenamed("timestampType", "timestamp_type")

  private def runBatches(
      dir: String, ckpt: String, conf: TimeConfiguration,
      compression: Option[CompressionType], batches: Seq[Seq[ReducedConsumerRecord]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ReducedConsumerRecord]
    val stream = mem.toDF().withColumnRenamed("timestampType", "timestamp_type")
    val q = StreamingBackup.start(stream, dir, conf, ckpt, compression)
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
  }

  private val base = 1700000000000L // 2023-11-14T22:13:20Z

  test("streaming ChronoUnitSlice: batches append to the in-flight slice object") {
    val dir = tmpDir("sb-slice"); val ckpt = tmpDir("sb-slice-ckpt")
    val b1 = (0L until 40L).map(i => rec(i, base + i * 1000))         // ~40s span
    val b2 = (40L until 80L).map(i => rec(i, base + i * 1000))        // same hour
    runBatches(dir, ckpt, ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b1, b2))
    val keys = RestoreEngine.listKeys(spark, dir)
    assert(keys.size == 1, s"expected one in-flight hour object, got $keys")
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 80)
    // offset order preserved inside the merged object
    val offs = restored.orderBy("offset").select("offset").as[Long].collect()
    assert(offs.toSeq == (0L until 80L))
  }

  test("streaming restart with same checkpoint dir appends, replayed records dropped") {
    val dir = tmpDir("sb-resume"); val ckpt = tmpDir("sb-resume-ckpt")
    val b1 = (0L until 30L).map(i => rec(i, base + i * 1000))
    runBatches(dir, ckpt, ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b1))
    // "restart": new query, fresh checkpoint, source replays 0..29 plus new 30..59
    val ckpt2 = tmpDir("sb-resume-ckpt2")
    val b2 = (0L until 60L).map(i => rec(i, base + i * 1000))
    runBatches(dir, ckpt2, ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b2))
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 60, "replayed records must be deduplicated")
    assert(RestoreEngine.listKeys(spark, dir).size == 1)
  }

  test("replay dedup survives a missing/stale offsets sidecar (fallback scan)") {
    val dir = tmpDir("sb-sidecar"); val ckpt = tmpDir("sb-sidecar-ckpt")
    val b1 = (0L until 30L).map(i => rec(i, base + i * 1000))
    runBatches(dir, ckpt, ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b1))
    // simulate a crash between the object and sidecar renames: delete the
    // sidecar so the merge must streaming-scan the object for max offsets
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val sidecars = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("_offsets_"))
    assert(sidecars.nonEmpty, "merge should have written an offsets sidecar")
    sidecars.foreach(p => fs.delete(p, false))
    val b2 = (0L until 60L).map(i => rec(i, base + i * 1000)) // full replay + new
    runBatches(dir, tmpDir("sb-sidecar-ckpt2"), ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b2))
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 60, "fallback scan must still drop replayed records")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).count(_.startsWith("_offsets_")) == 1,
      "sidecar should be rewritten after the merge")
  }

  test("late records merge into their own (older) slice object") {
    // deliberate divergence from the reference (README design decisions):
    // window assignment is by event time, so a late record lands in its
    // CORRECT older slice, not the currently-open file
    val dir = tmpDir("sb-late"); val ckpt = tmpDir("sb-late-ckpt")
    val hourMs = 3600000L
    val b1 = (0L until 10L).map(i => rec(i, base + i * 1000)) ++
      (100L until 110L).map(i => rec(i, base + hourMs + (i - 100) * 1000))
    runBatches(dir, ckpt, ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(b1))
    assert(RestoreEngine.listKeys(spark, dir).size == 2)
    // a later batch carries a record whose event time is in the FIRST hour
    val late = Seq(rec(200, base + 30 * 1000))
    runBatches(dir, tmpDir("sb-late-ckpt2"), ChronoUnitSlice(ChronoUnit.HOURS), None, Seq(late))
    assert(RestoreEngine.listKeys(spark, dir).size == 2, "no third object for late data")
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 21)
    val firstSliceKey = RestoreEngine.listKeys(spark, dir)
      .sortBy(graft.model.BackupKey.keyToOffsetDateTime).head
    val firstSlice = RestoreEngine.readObjects(spark, dir, Seq(firstSliceKey))
    assert(firstSlice.count() == 11, "late record must merge into the older slice")
  }

  test("merge keeps a valid array when trailing whitespace after ] spans a 64 KiB chunk") {
    // externally-formatted object: closing bracket followed by more
    // whitespace than one copy chunk — the bracket must still be dropped
    // from the copied body (previously it leaked when the final chunk was
    // whitespace-only, corrupting the merged array)
    val dir = tmpDir("sb-wschunk")
    val key = BackupKey.calculateKey(
      BackupKey.ofEpochMillis((base / 3600000L) * 3600000L),
      ChronoUnitSlice(ChronoUnit.HOURS), None)
    val body =
      """[{"topic":"t1","partition":0,"offset":0,"key":null,"value":"dg==","timestamp":""" +
        base + ""","timestamp_type":0}]""" + (" " * ((1 << 16) + 5000)) + "\n"
    java.nio.file.Files.writeString(new java.io.File(dir, key).toPath, body)
    // no sidecar → merge falls back to scanning the object, then appends
    runBatches(dir, tmpDir("sb-wschunk-ckpt"), ChronoUnitSlice(ChronoUnit.HOURS), None,
      Seq(Seq(rec(1, base + 1000))))
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 2, "merged object must stay a valid JSON array")
    assert(restored.orderBy("offset").select("offset").as[Long].collect().toSeq == Seq(0L, 1L))
  }

  test("streaming PeriodFromFirst: anchor from this run's first record") {
    val dir = tmpDir("sb-period"); val ckpt = tmpDir("sb-period-ckpt")
    val b1 = (0L until 10L).map(i => rec(i, base + i * 100))
    val b2 = (10L until 20L).map(i => rec(i, base + 700 + (i - 10) * 100)) // crosses 700ms period
    runBatches(dir, ckpt, PeriodFromFirst(700L), None, Seq(b1, b2))
    val keys = RestoreEngine.listKeys(spark, dir).sorted
    assert(keys.size >= 2, s"period rollover should cut a second object: $keys")
    assert(RestoreEngine.restore(spark, dir, Set("t1")).count() == 20)
  }

  test("compression change on restart: in-flight slice keeps old codec, new slice uses new") {
    val dir = tmpDir("sb-codec");
    // run 1: plain, one in-flight hour
    runBatches(dir, tmpDir("c1"), ChronoUnitSlice(ChronoUnit.HOURS), None,
      Seq((0L until 20L).map(i => rec(i, base + i * 1000))))
    // run 2: gzip config; same hour continues + next hour starts
    val nextHour = (base / 3600000L + 1) * 3600000L
    runBatches(dir, tmpDir("c2"), ChronoUnitSlice(ChronoUnit.HOURS), Some(Gzip),
      Seq((20L until 30L).map(i => rec(i, base + i * 1000)) ++
        (30L until 40L).map(i => rec(i, nextHour + (i - 30) * 1000))))
    val keys = RestoreEngine.listKeys(spark, dir).sorted
    assert(keys.exists(k => k.endsWith(".json")), s"old slice should stay plain: $keys")
    assert(keys.exists(_.endsWith(".json.gz")), s"new slice should be gzip: $keys")
    assert(keys.size == 2)
    val restored = RestoreEngine.restore(spark, dir, Set("t1"))
    assert(restored.count() == 40)
    // merged-content equality across the codec change, not just counts
    // (reference ConfigurationChangeRestartSpec.scala:53-180: the
    // restored stream must equal the full input regardless of which
    // codec each slice ended up with)
    val expected = ((0L until 30L).map(i => rec(i, base + i * 1000)) ++
      (30L until 40L).map(i => rec(i, nextHour + (i - 30) * 1000)))
      .map(r => (r.topic, r.partition, r.offset, r.key, r.value, r.timestamp)).sorted
    val got = restored
      .select("topic", "partition", "offset", "key", "value", "timestamp")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.getString(3)), r.getString(4), r.getLong(5))).toSeq.sorted
    assert(got == expected, "restored content diverged from the input across the codec change")
  }
}
