package graft

import graft.backup.BackupEngine
import graft.model._
import graft.streaming.StreamingRestore

import java.time.temporal.ChronoUnit

/** Streaming-restore properties: incremental object discovery (new slice
  * objects picked up by later micro-batches, processed ones never
  * re-read), mixed plain/.gz decode, `null`-terminator tolerance, and
  * the record-level filters/rename shared with the batch path.
  */
class StreamingRestoreSpec extends SparkSuite {
  import spark.implicits._

  private val base = 1700000000000L

  private def recs(offsets: Range, topic: String = "t1") =
    offsets.map { i =>
      ReducedConsumerRecord(topic, 0, i.toLong, Some("a2V5"),
        java.util.Base64.getEncoder.encodeToString(s"v$i".getBytes),
        base + i * 1000L, 0)
    }

  private def wire(rs: Seq[ReducedConsumerRecord]) =
    spark.createDataset(rs).toDF().withColumnRenamed("timestampType", "timestamp_type")

  test("new slice objects are discovered incrementally, old ones not re-read") {
    val dir = tmpDir("sr-dir"); val out = tmpDir("sr-out"); val ckpt = tmpDir("sr-ckpt")
    BackupEngine.backupBatch(wire(recs(0 until 30)), dir,
      ChronoUnitSlice(ChronoUnit.HOURS))
    val q1 = StreamingRestore.toParquet(
      StreamingRestore.stream(spark, dir), out, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 30)
    // a later backup run lays down the NEXT hour's object
    BackupEngine.backupBatch(wire(recs(3600 until 3620)), dir,
      ChronoUnitSlice(ChronoUnit.HOURS))
    val q2 = StreamingRestore.toParquet(
      StreamingRestore.stream(spark, dir), out, ckpt)
    q2.processAllAvailable(); q2.stop()
    val offs = spark.read.parquet(out).select("offset").as[Long].collect().sorted
    assert(offs.length == 50, "second run must add only the new object's records")
    assert(offs.toSeq == ((0L until 30L) ++ (3600L until 3620L)))
  }

  test("an unparseable slice object fails the restore loudly, naming the file") {
    val dir = tmpDir("sr-corrupt")
    BackupEngine.backupBatch(wire(recs(0 until 5)), dir,
      ChronoUnitSlice(ChronoUnit.HOURS))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val bad = graft.model.BackupKey.resolve(dir, "2030-01-01T00:00:00Z.json")
    val os = fs.create(bad, true)
    os.write("""[{"topic":"t1","partition":0,"off""".getBytes("UTF-8")) // truncated
    os.close()
    val e = intercept[Exception] {
      graft.restore.RestoreEngine.restore(spark, dir, Set("t1")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("corrupt backup object") && m.contains("2030-01-01T00")),
      s"expected loud corrupt-object failure, got: ${messages(e)}")
  }

  test("mixed plain and gz objects decode; null terminator tolerated; filters apply") {
    val dir = tmpDir("sr-mixed"); val out = tmpDir("sr-mixed-out")
    BackupEngine.backupBatch(wire(recs(0 until 10)), dir,
      ChronoUnitSlice(ChronoUnit.HOURS))
    BackupEngine.backupBatch(wire(recs(3600 until 3610, topic = "t2")), dir,
      ChronoUnitSlice(ChronoUnit.HOURS), compression = Some(Gzip))
    // a reference-style terminated-early object: trailing null element
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val term = new org.apache.hadoop.fs.Path(dir, "2000-01-01T00_legacy.json")
    val os = fs.create(term, true)
    os.write(
      """[{"topic":"t1","partition":0,"offset":999,"key":"a2V5","value":"dg==","timestamp":1700000000000,"timestamp_type":0},null]"""
        .getBytes("UTF-8"))
    os.close()
    val q = StreamingRestore.toParquet(
      StreamingRestore.stream(spark, dir,
        topics = Set("t1", "t2"),
        overrideTopics = Map("t2" -> "t2-replayed")),
      out, tmpDir("sr-mixed-ckpt"))
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 21) // 10 + 10 + the record before the null
    assert(rows.filter($"topic" === "t2-replayed").count() == 10)
    assert(rows.filter($"topic" === "t2").count() == 0)
    assert(rows.filter($"offset" === 999).count() == 1)
  }
}
