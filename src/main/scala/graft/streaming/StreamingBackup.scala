package graft.streaming

import graft.backup.BackupEngine
import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.SerializableConfiguration

import java.io.{BufferedOutputStream, BufferedReader, InputStreamReader, OutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Structured Streaming backup: Kafka (or any record stream) -> time-sliced
  * JSON-array objects, with the reference's resume semantics:
  *
  *  - ChronoUnitSlice: a restart APPENDS to the in-flight slice object
  *    (reference TimeConfiguration.scala:16-23, BackupClientInterface
  *    R1-R5 resume machinery — subsumed here by merge-on-write + the SS
  *    checkpoint).
  *  - PeriodFromFirst: windows anchor at the first record seen by THIS
  *    run; a restart starts a new file (reference
  *    TimeConfiguration.scala:9-14 "Suspending/resuming the backup client
  *    will always create a new object").
  *
  * Delivery: at-least-once from the checkpoint (same as the reference's
  * commit-after-upload), upgraded to effective exactly-once by the
  * offset-replay filter on append — records at or below the slice's
  * already-written max offset per (topic, partition) are dropped, the
  * reference's replay-suppression semantics
  * (MockedKafkaConsumerInterface.scala:77-94, P6).
  */
object StreamingBackup {

  /** S1/S2: Kafka committable source + ingest projection as one stream. */
  def fromKafka(spark: SparkSession, bootstrapServers: String, topics: Set[String]): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .load()
      .select(
        col("topic"),
        col("partition"),
        col("offset"),
        base64(col("key")).as("key"),
        base64(col("value")).as("value"),
        unix_millis(col("timestamp")).as("timestamp"),
        col("timestampType").as("timestamp_type"))

  /** Start the streaming backup over a wire-named record stream. */
  def start(
      records: DataFrame,
      outDir: String,
      timeConf: TimeConfiguration,
      checkpointDir: String,
      compression: Option[CompressionType] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery = {
    // PeriodFromFirst: anchor = first record timestamp of THIS RUN
    // (driver-side state; deliberately NOT checkpointed — restart cuts a
    // new file, mirroring the reference's non-resumable mode)
    var runAnchor: Option[Long] = None
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val conf = timeConf match {
          case p: PeriodFromFirst =>
            if (runAnchor.isEmpty) {
              val m = batch.agg(min("timestamp")).head()
              if (!m.isNullAt(0)) runAnchor = Some(m.getLong(0))
            }
            runAnchor match {
              case Some(a) => AnchoredPeriod(a, p.durationMillis)
              case None    => p
            }
          case c => c
        }
        appendBatch(batch.toDF(), outDir, conf, compression)
        ()
      }
      .start()
  }

  /** Write one micro-batch: group records into slices and merge each
    * slice into its (possibly existing) object. Same shuffle shape as the
    * batch writer — one repartition on the slice key, slices in parallel.
    */
  def appendBatch(
      batch: DataFrame,
      outDir: String,
      timeConf: TimeConfiguration,
      compression: Option[CompressionType]
  ): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val (sliced, keyConf) = timeConf match {
      case AnchoredPeriod(anchor, ms) =>
        (batch.withColumn("slice_start",
          (lit(anchor) + floor((col("timestamp") - lit(anchor)) / lit(ms)) * lit(ms)).cast("long")),
          PeriodFromFirst(ms))
      case c =>
        (BackupEngine.withSliceStart(batch, c), c)
    }
    val hconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val gz = compression.contains(Gzip)
    val out = outDir
    val comp = compression
    import spark.implicits._
    sliced
      .withColumn("json", ReducedConsumerRecord.toJsonColumn)
      .select(col("slice_start"), col("topic"), col("partition"), col("offset"), col("json"))
      .repartition(col("slice_start"))
      .sortWithinPartitions(col("slice_start"), col("topic"), col("partition"), col("offset"))
      .mapPartitions { rows =>
        val fs = FileSystem.get(new java.net.URI(out), hconf.value)
        val grouped = new Iterator[(Long, Seq[(String, Int, Long, String)])] {
          val buf = rows.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Seq[(String, Int, Long, String)]) = {
            val slice = buf.head.getLong(0)
            val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, String)]
            while (buf.hasNext && buf.head.getLong(0) == slice) {
              val r = buf.next()
              acc += ((r.getString(1), r.getInt(2), r.getLong(3), r.getString(4)))
            }
            (slice, acc.toSeq)
          }
        }
        grouped.map { case (slice, recs) =>
          mergeSlice(fs, out, slice, recs, keyConf, comp, gz)
        }
      }
      .collect()
    ()
  }

  /** Merge records into the slice object: copy the existing array body
    * verbatim (minus the closing bracket), drop replayed records (offset
    * <= existing max per topic/partition), append the rest, atomic
    * rename. Keeps the reference's one-JSON-array-per-slice contract.
    */
  private def mergeSlice(
      fs: FileSystem,
      outDir: String,
      sliceStart: Long,
      recs: Seq[(String, Int, Long, String)],
      keyConf: TimeConfiguration,
      compression: Option[CompressionType],
      gz: Boolean
  ): (String, Long) = {
    // R5 compression-change policy (BackupClientInterface.scala:321-357):
    // an in-flight slice keeps its ORIGINAL codec; the new setting only
    // applies from the next slice. If the same slice already exists under
    // the other codec's key, keep appending to that object.
    val ts = BackupKey.ofEpochMillis(sliceStart)
    val wanted = BackupKey.calculateKey(ts, keyConf, compression)
    val other = BackupKey.calculateKey(ts, keyConf,
      if (compression.isEmpty) Some(Gzip) else None)
    val (key, gz0) =
      if (!fs.exists(BackupKey.resolve(outDir, wanted)) &&
        fs.exists(BackupKey.resolve(outDir, other)))
        (other, !gz)
      else (wanted, gz)
    val finalPath = BackupKey.resolve(outDir, key)
    val tmpPath = BackupKey.resolve(outDir, s"_tmp_$key")
    val exists = fs.exists(finalPath)

    var existingBody: String = null // array text minus the closing ']'
    val maxOffsets = scala.collection.mutable.Map.empty[(String, Int), Long]
    if (exists) {
      val rawIn = fs.open(finalPath)
      val in = if (gz0) new GZIPInputStream(rawIn) else rawIn
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val sb = new StringBuilder
      val arr = new Array[Char](1 << 16)
      var n = reader.read(arr)
      while (n > 0) { sb.appendAll(arr, 0, n); n = reader.read(arr) }
      reader.close()
      val text = sb.toString()
      existingBody = text.substring(0, text.lastIndexOf(']'))
      // max offset per (topic, partition) from the existing object
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tree = mapper.readTree(text)
      val it = tree.elements()
      while (it.hasNext) {
        val node = it.next()
        if (node != null && !node.isNull) {
          val k = (node.get("topic").asText(), node.get("partition").asInt())
          val off = node.get("offset").asLong()
          if (maxOffsets.getOrElse(k, Long.MinValue) < off) maxOffsets(k) = off
        }
      }
    }

    val fresh = recs.filter { case (t, p, o, _) =>
      maxOffsets.getOrElse((t, p), Long.MinValue) < o
    }
    if (exists && fresh.isEmpty) return (key, 0L)

    val raw: OutputStream = fs.create(tmpPath, true)
    val os: OutputStream =
      if (gz0) new GZIPOutputStream(new BufferedOutputStream(raw, 1 << 16))
      else new BufferedOutputStream(raw, 1 << 16)
    val w = new OutputStreamWriter(os, StandardCharsets.UTF_8)
    var written = 0L
    if (exists) {
      w.write(existingBody)
      fresh.foreach { case (_, _, _, json) => w.write(","); w.write(json); written += 1 }
    } else {
      w.write("[")
      var first = true
      fresh.foreach { case (_, _, _, json) =>
        if (!first) w.write(",")
        w.write(json); first = false; written += 1
      }
    }
    w.write("]")
    w.close()
    if (!fs.rename(tmpPath, finalPath)) {
      fs.delete(finalPath, false)
      fs.rename(tmpPath, finalPath)
    }
    (key, written)
  }
}
