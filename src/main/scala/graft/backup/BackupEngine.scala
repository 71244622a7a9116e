package graft.backup

import graft.model._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import java.io.{BufferedOutputStream, OutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.temporal.ChronoUnit
import java.util.zip.{Deflater, GZIPOutputStream}

/** Batch backup: records -> time-sliced JSON-array objects.
  *
  * Re-expresses the reference's backup pipeline (core-backup/.../
  * BackupClientInterface.scala:416-501) Spark-first: window assignment is a
  * declarative column (`date_trunc` for ChronoUnitSlice; floor-div from a
  * min-anchor for PeriodFromFirst), boundary detection is implicit in the
  * `repartition(sliceKey)` + per-partition grouping, and the reference's
  * ~200 LoC of multipart-resume machinery (R1-R5) is replaced by atomic
  * write-then-rename per object.
  *
  * File contract kept compatible with the reference (SURVEY §1.2): each
  * object is ONE JSON array of wire-named records, offset-ordered, named
  * `<ISO_OFFSET_DATE_TIME>.json[.gz]`. Readers must tolerate a trailing
  * `null` element (the reference's terminated-early marker); this writer
  * never produces one because writes are atomic.
  *
  * Scale notes: slices write in parallel (one task per slice — the
  * reference serialized them, mergeSubstreamsWithParallelism(1)); the sort
  * is within-partition only (no global sort / no extra shuffle beyond the
  * one repartition on the slice key).
  */
object BackupEngine {

  /** ChronoUnitSlice window key (calendar-aligned truncation, W2). */
  def chronoSliceCol(tsMillis: Column, unit: ChronoUnit): Column = {
    val trunc = unit match {
      case ChronoUnit.HOURS  => "hour"
      case ChronoUnit.DAYS   => "day"
      case ChronoUnit.MINUTES => "minute"
      case ChronoUnit.SECONDS => "second"
      case u => throw new IllegalArgumentException(s"unsupported slice unit $u")
    }
    unix_millis(date_trunc(trunc, timestamp_millis(tsMillis)))
  }

  /** PeriodFromFirst period number: floor((ts - anchor) / period) (W1+W2).
    * Batch two-pass: anchor = global min timestamp, broadcast by Catalyst
    * (scalar subquery -> broadcast, no shuffle of the fact side).
    */
  def withPeriodFromFirst(records: DataFrame, durationMillis: Long): DataFrame = {
    val anchor = records.agg(min(col("timestamp")).as("anchor"))
    records.crossJoin(broadcast(anchor))
      .withColumn("period", floor((col("timestamp") - col("anchor")) / lit(durationMillis)))
      .drop("anchor")
  }

  /** Add the slice start (epoch millis) used for the object key. */
  def withSliceStart(records: DataFrame, timeConf: TimeConfiguration): DataFrame =
    timeConf match {
      case ChronoUnitSlice(unit) =>
        records.withColumn("slice_start", chronoSliceCol(col("timestamp"), unit))
      case PeriodFromFirst(ms) =>
        val anchor = records.agg(min(col("timestamp")).as("anchor"))
        records.crossJoin(broadcast(anchor))
          .withColumn("slice_start",
            (col("anchor") + floor((col("timestamp") - col("anchor")) / lit(ms)) * lit(ms)).cast(LongType))
          .drop("anchor")
    }

  /** Write one JSON-array object per time slice under `outDir`.
    *
    * @param records wire-named DataFrame (topic/partition/offset/key/value/
    *                timestamp/timestamp_type)
    * @return keys written (relative to outDir), with record counts
    */
  def backupBatch(
      records: DataFrame,
      outDir: String,
      timeConf: TimeConfiguration,
      compression: Option[CompressionType] = None,
      compressionLevel: Option[Int] = None
  ): Seq[(String, Long)] = {
    val spark = records.sparkSession
    val sliced = withSliceStart(records, timeConf)
      .withColumn("json", ReducedConsumerRecord.toJsonColumn)
      .select(col("slice_start"), col("partition"), col("offset"), col("json"))

    val hconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val gz = compression.contains(Gzip)
    val level = compressionLevel.getOrElse(Deflater.DEFAULT_COMPRESSION)
    val conf = timeConf
    val out = outDir

    // refuse-to-overwrite is a JOB-level decision, made once on the
    // driver BEFORE any task runs: this job's slice keys must not collide
    // with objects already in the dir (disjoint-slice incremental backups
    // into one dir stay legal — the reference keeps adding objects to the
    // same bucket; overlapping slices need the streaming backup's
    // merge-append). Inside tasks an existing object can then only mean
    // "an earlier attempt of THIS job already committed it" and is
    // skipped idempotently — a per-slice throw would make any task retry
    // after a partial commit fail permanently.
    {
      val fs = FileSystem.get(new java.net.URI(out), hconf.value)
      val dirPath = new Path(out)
      if (fs.exists(dirPath)) {
        val existing = fs.listStatus(dirPath).filter(_.isFile)
          .map(_.getPath.getName)
          .filter(n => (n.endsWith(".json") || n.endsWith(".json.gz")) && !n.startsWith("_"))
          .toSet
        if (existing.nonEmpty) {
          // distinct slice keys are metadata-scale (one per object):
          // partial-aggregated before collect
          val colliding = sliced.select(col("slice_start")).distinct()
            .collect().map(_.getLong(0))
            .map(s => BackupKey.calculateKey(BackupKey.ofEpochMillis(s), conf, compression))
            .filter(existing.contains)
          if (colliding.nonEmpty)
            throw new IllegalStateException(
              s"backup: $out already contains ${colliding.length} of this job's " +
                s"slice object(s) (e.g. ${colliding.head}) — batch backup refuses " +
                "to overwrite prior output (use the streaming backup for append/resume)")
        }
      }
    }

    import spark.implicits._
    // One shuffle, keyed by slice; offset order restored within partition.
    // Each task may own several slices (hash collisions) — the sort makes
    // them consecutive so we stream slice-by-slice with O(1) memory.
    val written = sliced
      .repartition(col("slice_start"))
      .sortWithinPartitions(col("slice_start"), col("partition"), col("offset"))
      .mapPartitions { rows =>
        val fs = FileSystem.get(new java.net.URI(out), hconf.value)
        // tmp names must be attempt-unique: with task retries or
        // speculation two attempts of this partition run concurrently,
        // and a shared tmp path would let one attempt rename a file the
        // other is still writing
        val attemptId =
          Option(org.apache.spark.TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val results = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var curSlice: Long = Long.MinValue
        var writer: OutputStreamWriter = null
        var skipping = false
        var tmpPath: Path = null
        var finalPath: Path = null
        var nRecs = 0L
        def finishSlice(): Unit = {
          if (writer != null) {
            writer.write("]")
            writer.close()
            if (!fs.rename(tmpPath, finalPath)) {
              // another attempt of this same partition already committed
              // the (identical) object — drop ours; anything else errors
              if (fs.exists(finalPath)) fs.delete(tmpPath, false)
              else throw new java.io.IOException(
                s"backup: rename $tmpPath -> $finalPath failed")
            }
            results += ((finalPath.getName, nRecs))
            writer = null
          } else if (skipping) {
            results += ((finalPath.getName, nRecs))
            skipping = false
          }
        }
        def open(slice: Long): Unit = {
          val key = BackupKey.calculateKey(BackupKey.ofEpochMillis(slice), conf, compression)
          finalPath = BackupKey.resolve(out, key)
          nRecs = 0L
          if (fs.exists(finalPath)) {
            // the driver verified the out dir was empty at job start, so
            // this object was committed by an earlier attempt of THIS
            // partition (same sorted input => identical content): count
            // the rows but skip the write — retries stay idempotent
            skipping = true
            writer = null
          } else {
            tmpPath = BackupKey.resolve(out, s"_tmp_${attemptId}_$key")
            val raw: OutputStream = fs.create(tmpPath, true)
            val os: OutputStream =
              if (gz) new GZIPOutputStream(new BufferedOutputStream(raw, 1 << 16)) {
                `def`.setLevel(level)
              }
              else new BufferedOutputStream(raw, 1 << 16)
            writer = new OutputStreamWriter(os, StandardCharsets.UTF_8)
            writer.write("[")
          }
        }
        new Iterator[(String, Long)] {
          private var done = false
          private def advance(): Unit = {
            while (rows.hasNext && results.isEmpty) {
              val r = rows.next()
              val slice = r.getLong(0)
              if (slice != curSlice) {
                finishSlice(); open(slice); curSlice = slice
              }
              if (writer != null) {
                if (nRecs > 0) writer.write(",")
                writer.write(r.getString(3))
              }
              nRecs += 1
            }
            if (!rows.hasNext && !done) { finishSlice(); done = true }
          }
          def hasNext: Boolean = { advance(); results.nonEmpty }
          def next(): (String, Long) = { advance(); results.remove(0) }
        }
      }
      .collect()
    written.toSeq.sortBy(_._1)
  }
}
