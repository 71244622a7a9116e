package graft.backup

import graft.model._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import java.io.{BufferedOutputStream, BufferedReader, OutputStream, OutputStreamWriter}
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

  /** Object key minus its format extension: collision checks must treat
    * `X.json` and `X.json.gz` as the same slice object — restore reads
    * both, so a gzip re-run over an uncompressed backup would silently
    * duplicate every record on restore if compared by full name.
    */
  private def baseKey(name: String): String =
    name.stripSuffix(".gz").stripSuffix(".json")

  /** Marker file recording which job most recently claimed `outDir` for a
    * batch backup. Tasks use it to tell "an earlier attempt of THIS job
    * committed this object" (safe idempotent skip) from "a concurrent job
    * is writing into the same dir" (loud failure, not silent data loss).
    */
  private val JobMarker = "_graft_backup_job"

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
      case AnchoredPeriod(anchor, ms) =>
        // streaming runs arrive with the anchor already resolved, so no
        // records-side aggregate — pure per-row algebra
        records.withColumn("slice_start",
          (lit(anchor) + floor((col("timestamp") - lit(anchor)) / lit(ms)) * lit(ms)).cast(LongType))
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
    val jid = java.util.UUID.randomUUID().toString

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
        val names = fs.listStatus(dirPath).filter(_.isFile).map(_.getPath.getName)
        // stale tmp files from failed/killed attempts of PRIOR jobs are
        // garbage nothing else will ever delete (attempt-unique names mean
        // retries never reuse them) — sweep them while we hold the listing
        names.filter(_.startsWith("_tmp_"))
          .foreach(n => fs.delete(BackupKey.resolve(out, n), false))
        // collision check is extension-blind: X.json and X.json.gz are the
        // same slice to restore, so a --gzip re-run over an uncompressed
        // backup must refuse just like a same-codec re-run would
        val existing = names
          .filter(n => (n.endsWith(".json") || n.endsWith(".json.gz")) && !n.startsWith("_"))
          .map(baseKey)
          .toSet
        if (existing.nonEmpty) {
          // distinct slice keys are metadata-scale (one per object):
          // partial-aggregated before collect
          val colliding = sliced.select(col("slice_start")).distinct()
            .collect().map(_.getLong(0))
            .map(s => BackupKey.calculateKey(BackupKey.ofEpochMillis(s), conf, compression))
            .filter(k => existing.contains(baseKey(k)))
          if (colliding.nonEmpty)
            throw new IllegalStateException(
              s"backup: $out already contains ${colliding.length} of this job's " +
                s"slice object(s) (e.g. ${colliding.head}, possibly under the other " +
                "compression's extension) — batch backup refuses to overwrite prior " +
                "output (use the streaming backup for append/resume)")
        }
      }
      // claim the dir for this job: tasks finding an already-committed
      // object trust the skip only if the marker still names this job
      val markerTmp = BackupKey.resolve(out, s"${JobMarker}_$jid")
      val mw = new OutputStreamWriter(fs.create(markerTmp, true), StandardCharsets.UTF_8)
      mw.write(jid); mw.close()
      val marker = BackupKey.resolve(out, JobMarker)
      if (!fs.rename(markerTmp, marker)) {
        fs.delete(marker, false)
        if (!fs.rename(markerTmp, marker))
          throw new java.io.IOException(s"backup: cannot write job marker $marker")
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
        def markerIsOurs(): Boolean =
          try {
            val in = new BufferedReader(new java.io.InputStreamReader(
              fs.open(BackupKey.resolve(out, JobMarker)), StandardCharsets.UTF_8))
            try in.readLine() == jid finally in.close()
          } catch { case _: Exception => false }
        def open(slice: Long): Unit = {
          val key = BackupKey.calculateKey(BackupKey.ofEpochMillis(slice), conf, compression)
          finalPath = BackupKey.resolve(out, key)
          // extension-blind existence check: the other codec's variant of
          // this slice is the same object to restore — an earlier attempt
          // of this job can't have written it (we only write `key`), so
          // finding one means another job is interleaved with ours
          val otherPath = BackupKey.resolve(out, BackupKey.calculateKey(
            BackupKey.ofEpochMillis(slice), conf,
            if (gz) None else Some(Gzip)))
          if (fs.exists(otherPath))
            throw new IllegalStateException(
              s"backup: found $otherPath (this job writes $key) — a concurrent " +
                "backup job with different compression is writing into the same dir")
          nRecs = 0L
          if (fs.exists(finalPath)) {
            // the driver verified no slice of ours pre-existed at job
            // start, so normally this object was committed by an earlier
            // attempt of THIS partition (same sorted input => identical
            // content) and the write can be skipped idempotently. But if
            // the dir's job marker no longer names this job, a concurrent
            // backup claimed the dir after we started — its object need
            // not contain OUR records, so a silent skip would be silent
            // data loss: fail loudly instead.
            if (!markerIsOurs())
              throw new IllegalStateException(
                s"backup: $finalPath exists but $out's job marker no longer names " +
                  "this job — a concurrent backup job is writing into the same dir")
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"backup: skipping $finalPath — already committed by an earlier attempt of this job")
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
