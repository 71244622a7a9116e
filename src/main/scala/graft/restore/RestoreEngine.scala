package graft.restore

import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.OffsetDateTime

/** Batch restore: time-sliced JSON-array objects -> records (optionally to
  * a Kafka sink).
  *
  * Re-expresses the reference's restore pipeline (core-restore/.../
  * RestoreClientInterface.scala:104-123): key listing + time sort (O1),
  * `fromWhen` key prefilter with the straddling-file rule (P4,
  * RestoreClientInterface.scala:50-81), JSON-array decode tolerating the
  * trailing `null` terminator (S7), topic-membership + event-time filters
  * (P1/P2), topic rename (P5), and replay ordering (O2).
  *
  * Scale notes: the key prefilter is the partition-pruning analog — files
  * wholly before `fromWhen` are never opened; the per-record filters are
  * Catalyst `Filter`s pushed into the JSON scan; files read in parallel.
  */
object RestoreEngine {

  /** S6: storage accessibility probe — bucket/prefix reachable before a
    * job is submitted (compaction-s3/.../StorageClient.scala:44-52).
    */
  def storageAccessible(spark: SparkSession, dir: String): Boolean =
    try {
      val path = new Path(dir)
      FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration).exists(path)
    } catch { case _: Exception => false }

  /** List backup object keys (file names) under `dir`, unsorted. */
  def listKeys(spark: SparkSession, dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else
      fs.listStatus(path).toSeq
        .filter(_.isFile)
        .map(_.getPath.getName)
        .filter(n => (n.endsWith(".json") || n.endsWith(".json.gz")) && !n.startsWith("_"))
  }

  /** Reference `finalKeys` semantics (RestoreClientInterface.scala:50-81):
    * sort keys by their embedded timestamp; find the first key at/after
    * `fromWhen`; keep from ONE BEFORE it (that file may straddle the
    * cutoff). No match (-1) -> only the last file; match at 0 -> all.
    */
  def finalKeys(keys: Seq[String], fromWhen: Option[OffsetDateTime]): Seq[String] = {
    val sorted = keys.sortBy(BackupKey.keyToOffsetDateTime)
    fromWhen match {
      case None => sorted
      case Some(t) =>
        sorted.indexWhere(k => !BackupKey.keyToOffsetDateTime(k).isBefore(t)) match {
          case -1 => sorted.takeRight(1)
          case 0  => sorted
          case i  => sorted.drop(i - 1)
        }
    }
  }

  /** Read the given backup objects as wire-named records.
    * Tolerates the reference's trailing `null` element and `.gz` objects.
    */
  def readObjects(spark: SparkSession, dir: String, keys: Seq[String]): DataFrame = {
    if (keys.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ReducedConsumerRecord.jsonSchema)
    val paths = keys.map(k => BackupKey.resolve(dir, k).toString)
    // One JSON array per object. Spark's multiLine JSON reader treats a
    // `null` array element (the reference's terminated-early marker) as a
    // whole-file corrupt record, so decode via wholetext + from_json +
    // explode instead — a null element becomes an all-null row we drop.
    // gz objects are decompressed by extension by the text source.
    decodeObjects(spark.read.option("wholetext", "true").text(paths: _*))
  }

  /** Shared array-decode: tolerate the `null` terminator, but FAIL LOUDLY
    * on an unparseable object (the reference's jawn decoder errors the
    * stream; silently restoring zero rows from a corrupt file would be
    * data loss). explode_outer keeps one row for a failed parse so the
    * raise_error check is reachable; `input_file_name` names the culprit.
    */
  private[graft] def decodeObjects(raw: DataFrame): DataFrame =
    raw
      .select(
        input_file_name().as("_file"),
        col("value"),
        from_json(col("value"),
          org.apache.spark.sql.types.ArrayType(ReducedConsumerRecord.jsonSchema)).as("arr"))
      .select(explode_outer(col("arr")).as("r"),
        when(col("arr").isNull && length(trim(col("value"))) > 0,
          raise_error(concat(lit("corrupt backup object (unparseable JSON array): "),
            col("_file"))))
          .as("_chk"))
      .filter(col("_chk").isNull)
      .select(col("r.*"))
      .filter(col("topic").isNotNull) // drop the `null` terminator element

  /** Full restore: list -> prefilter keys -> read -> record filters -> rename. */
  def restore(
      spark: SparkSession,
      dir: String,
      topics: Set[String],
      fromWhen: Option[OffsetDateTime] = None,
      overrideTopics: Map[String, String] = Map.empty
  ): DataFrame = {
    val keys = finalKeys(listKeys(spark, dir), fromWhen)
    var df = readObjects(spark, dir, keys)
    if (topics.nonEmpty) df = df.filter(col("topic").isin(topics.toSeq: _*))
    fromWhen.foreach { t =>
      df = df.filter(col("timestamp") >= lit(t.toInstant.toEpochMilli))
    }
    if (overrideTopics.nonEmpty) {
      val renamed = overrideTopics.foldLeft(col("topic")) { case (acc, (from, to)) =>
        when(col("topic") === lit(from), lit(to)).otherwise(acc)
      }
      df = df.withColumn("topic", renamed)
    }
    df
  }

  /** Kafka replay projection (K5/K6): Base64-decode payloads, per-partition
    * offset order preserved via repartition+sort (single in-flight request
    * and idempotence are producer options the caller sets on write).
    */
  def toKafkaFrame(records: DataFrame): DataFrame =
    records
      .repartition(col("topic"), col("partition"))
      .sortWithinPartitions(col("topic"), col("partition"), col("offset"))
      .select(
        col("topic"),
        unbase64(col("key")).as("key"),
        unbase64(col("value")).as("value")
      )

  /** Write to Kafka with the reference's `--single-message-per-kafka-request`
    * producer options (cli-restore/.../Main.scala:101-142): idempotence on,
    * one in-flight request. Task retries can still re-produce a partition's
    * records (no producer transaction spans the job), so delivery is
    * at-least-once under failure — same as the reference's restore, whose
    * producer idempotence also only covers broker-level retries.
    */
  def writeToKafka(records: DataFrame, bootstrapServers: String, idempotentProducer: Boolean = false): Unit = {
    var w = toKafkaFrame(records).write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
    if (idempotentProducer)
      w = w.option("kafka.enable.idempotence", "true")
        .option("kafka.max.in.flight.requests.per.connection", "1")
    w.save()
  }
}
