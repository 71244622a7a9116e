package graft.queries

import graft.backup.BackupEngine
import graft.model._
import graft.restore.RestoreEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.temporal.ChronoUnit

/** The reference's operator surface (SURVEY §2) as verifiable queries over
  * the harness `events` table, each paired with a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  */
object GuardianQueries {

  /** Shared DuckDB fragment: the ingest projection (S2) as SQL. */
  val recordsCte: String =
    """WITH records AS (
      |  SELECT 'events' AS topic,
      |         CAST(user_id % 8 AS INT) AS "partition",
      |         CAST(row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) - 1 AS BIGINT) AS "offset",
      |         base64(encode(CAST(user_id AS VARCHAR))) AS key,
      |         base64(encode(props)) AS value,
      |         epoch_ms(ts) AS "timestamp",
      |         0 AS timestamp_type
      |  FROM events
      |)""".stripMargin

  def records(spark: SparkSession, dir: String): DataFrame =
    ReducedConsumerRecord.fromEvents(graft.model.Tables.pq(spark, dir, "events"))

  /** S1/S2: Kafka-shaped ingest projection (KafkaConsumer.scala:127-138). */
  def ingestProject(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir).orderBy("partition", "offset")

  /** W2 ChronoUnitSlice(HOURS): calendar-aligned window assignment +
    * per-slice stats (BackupClientInterface.scala:521-524).
    */
  def windowHour(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .withColumn("slice_ms", BackupEngine.chronoSliceCol(col("timestamp"), ChronoUnit.HOURS))
      .groupBy("slice_ms")
      .agg(
        count(lit(1)).as("n_records"),
        min("timestamp").as("min_ts"),
        max("timestamp").as("max_ts"))
      .orderBy("slice_ms")

  /** W1+W2 PeriodFromFirst: windows anchored at the first record's
    * timestamp (BackupClientInterface.scala:176-205, :551-563).
    */
  def windowPeriodFromFirst(spark: SparkSession, dir: String): DataFrame = {
    val periodMs = 6L * 3600 * 1000
    BackupEngine.withPeriodFromFirst(records(spark, dir), periodMs)
      .groupBy("period")
      .agg(
        count(lit(1)).as("n_records"),
        min("timestamp").as("min_ts"),
        max("timestamp").as("max_ts"))
      .orderBy("period")
  }

  /** W3 boundary detection: the reference's sliding-pair comparison
    * (isAtBoundary, BackupClientInterface.scala:543-549) re-expressed as a
    * lag window — emit one row per window-open event per partition.
    */
  def windowBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("partition").orderBy("offset")
    records(spark, dir)
      .withColumn("slice_ms", BackupEngine.chronoSliceCol(col("timestamp"), ChronoUnit.HOURS))
      .withColumn("prev_slice_ms", lag("slice_ms", 1).over(w))
      .filter(col("prev_slice_ms").isNull || col("slice_ms") > col("prev_slice_ms"))
      .select("partition", "offset", "slice_ms", "prev_slice_ms")
      .orderBy("partition", "offset")
  }

  /** P1+P2: restore record filters — topic membership + event-time lower
    * bound (RestoreClientInterface.scala:83-91). Cutoff = 2024-01-25T00:00Z.
    */
  val fromWhenMs: Long = 1706140800000L
  def restoreFilter(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .filter(col("topic").isin("events") && col("timestamp") >= lit(fromWhenMs))
      .orderBy("partition", "offset")

  /** P5: topic rename map applied at the producer sink
    * (KafkaProducer.scala:34-38).
    */
  def topicRename(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .withColumn("topic",
        when(col("topic") === "events", lit("events-restored")).otherwise(col("topic")))
      .groupBy("topic")
      .agg(count(lit(1)).as("n_records"))
      .orderBy("topic")

  /** P4/O1: key-level time prefilter with the straddling-file rule
    * (finalKeys, RestoreClientInterface.scala:50-81): hour-slice keys
    * sorted by time, kept from one before the first key >= fromWhen.
    */
  def keyPrefilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The key list is metadata-scale (one entry per backup object, not per
    // record), and the reference computes finalKeys driver-side too
    // (RestoreClientInterface.scala:50-81) — so aggregate the distinct
    // slice keys distributed, then index/cut on the driver. No
    // unpartitioned window (a single-partition global sort) in the plan.
    val keys = records(spark, dir)
      .select(BackupEngine.chronoSliceCol(col("timestamp"), ChronoUnit.HOURS).as("key_ms"))
      .distinct()
      .as[Long].collect().sorted
    val cut = keys.indexWhere(_ >= fromWhenMs)
    val keepFrom = if (cut == -1) keys.length else math.max(cut, 1) // rn of cut is cut+1; keep one before
    keys.zipWithIndex.collect {
      case (k, i) if i + 1 >= keepFrom => (k, i + 1)
    }.toSeq.toDF("key_ms", "rn")
  }

  /** §2.9 compaction: latest value per (topic, partition, key) — completes
    * the reference's stubbed pipeline with its intended semantics.
    */
  def compactLatest(spark: SparkSession, dir: String): DataFrame =
    graft.compact.CompactionEngine.latestPerKey(records(spark, dir))
      .orderBy("topic", "partition", "key")

  /** K3 analog: committed offset per (topic, partition) = max offset
    * (CommittableOffsetBatch semantics, KafkaConsumer.scala:122-123).
    */
  def offsetCommit(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .groupBy("topic", "partition")
      .agg(max("offset").as("committed_offset"), count(lit(1)).as("n_records"))
      .orderBy("topic", "partition")

  /** W5/K1 planning profile: per backup slice (day), the object's record
    * count, decoded payload bytes, and partition/offset spread — the
    * sizing pass an operator runs before choosing slice granularity
    * (the reference's S3 5 MiB minimum part, BackupClient.scala:129-135,
    * makes undersized slices a real failure mode). One scan, one
    * slice-keyed aggregate with map-side partials.
    */
  def sliceStats(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .withColumn("slice_ms", BackupEngine.chronoSliceCol(col("timestamp"), ChronoUnit.DAYS))
      .groupBy("slice_ms")
      .agg(
        count(lit(1)).as("n_records"),
        sum(length(unbase64(col("value"))).cast(LongType)).as("payload_bytes"),
        countDistinct("partition").as("n_partitions"),
        min("offset").as("min_offset"),
        max("offset").as("max_offset"))
      .orderBy("slice_ms")

  /** P6 resume/replay filter (MockedKafkaConsumerInterface.scala:77-94):
    * drop records at or below the committed cursor, per partition. The
    * committed point here is the deterministic mid-offset (min+max)/2 —
    * the committed table is partition-count-scale, so it BROADCASTS
    * into the record scan; the replay set never shuffles.
    */
  def replayFilter(spark: SparkSession, dir: String): DataFrame = {
    val rec = records(spark, dir)
    val committed = rec.groupBy("partition")
      .agg((floor((min("offset") + max("offset")) / 2)).cast(LongType).as("committed"))
    rec.join(broadcast(committed), "partition")
      .filter(col("offset") > col("committed"))
      .groupBy("partition")
      .agg(
        min("committed").as("committed"),
        count(lit(1)).as("n_replayed"),
        min("offset").as("first_replayed"),
        max("offset").as("last_replayed"))
      .orderBy("partition")
  }

  /** End-to-end: backup to hour-sliced JSON objects, restore, project.
    * The result must equal the ingest projection — the reference's
    * round-trip oracle (RestoreClientInterfaceTest.scala:85-110) expressed
    * as a driver-checkable query.
    */
  def backupRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-roundtrip").toString
    BackupEngine.backupBatch(records(spark, dir), out, ChronoUnitSlice(ChronoUnit.DAYS))
    RestoreEngine.restore(spark, out, Set("events"))
      .orderBy("partition", "offset")
  }

  /** F3/F4 under the gate: the same round-trip through gzip'd
    * `<ISO>.json.gz` objects (write-side GZIP streams, read-side
    * by-extension decompression).
    */
  def backupRoundtripGzip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-roundtrip-gz").toString
    BackupEngine.backupBatch(records(spark, dir), out,
      ChronoUnitSlice(ChronoUnit.DAYS), compression = Some(Gzip))
    RestoreEngine.restore(spark, out, Set("events"))
      .orderBy("partition", "offset")
  }
}
