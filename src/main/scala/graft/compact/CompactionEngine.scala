package graft.compact

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compaction: Kafka-log-compaction-style dedup — keep the latest value per
  * key. The reference scaffolded but never implemented this (compaction-s3/
  * .../StorageClient.scala:38-40 ends in `???`; core-compaction/.../
  * PostgresJDBCDatabase.scala:46 has an empty SQL string); its intended
  * semantics (interfaces + GCS compactionBucket config) are completed here
  * as a natural Spark batch job.
  *
  * Scale notes: single hash-shuffle on the grouping key with map-side
  * partial aggregation (max_by is a declarative aggregate — partial merge
  * happens before the shuffle); no sort, no window function.
  */
object CompactionEngine {

  /** Latest record per (topic, partition, key), "latest" = max offset. */
  def latestPerKey(records: DataFrame): DataFrame =
    records
      .groupBy(col("topic"), col("partition"), col("key"))
      .agg(
        max_by(col("value"), col("offset")).as("value"),
        max(col("offset")).as("offset"),
        max_by(col("timestamp"), col("offset")).as("timestamp"),
        max_by(col("timestamp_type"), col("offset")).as("timestamp_type")
      )
      .select("topic", "partition", "offset", "key", "value", "timestamp", "timestamp_type")

  /** JDBC sink parity with the reference's intended Postgres COPY sink
    * (core-compaction/.../PostgresJDBCDatabase.scala:42-65).
    */
  def writeJdbc(records: DataFrame, url: String, table: String, props: java.util.Properties): Unit =
    records.write.mode("overwrite").jdbc(url, table, props)
}
