package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Harness-table readers with one normalization boundary.
  *
  * The harness has shipped `events.ts` under two physical parquet
  * types: TIMESTAMP(NANOS) stored as int64 (readable only with
  * `spark.sql.legacy.parquet.nanosAsLong`, surfacing as LongType
  * nanos) and, since the round-7 regeneration, plain `timestamp[us]`
  * (surfacing as TIMESTAMP_NTZ micros). Every query and every DuckDB
  * oracle in this repo does integer epoch math — `ts div 1000000`,
  * `epoch_ms(ts)` — so the contract is normalized HERE, at the read
  * boundary, to epoch NANOS as BIGINT; downstream operators never
  * branch on the physical type. The NTZ→timestamp cast is exact under
  * the UTC session timezone every entrypoint pins, matching DuckDB's
  * UTC-naive `epoch_ms` on the same file.
  */
object Tables {

  /** Read `dir/name.parquet` with `ts` normalized to epoch-nanos BIGINT. */
  def pq(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Epoch-millis Column for a `ts` of any harness vintage — for call
    * sites that project a frame NOT routed through [[pq]] (streams with
    * an explicit schema). Integer division, not `/`: double rounding at
    * integer boundaries diverges from DuckDB's epoch_ms truncation. */
  def tsMillisCol(tsType: DataType): org.apache.spark.sql.Column = tsType match {
    case LongType => expr("ts div 1000000")
    case _        => unix_millis(col("ts").cast(TimestampType))
  }

  /** Rewrite a `ts` column of any harness vintage to epoch-nanos
    * BIGINT; frames without `ts` pass through untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df // legacy nanos-as-long: already the contract
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported physical type $other — expected " +
            "int64 nanos (legacy) or timestamp micros")
    }
}
