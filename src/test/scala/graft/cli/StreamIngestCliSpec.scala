package graft.cli

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** The `stream-ingest` verb end-to-end: watch a parquet dir, land
  * batch_id partitions, keep the minmax index scan-serveable; a
  * re-run with the same checkpoint ingests only NEW source files and
  * the index follows.
  */
class StreamIngestCliSpec extends SparkSuite {
  import spark.implicits._

  test("stream-ingest: ingest, scan, re-run picks up only new files") {
    val base = tmpDir("stream-ingest-cli")
    val src = s"$base/src"
    val data = s"$base/data"
    val idx = s"$base/idx"
    val args = Map("in" -> src, "data" -> data, "index" -> idx,
      "cols" -> "k", "checkpoint" -> s"$base/ck")
    (0L until 100L).map(k => (k, k * 2)).toDF("k", "v")
      .coalesce(1).write.parquet(src)
    Main.streamIngestCmd(spark, args)
    // scan serves (non-stale) and equals the direct filtered read
    val scan1 = Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
      "out" -> s"$base/hits1", "where" -> "k:10:19"))._2
    assert(spark.read.parquet(s"$base/hits1").count() == 10, scan1)
    // new source file -> re-run ingests ONLY it, index stays current
    (1000L until 1100L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Main.streamIngestCmd(spark, args)
    assert(spark.read.parquet(data).count() == 200)
    Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
      "out" -> s"$base/hits2", "where" -> "k:1000:1099"))
    assert(spark.read.parquet(s"$base/hits2").count() == 100)
    assert(spark.read.parquet(s"$base/hits2")
      .where(col("batch_id").isNull).count() == 0,
      "batch_id partition column must survive the pruned read")
    // empty --cols is a validation failure, not a silent no-index run
    intercept[IllegalArgumentException] {
      Main.streamIngestCmd(spark, args + ("cols" -> " , "))
    }
  }
}
