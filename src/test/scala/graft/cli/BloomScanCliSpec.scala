package graft.cli

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** The bloom lifecycle through the CLI verbs: build-index --kind
  * bloom, scan --where-eq, update-index fold after an append. */
class BloomScanCliSpec extends SparkSuite {
  import spark.implicits._

  test("build-index bloom -> scan --where-eq -> append -> update-index -> scan") {
    val base = tmpDir("bloom-cli")
    val dir = s"$base/data"
    (0L until 4000L).map(i => ((i * 2654435761L) % 50000L, s"u${i % 97}", i))
      .toDF("doc_id", "user", "payload")
      .repartition(12).write.mode("overwrite").parquet(dir)
    Main.buildIndexCmd(spark, Map("kind" -> "bloom", "in" -> dir,
      "out" -> s"$base/idx", "cols" -> "doc_id,user",
      "expected-items" -> "1000"))
    val key = spark.read.parquet(dir).select("doc_id").head().getLong(0)
    val (_, msg) = Main.scanCmd(spark, Map("in" -> dir,
      "index" -> s"$base/idx", "out" -> s"$base/hits",
      "where-eq" -> s"doc_id:$key"))
    val want = spark.read.parquet(dir).where(col("doc_id") === key).count()
    assert(spark.read.parquet(s"$base/hits").count() == want, msg)
    assert(msg.contains("of 12 files"))
    // two-column conjunction: both filters must admit the file
    val u = spark.read.parquet(dir).where(col("doc_id") === key)
      .select("user").head().getString(0)
    Main.scanCmd(spark, Map("in" -> dir, "index" -> s"$base/idx",
      "out" -> s"$base/hits2", "where-eq" -> s"doc_id:$key,user:$u"))
    assert(spark.read.parquet(s"$base/hits2").count() ==
      spark.read.parquet(dir)
        .where(col("doc_id") === key && col("user") === u).count())
    // append drifts the file set: scan refuses until update-index folds
    (100000L until 100100L).map(i => (i, "new", i))
      .toDF("doc_id", "user", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> dir, "index" -> s"$base/idx",
        "out" -> s"$base/hits3", "where-eq" -> "doc_id:100050"))
    }
    Main.updateIndexCmd(spark, Map("kind" -> "bloom", "in" -> dir,
      "index" -> s"$base/idx", "out" -> s"$base/idx2"))
    Main.scanCmd(spark, Map("in" -> dir, "index" -> s"$base/idx2",
      "out" -> s"$base/hits3", "where-eq" -> "doc_id:100050"))
    assert(spark.read.parquet(s"$base/hits3").count() == 1)
    // both flags without a bloom artifact alongside the minmax one is
    // a usage error, not a guess
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> dir, "index" -> s"$base/idx2",
        "out" -> s"$base/x", "where" -> "payload:0:10",
        "where-eq" -> "doc_id:1"))
    }
  }

  test("composed scan: minmax ranges AND bloom points prune together, result exact") {
    val base = tmpDir("bloom-composed")
    val dir = s"$base/data"
    // payload is range-ordered across files (minmax prunes it), doc_id
    // is hash-scattered (bloom prunes it) — each index covers the
    // other's blind spot
    (0L until 8000L).map(i => ((i * 2654435761L) % 50000L, i))
      .toDF("doc_id", "payload")
      .repartitionByRange(16, col("payload"))
      .sortWithinPartitions("payload")
      .write.mode("overwrite").parquet(dir)
    Main.buildIndexCmd(spark, Map("kind" -> "minmax", "in" -> dir,
      "out" -> s"$base/midx", "cols" -> "payload"))
    Main.buildIndexCmd(spark, Map("kind" -> "bloom", "in" -> dir,
      "out" -> s"$base/bidx", "cols" -> "doc_id",
      "expected-items" -> "1000"))
    val probe = spark.read.parquet(dir)
      .where(col("payload") >= 1000 && col("payload") <= 2000)
      .select("doc_id").head().getLong(0)
    val (_, msg) = Main.scanCmd(spark, Map("in" -> dir,
      "index" -> s"$base/midx", "bloom-index" -> s"$base/bidx",
      "out" -> s"$base/hits", "where" -> "payload:1000:2000",
      "where-eq" -> s"doc_id:$probe"))
    val want = spark.read.parquet(dir)
      .where(col("payload") >= 1000 && col("payload") <= 2000 &&
        col("doc_id") === probe)
    assert(spark.read.parquet(s"$base/hits").count() == want.count(), msg)
    assert(want.count() >= 1)
    // the intersection reads no more files than either index alone
    val m = "read (\\d+) of (\\d+) files \\(\\d+ rows; ranges kept (\\d+), points kept (\\d+)\\)".r
    val m(read, total, kr, kp) = msg: @unchecked
    assert(read.toInt <= math.min(kr.toInt, kp.toInt) && total.toInt == 16)
    assert(read.toInt < 16, s"composition pruned nothing: $msg")
  }
}
