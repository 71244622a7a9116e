package graft.cli

import graft.SparkSuite

/** The `join-report` verb end-to-end: parquet inputs, renamed key
  * (`--on k=kk`), exact-mode verdict round-tripped through the written
  * report frame, and flag validation surfacing as the
  * IllegalArgumentException the dispatcher converts to a loud exit.
  */
class JoinReportCliSpec extends SparkSuite {
  import spark.implicits._

  test("join-report verb: end-to-end through the CLI surface") {
    val dir = tmpDir("jp-cli")
    (0 until 2000).map(i => (s"key${i % 200}", i)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/left")
    (0 until 600).map(i => (s"key${i % 300}", i)).toDF("kk", "w")
      .write.mode("overwrite").parquet(s"$dir/right")
    val (out, verdict) = Main.joinReportCmd(spark, Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k=kk", "out" -> s"$dir/report",
      "sample" -> "1.0", "top-k" -> "4000", "broadcast-bytes" -> "1"))
    assert(out == s"$dir/report")
    assert(verdict.startsWith("shuffle"), verdict)
    val row = spark.read.parquet(out).head()
    assert(row.getAs[String]("recommendation") == "shuffle")
    assert(row.getAs[Long]("est_output_rows") == 4000L) // 200 keys x 10 x 2
    assert(row.getAs[Long]("est_matched_keys") == 200L)
    intercept[IllegalArgumentException] {
      Main.joinReportCmd(spark, Map(
        "left" -> s"$dir/left", "right" -> s"$dir/right",
        "on" -> "k=kk", "out" -> s"$dir/bad", "sample" -> "2.0"))
    }
  }

  test("join-report --apply: executes the advised join, rows equal the plain join") {
    val dir = tmpDir("jp-cli-apply")
    (0 until 2000).map(i => (s"key${i % 200}", i)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/left")
    (0 until 600).map(i => (s"key${i % 300}", i)).toDF("kk", "w")
      .write.mode("overwrite").parquet(s"$dir/right")
    val (out, verdict) = Main.joinReportCmd(spark, Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k=kk", "out" -> s"$dir/joined",
      "sample" -> "1.0", "top-k" -> "4000", "broadcast-bytes" -> "1",
      "apply" -> "true"))
    assert(out == s"$dir/joined")
    assert(verdict.startsWith("applied shuffle"), verdict)
    val joined = spark.read.parquet(out)
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    val plain = l.join(r, l("k") === r("kk"), "inner")
    assert(joined.count() == plain.count())
    assert(joined.columns.sorted.toSeq == plain.columns.sorted.toSeq)
  }
}
