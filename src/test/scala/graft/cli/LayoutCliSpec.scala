package graft.cli

import graft.SparkSuite

/** `layout` verb: the z-order rewrite driven through the command
  * surface — output round-trips, the tightness report reflects real
  * per-file footer boxes, and bad configurations die loudly.
  */
class LayoutCliSpec extends SparkSuite {

  private val liPath = s"${SparkSuite.sf0001}/lineitem.parquet"

  test("layout: writes a z-ordered copy, reports per-dimension file-span fractions") {
    val out = tmpDir("cli-layout") + "/li"
    val (o, report) = Main.layoutCmd(spark, Map(
      "in" -> liPath, "out" -> out,
      "cols" -> "l_partkey,l_suppkey", "partitions" -> "16"))
    assert(o == out)
    assert(report.contains("16 files"), s"report: $report")
    // both dimensions must be skippable: mean file span < 80% of range
    val fracs = "(l_partkey|l_suppkey)=([0-9.]+)".r
      .findAllMatchIn(report).map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(fracs.keySet == Set("l_partkey", "l_suppkey"), s"report: $report")
    fracs.foreach { case (c, f) =>
      assert(f > 0.0 && f < 0.8, s"file-span fraction for $c is $f — no skipping possible") }
    val back = spark.read.parquet(out)
    assert(back.count() == spark.read.parquet(liPath).count())
    assert(!back.columns.contains("_z"))
  }

  test("layout -> build-index minmax -> scan: the full data-skipping story") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("cli-skip")
    val data = s"$base/li"
    Main.layoutCmd(spark, Map("in" -> liPath, "out" -> data,
      "cols" -> "l_partkey,l_suppkey", "partitions" -> "16"))
    val idx = s"$base/idx"
    val (k, o, n) = Main.buildIndexCmd(spark, Map("kind" -> "minmax",
      "in" -> data, "out" -> idx, "cols" -> "l_partkey,l_suppkey"))
    assert(k == "minmax" && o == idx && n > 0)
    val outP = s"$base/hits"
    val (_, report) = Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
      "out" -> outP, "where" -> "l_partkey:50:100,l_suppkey:3:6"))
    val m = "read (\\d+) of (\\d+) files \\((\\d+) rows\\)".r
      .findFirstMatchIn(report).getOrElse(fail(s"report: $report"))
    assert(m.group(2).toInt == 16 && m.group(1).toInt < 16,
      s"scan must prune files on the z-ordered layout: $report")
    val want = spark.read.parquet(data).where(
      col("l_partkey").between(50, 100) && col("l_suppkey").between(3, 6))
    val got = spark.read.parquet(outP)
    assert(got.count() == m.group(3).toLong && got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // grow the dir: scan refuses until update-index folds the new files
    spark.read.parquet(liPath).limit(100)
      .write.mode("append").parquet(data)
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
        "out" -> s"$base/hits2", "where" -> "l_partkey:50:100"))
    }
    val idx2 = s"$base/idx2"
    val (_, _, grew) = Main.updateIndexCmd(spark, Map("kind" -> "minmax",
      "in" -> data, "index" -> idx, "out" -> idx2))
    assert(grew > 0, "fold must report the new file count")
    val (_, r2) = Main.scanCmd(spark, Map("in" -> data, "index" -> idx2,
      "out" -> s"$base/hits3", "where" -> "l_partkey:50:100,l_suppkey:3:6"))
    val want2 = spark.read.parquet(data).where(
      col("l_partkey").between(50, 100) && col("l_suppkey").between(3, 6))
    assert(spark.read.parquet(s"$base/hits3").count() == want2.count(), r2)
    // bad --where shapes die loudly
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> data, "index" -> idx2,
        "out" -> s"$base/x", "where" -> "l_partkey:abc:100"))
    }
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> data, "index" -> idx2,
        "out" -> s"$base/x", "where" -> "l_partkey=50"))
    }
  }

  test("layout: --keep-z persists the clustering key; bad flags die loudly") {
    val out = tmpDir("cli-layout-keep") + "/li"
    Main.layoutCmd(spark, Map("in" -> liPath, "out" -> out,
      "cols" -> "l_partkey,l_suppkey", "partitions" -> "4", "keep-z" -> ""))
    assert(spark.read.parquet(out).columns.contains("_z"))
    intercept[IllegalArgumentException] {
      Main.layoutCmd(spark, Map("in" -> liPath, "out" -> s"$out-2",
        "cols" -> "l_partkey,no_such_col"))
    }
    intercept[IllegalArgumentException] {
      Main.layoutCmd(spark, Map("in" -> liPath, "out" -> s"$out-3",
        "cols" -> "l_partkey,l_suppkey", "bits" -> "40")) // 80 bits > 63
    }
    intercept[IllegalArgumentException] {
      Main.layoutCmd(spark, Map("in" -> liPath, "out" -> s"$out-4",
        "cols" -> "l_partkey,l_returnflag")) // non-numeric
    }
  }
}
