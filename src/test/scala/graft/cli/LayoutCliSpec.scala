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

  test("minmax over a two-level hive-partitioned tree: per-leaf pruning composes") {
    import org.apache.spark.sql.functions._
    val base = tmpDir("cli-skip-part")
    val data = s"$base/li"
    // two-level partitioned write; repartitionByRange on the interior
    // column first, so each leaf's files carry TIGHT l_suppkey boxes
    // (4 range slices x 6 leaves = 24 leaf files)
    spark.read.parquet(liPath)
      .withColumn("pk", pmod(col("l_orderkey"), lit(3)).cast("int"))
      .withColumn("pk2", pmod(col("l_partkey"), lit(2)).cast("int"))
      .repartitionByRange(4, col("l_suppkey"))
      .write.partitionBy("pk", "pk2").mode("overwrite").parquet(data)
    val idx = s"$base/idx"
    Main.buildIndexCmd(spark, Map("kind" -> "minmax",
      "in" -> data, "out" -> idx, "cols" -> "pk,l_suppkey"))
    val nFiles = graft.operators.DataSkipping.MinMaxIndex
      .load(spark, idx).stats.count()
    assert(nFiles == 24, s"expected 24 leaf files indexed, got $nFiles")
    // range on the PARTITION column + a narrow interior range: the
    // partition box prunes whole leaves, the l_suppkey box prunes
    // inside each surviving leaf — a strict subset per leaf
    val outP = s"$base/hits"
    val (_, report) = Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
      "out" -> outP, "where" -> "pk:1:1,l_suppkey:1:2"))
    val m = "read (\\d+) of (\\d+) files \\((\\d+) rows\\)".r
      .findFirstMatchIn(report).getOrElse(fail(s"report: $report"))
    assert(m.group(2).toInt == 24, s"report: $report")
    assert(m.group(1).toInt < 8,
      s"pk=1 leaves hold 8 files — the interior box must prune within them: $report")
    assert(m.group(1).toInt > 0, s"report: $report")
    // pruned scan == direct filtered read, INCLUDING partition columns
    val want = spark.read.parquet(data).where(
      col("pk") === 1 && col("l_suppkey").between(1, 2))
    val got = spark.read.parquet(outP)
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq,
      s"partition columns must survive the pruned subset read: ${got.columns.toSeq}")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // append into ONE leaf: scan refuses, the fold equals a rebuild
    spark.read.parquet(liPath).limit(50)
      .withColumn("pk", lit(1)).withColumn("pk2", lit(0))
      .write.partitionBy("pk", "pk2").mode("append").parquet(data)
    intercept[IllegalArgumentException] {
      Main.scanCmd(spark, Map("in" -> data, "index" -> idx,
        "out" -> s"$base/hits2", "where" -> "pk:1:1"))
    }
    val idx2 = s"$base/idx2"
    val (_, _, grew) = Main.updateIndexCmd(spark, Map("kind" -> "minmax",
      "in" -> data, "index" -> idx, "out" -> idx2))
    assert(grew > 0)
    val folded = graft.operators.DataSkipping.MinMaxIndex.load(spark, idx2)
    val rebuilt = graft.operators.DataSkipping
      .buildMinMaxIndex(spark, data, Seq("pk", "l_suppkey"))
    assert(folded.stats.collect().map(_.mkString("|")).sorted.toSeq ==
      rebuilt.stats.collect().map(_.mkString("|")).sorted.toSeq,
      "incremental fold must equal a rebuild on the partitioned tree")
    val (_, r2) = Main.scanCmd(spark, Map("in" -> data, "index" -> idx2,
      "out" -> s"$base/hits3", "where" -> "pk:1:1,l_suppkey:1:2"))
    val want2 = spark.read.parquet(data).where(
      col("pk") === 1 && col("l_suppkey").between(1, 2))
    assert(spark.read.parquet(s"$base/hits3").count() == want2.count(), r2)
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
