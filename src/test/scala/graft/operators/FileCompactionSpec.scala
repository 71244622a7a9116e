package graft.operators

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Small-file bin-packing: rows survive byte-for-byte, only the debt
  * is rewritten, collapse keeps the replayable newest leaf, and the
  * minmax index serves the compacted tree after reconcile. */
class FileCompactionSpec extends SparkSuite {
  import spark.implicits._

  private def names(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("flat dir: packs small files, rows identical, second run a no-op") {
    val dir = tmpDir("fc-flat")
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(10).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().toSeq
    val rep = FileCompaction.compactTree(spark, dir,
      targetBytes = 10L * 1024 * 1024)
    assert(rep.leaves.size == 1 && rep.leaves.head.filesBefore == 10)
    assert(rep.filesAfter < 10 && rep.filesAfter >= 1)
    assert(names(dir).size == rep.filesAfter)
    val after = spark.read.parquet(dir)
    assert(after.collect().toSeq.sortBy(_.getLong(0)) ==
      beforeRows.sortBy(_.getLong(0)))
    // debt gone: nothing left to rewrite
    val again = FileCompaction.compactTree(spark, dir,
      targetBytes = 10L * 1024 * 1024)
    assert(again.leaves.isEmpty && again.untouchedLeaves == 1)
  }

  test("packing respects the target: more input bytes than one bin -> several files") {
    val dir = tmpDir("fc-bins")
    (0L until 20000L).map(i => (i, s"value-$i-" + "x" * 50)).toDF("k", "v")
      .repartition(16).write.mode("overwrite").parquet(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen).sum
    // target below the total: one bin cannot hold everything
    val rep = FileCompaction.compactTree(spark, dir, targetBytes = total / 3,
      smallBytes = total / 3)
    assert(rep.filesAfter >= 2 && rep.filesAfter < 16,
      s"expected 2..15 packed files, got ${rep.filesAfter}")
    assert(spark.read.parquet(dir).count() == 20000L)
  }

  test("partitioned tree: only small-file leaves rewritten, big files untouched") {
    val dir = tmpDir("fc-tree")
    (0L until 300L).map(i => (i % 3, i, s"v$i")).toDF("part", "k", "v")
      .repartition(6).write.mode("overwrite").partitionBy("part").parquet(dir)
    // make part=2 "big": rewrite it as one file and use a threshold
    // below its size so it never counts as small
    val two = spark.read.parquet(s"$dir/part=2")
    val cols = two.columns
    two.coalesce(1).write.mode("overwrite").parquet(s"$dir/.tmp-two")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$dir/part=2"), true)
    fs.rename(new Path(s"$dir/.tmp-two"), new Path(s"$dir/part=2"))
    val bigNames = names(s"$dir/part=2")
    val bigLen = fs.listStatus(new Path(s"$dir/part=2"))
      .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getLen).max
    val beforeAll = spark.read.parquet(dir).collect().toSeq
    val rep = FileCompaction.compactTree(spark, dir,
      targetBytes = 10L * 1024 * 1024, smallBytes = bigLen)
    assert(rep.leaves.map(_.leaf).toSet == Set("part=0", "part=1"))
    assert(names(s"$dir/part=2") == bigNames, "big leaf must not be touched")
    assert(spark.read.parquet(dir).collect().toSeq.sortBy(_.toString) ==
      beforeAll.sortBy(_.toString))
    assert(cols.nonEmpty) // silence unused warning paths
  }

  test("collapse: bookkeeping leaves merge, newest kept, rows survive modulo the column") {
    val dir = tmpDir("fc-collapse")
    (0L until 4L).foreach { b =>
      (0L until 100L).map(i => (b * 1000 + i, i.toDouble)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/batch_id=$b")
    }
    val beforeData = spark.read.parquet(dir).select("k", "v")
      .collect().toSeq.sortBy(_.getLong(0))
    val rep = FileCompaction.compactTree(spark, dir,
      targetBytes = 10L * 1024 * 1024, collapse = Some("batch_id"))
    assert(rep.newestLeafKept.contains("batch_id=3"))
    val collapsed = rep.leaves.find(_.leaf == "batch_id=2")
    assert(collapsed.exists(_.filesBefore == 3),
      s"batches 0,1,2 should merge into batch_id=2; got ${rep.leaves}")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/batch_id=0")))
    assert(!fs.exists(new Path(s"$dir/batch_id=1")))
    assert(names(s"$dir/batch_id=3").size == 1, "newest leaf untouched")
    val after = spark.read.parquet(dir)
    assert(after.select("k", "v").collect().toSeq.sortBy(_.getLong(0)) ==
      beforeData)
    // collapsed rows carry the target leaf's value now
    assert(after.where($"batch_id" === 2L).count() == 300L)
    assert(after.where($"batch_id" === 3L).count() == 100L)
  }

  test("collapse refuses a multi-level or non-matching tree and non-numeric ids") {
    val dir = tmpDir("fc-collapse-bad")
    (0L until 10L).map(i => (i, i)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/part=a")
    intercept[IllegalArgumentException] {
      FileCompaction.compactTree(spark, dir, collapse = Some("batch_id"))
    }
    intercept[IllegalArgumentException] {
      FileCompaction.compactTree(spark, dir, collapse = Some("part"))
    }
    intercept[IllegalArgumentException] {
      FileCompaction.compactTree(spark, dir, targetBytes = 100, smallBytes = 200)
    }
  }

}
