package graft.operators

import graft.SparkSuite

/** tree-report's arithmetic is pinned against compact-files' actual
  * behavior: the predicted file-count delta is what a compaction run
  * then delivers. */
class TreeReportSpec extends SparkSuite {
  import spark.implicits._

  test("debt census and prediction match what compact-files delivers") {
    val dir = tmpDir("tree-report")
    (0L until 2L).foreach { b =>
      (0L until 300L).map(i => (b * 300 + i, s"v$i")).toDF("k", "v")
        .repartition(5).write.parquet(s"$dir/part=$b")
    }
    val target = 10L * 1024 * 1024
    val rep = TreeReport.report(spark, dir, targetBytes = target)
    assert(rep.files == 10 && rep.leaves.size == 2)
    assert(rep.smallFiles == 10, "all files are sub-threshold here")
    assert(rep.debtLeaves == 2)
    assert(rep.sizeDeciles.size == 11 && rep.sizeDeciles.head <= rep.sizeDeciles.last)
    assert(rep.lines.exists(_.contains("compact-files would rewrite 10 files")))
    // the prediction is what the packer then delivers
    val after = FileCompaction.compactTree(spark, dir, targetBytes = target)
    val again = TreeReport.report(spark, dir, targetBytes = target)
    assert(again.files == rep.packedFiles,
      s"predicted ${rep.packedFiles}, compaction left ${again.files}")
    assert(after.filesAfter == rep.leaves.map(_.packedFiles).sum)
    // healthy tree: no recommendation to churn
    assert(again.packedFiles >= again.files)
    assert(again.lines.exists(_.contains("layout is healthy")))
  }

  test("empty and missing trees answer instead of crashing") {
    val dir = tmpDir("tree-report-empty")
    val rep = TreeReport.report(spark, dir)
    assert(rep.files == 0 && rep.lines.exists(_.contains("empty tree")))
    intercept[IllegalArgumentException] {
      TreeReport.report(spark, dir, targetBytes = -5)
    }
  }
}
