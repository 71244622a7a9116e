package graft.cli

import graft.SparkSuite
import graft.operators.DataSkipping

/** The `compact-files` verb with `--index`: after the collapse the
  * reconciled minmax artifact serves the compacted tree — a scan
  * through it equals the direct filtered read. */
class CompactFilesCliSpec extends SparkSuite {
  import spark.implicits._

  test("compact-files --index: scan serves the compacted tree and matches the direct read") {
    val base = tmpDir("compact-files-cli")
    val dir = s"$base/data"
    val idx = s"$base/idx"
    (0L until 4L).foreach { b =>
      (0L until 200L).map(i => (b * 200 + i, i * 2)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/batch_id=$b")
    }
    DataSkipping.buildMinMaxIndex(spark, dir, Seq("k")).save(idx)
    graft.operators.BloomSkipping.buildBloomIndex(spark, dir, Seq("k"),
      expectedItems = 500).save(s"$base/bidx")
    val rep = Main.compactFilesCmd(spark, Map(
      "in" -> dir, "index" -> idx, "bloom-index" -> s"$base/bidx",
      "collapse" -> "batch_id",
      "target-bytes" -> (10L * 1024 * 1024).toString))
    assert(rep.leaves.nonEmpty)
    // the reconciled index serves the drifted (compacted) file set
    val got = DataSkipping.MinMaxIndex.load(spark, idx)
      .scan(spark, dir, Seq(("k", 150.0, 450.0)))
    val want = spark.read.parquet(dir).where($"k" >= 150 && $"k" <= 450)
    assert(got.select("k", "v").exceptAll(want.select("k", "v")).isEmpty)
    assert(want.select("k", "v").exceptAll(got.select("k", "v")).isEmpty)
    assert(got.count() == want.count() && got.count() == 301)
    // the bloom artifact reconciled through the same verb
    val bGot = graft.operators.BloomSkipping.BloomIndex
      .load(spark, s"$base/bidx").scan(spark, dir, Seq(("k", 300L)))
    assert(bGot.count() == 1)
  }
}
