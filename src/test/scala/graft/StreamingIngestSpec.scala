package graft

import graft.operators.DataSkipping
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** The streaming minmax maintenance contract: after EVERY micro-batch
  * commit the index is non-stale (scan serves, no refusal), the folded
  * stats equal a from-scratch rebuild over the current tree, and the
  * pruned scan equals the direct filtered read.
  */
class StreamingIngestSpec extends SparkSuite {
  import spark.implicits._

  test("streamed batches keep the minmax index scan-serveable; fold == rebuild") {
    val base = tmpDir("stream-minmax")
    val data = s"$base/data"
    val idxDir = s"$base/idx"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startWithMinMaxIndex(
      mem.toDF().toDF("k", "v"), data, idxDir, Seq("k"), s"$base/ck")
    try {
      // three batches with disjoint key ranges -> tight per-batch boxes
      val batches = Seq(0L until 100L, 1000L until 1100L, 2000L until 2100L)
      batches.zipWithIndex.foreach { case (ks, i) =>
        mem.addData(ks.map(k => (k, k * 10)): _*)
        q.processAllAvailable()
        val idx = DataSkipping.MinMaxIndex.load(spark, idxDir)
        // non-stale after the commit: scan serves instead of refusing
        val hits = idx.scan(spark, data, Seq(("k", 0.0, 99.0)))
        val want = spark.read.parquet(data).where(col("k").between(0, 99))
        assert(hits.count() == want.count() && hits.count() == 100,
          s"after batch $i: ${hits.count()} vs ${want.count()}")
        // fold == rebuild over the current tree
        val rebuilt = DataSkipping.buildMinMaxIndex(spark, data, Seq("k"))
        assert(idx.stats.collect().map(_.mkString("|")).sorted.toSeq ==
          rebuilt.stats.collect().map(_.mkString("|")).sorted.toSeq,
          s"after batch $i the maintained index must equal a rebuild")
      }
      // disjoint batch ranges -> a range over ONE batch prunes the rest
      val idx = DataSkipping.MinMaxIndex.load(spark, idxDir)
      val pruned = idx.prunedFiles(Seq(("k", 1000.0, 1099.0)))
      val all = idx.stats.count()
      assert(pruned.nonEmpty && pruned.size < all,
        s"disjoint batches must prune: ${pruned.size} of $all")
      // batch_id partition column survives the pruned subset read
      val sliced = idx.scan(spark, data, Seq(("k", 1000.0, 1099.0)))
      assert(sliced.columns.contains("batch_id"),
        s"partition column lost: ${sliced.columns.toSeq}")
      assert(sliced.count() == 100)
    } finally q.stop()
  }

  test("compactEvery: committed batch leaves collapse in-stream, index follows") {
    val base = tmpDir("stream-minmax-compact")
    val data = s"$base/data"
    val idxDir = s"$base/idx"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startWithMinMaxIndex(
      mem.toDF().toDF("k", "v"), data, idxDir, Seq("k"), s"$base/ck",
      compactEvery = 2)
    try {
      (0L until 4L).foreach { b =>
        mem.addData((b * 100 until b * 100 + 100).map(k => (k, k)): _*)
        q.processAllAvailable()
      }
      val fs = new org.apache.hadoop.fs.Path(data)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val leaves = fs.listStatus(new org.apache.hadoop.fs.Path(data))
        .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
      // more than 2 leaves triggered collapse; the newest survives and
      // the census never exceeds compactEvery + 1 for long
      assert(leaves.size <= 3, s"collapse never ran: $leaves")
      assert(leaves.contains("batch_id=3"), s"newest leaf missing: $leaves")
      // every row survived and the index serves the compacted tree
      val idx = DataSkipping.MinMaxIndex.load(spark, idxDir)
      val hits = idx.scan(spark, data, Seq(("k", 0.0, 399.0)))
      assert(hits.count() == 400)
      val rebuilt = DataSkipping.buildMinMaxIndex(spark, data, Seq("k"))
      assert(idx.stats.collect().map(_.mkString("|")).sorted.toSeq ==
        rebuilt.stats.collect().map(_.mkString("|")).sorted.toSeq,
        "maintained index must equal a rebuild after in-stream compaction")
    } finally q.stop()
  }

  test("bloom maintenance rides the same hook: point scans serve after every batch") {
    val base = tmpDir("stream-bloom")
    val data = s"$base/data"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startWithMinMaxIndex(
      mem.toDF().toDF("k", "v"), data, s"$base/midx", Seq("v"), s"$base/ck",
      bloomIndexDir = Some(s"$base/bidx"), bloomCols = Seq("k"),
      bloomExpectedItems = 1000)
    try {
      (0L until 3L).foreach { b =>
        mem.addData((b * 1000 until b * 1000 + 100).map(k => (k, k)): _*)
        q.processAllAvailable()
        val idx = graft.operators.BloomSkipping.BloomIndex
          .load(spark, s"$base/bidx")
        // serveable (non-stale) right after the commit, and the probe
        // finds a key from the OLDEST batch through the newest tree
        assert(idx.scan(spark, data, Seq(("k", 50L))).count() == 1,
          s"after batch $b")
        assert(idx.scan(spark, data, Seq(("k", b * 1000 + 50L))).count() == 1)
      }
      // disjoint per-batch key ranges: a point probe prunes to one file
      val idx = graft.operators.BloomSkipping.BloomIndex
        .load(spark, s"$base/bidx")
      assert(idx.prunedFiles(Seq(("k", 1050L))).size < idx.stats.count())
      // one-sided bloom config refuses loudly
      intercept[IllegalArgumentException] {
        StreamingIngest.startWithMinMaxIndex(
          mem.toDF().toDF("k", "v"), data, s"$base/midx", Seq("v"),
          s"$base/ck2", bloomIndexDir = Some(s"$base/bidx2"))
      }
    } finally q.stop()
  }

  test("layoutCols: z-sorted batches land with tight per-file boxes") {
    val base = tmpDir("stream-zsort")
    val data = s"$base/data"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startWithMinMaxIndex(
      mem.toDF().toDF("x", "y"), data, s"$base/idx", Seq("x", "y"),
      s"$base/ck", layoutCols = Seq("x", "y"), layoutBits = 8)
    try {
      // shuffled 2-D grid in ONE batch across several partitions
      // (each addData block is its own partition, so the z repartition
      // keeps k = 4 files)
      val rnd = new scala.util.Random(7)
      val rows = rnd.shuffle(
        (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toSeq)
      rows.grouped(rows.size / 4 + 1)
        .foreach(chunk => mem.addData(chunk: _*))
      q.processAllAvailable()
      val idx = DataSkipping.MinMaxIndex.load(spark, s"$base/idx")
      val nFiles = idx.stats.count()
      // every row survived, exactly once
      assert(spark.read.parquet(data).count() == 64 * 64)
      assert(spark.read.parquet(data).distinct().count() == 64 * 64)
      if (nFiles > 1) {
        // tight boxes: a quarter-range 2-D box must NOT touch every
        // file (an unsorted batch's per-file boxes all span the domain)
        val pruned = idx.prunedFiles(
          Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0)))
        assert(pruned.size < nFiles,
          s"z-sorted batch did not tighten boxes: $pruned of $nFiles")
        // and the pruned scan stays exact
        assert(idx.scan(spark, data,
          Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0))).count() == 16 * 16)
      }
    } finally q.stop()
  }

  test("a replayed (overwritten) batch dir reconciles instead of going stale") {
    val base = tmpDir("stream-minmax-replay")
    val data = s"$base/data"
    // seed two batch dirs + an index over them
    Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
      .write.parquet(s"$data/batch_id=0")
    Seq((10L, 1L), (20L, 2L)).toDF("k", "v")
      .write.parquet(s"$data/batch_id=1")
    val idx = DataSkipping.buildMinMaxIndex(spark, data, Seq("k"))
    // a replay overwrites batch 1 with the same DATA but new files
    Seq((10L, 1L), (20L, 2L)).toDF("k", "v").repartition(2)
      .write.mode("overwrite").parquet(s"$data/batch_id=1")
    // scan refuses the drifted set; reconcile heals it to rebuild-equal
    intercept[IllegalArgumentException] {
      idx.scan(spark, data, Seq(("k", 1.0, 20.0)))
    }
    val healed = idx.reconciled(spark, data)
    val rebuilt = DataSkipping.buildMinMaxIndex(spark, data, Seq("k"))
    assert(healed.stats.collect().map(_.mkString("|")).sorted.toSeq ==
      rebuilt.stats.collect().map(_.mkString("|")).sorted.toSeq)
    assert(healed.scan(spark, data, Seq(("k", 1.0, 20.0))).count() == 4)
    // an unchanged tree reconciles to the SAME instance (no-op save guard)
    assert(healed.reconciled(spark, data) eq healed)
  }
}
