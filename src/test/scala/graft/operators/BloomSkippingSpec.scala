package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** The bloom skipping contract: pruning loses no rows (no false
  * negatives, ever — saturation and all), point scans equal the direct
  * filtered read while touching fewer files, appends fold in, drift
  * refuses loudly. */
class BloomSkippingSpec extends SparkSuite {
  import spark.implicits._

  test("point scan equals direct read and touches fewer files") {
    val dir = tmpDir("bloom-basic")
    // high-cardinality key in arrival order: every file's minmax box
    // spans the domain, the case bloom exists for
    (0L until 8000L).map(i => ((i * 2654435761L) % 100000L, i))
      .toDF("doc_id", "payload")
      .repartition(16).write.mode("overwrite").parquet(dir)
    val idx = BloomSkipping.buildBloomIndex(spark, dir, Seq("doc_id"),
      expectedItems = 1000)
    val key = spark.read.parquet(dir).select("doc_id").head().getLong(0)
    val pruned = idx.prunedFiles(Seq(("doc_id", key)))
    assert(pruned.size < 16, s"no pruning happened: ${pruned.size} of 16")
    val got = idx.scan(spark, dir, Seq(("doc_id", key)))
    val want = spark.read.parquet(dir).where(col("doc_id") === key)
    assert(got.count() == want.count() && got.count() >= 1)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("every key is found: no false negatives across the whole keyspace") {
    val dir = tmpDir("bloom-nofn")
    (0L until 500L).map(i => (i, s"p$i")).toDF("k", "v")
      .repartition(8).write.mode("overwrite").parquet(dir)
    // deliberately undersized filters: saturation degrades fpp (less
    // pruning), never membership
    val idx = BloomSkipping.buildBloomIndex(spark, dir, Seq("k"),
      expectedItems = 10)
    (0L until 500L by 37L).foreach { k =>
      assert(idx.scan(spark, dir, Seq(("k", k))).count() == 1,
        s"key $k lost — bloom false negative, which must be impossible")
    }
  }

  test("string keys probe with string hashing") {
    val dir = tmpDir("bloom-str")
    (0L until 2000L).map(i => (s"doc-${i * 7919 % 5000}", i))
      .toDF("name", "payload")
      .repartition(10).write.mode("overwrite").parquet(dir)
    val idx = BloomSkipping.buildBloomIndex(spark, dir, Seq("name"),
      expectedItems = 500)
    val got = idx.scan(spark, dir, Seq(("name", "doc-0")))
    val want = spark.read.parquet(dir).where(col("name") === "doc-0")
    assert(got.count() == want.count() && got.count() >= 1)
  }

  test("append refuses until folded; updated() serves the grown dir") {
    val dir = tmpDir("bloom-fold")
    (0L until 300L).map(i => (i, i)).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val idx = BloomSkipping.buildBloomIndex(spark, dir, Seq("k"),
      expectedItems = 1000)
    (1000L until 1300L).map(i => (i, i)).toDF("k", "v")
      .repartition(4).write.mode("append").parquet(dir)
    intercept[IllegalArgumentException] {
      idx.scan(spark, dir, Seq(("k", 1100L)))
    }
    val folded = idx.updated(spark, dir)
    assert(folded.scan(spark, dir, Seq(("k", 1100L))).count() == 1)
    assert(folded.scan(spark, dir, Seq(("k", 100L))).count() == 1)
    // no-op fold returns the same instance (skippable save)
    assert(folded.updated(spark, dir) eq folded)
  }

  test("save/load round-trips parameters and serves on a partitioned tree") {
    val base = tmpDir("bloom-artifact")
    val dir = s"$base/data"
    (0L until 3L).foreach { b =>
      (0L until 200L).map(i => (b * 200 + i, i)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/batch_id=$b")
    }
    BloomSkipping.buildBloomIndex(spark, dir, Seq("k"),
      expectedItems = 400, fpp = 0.02).save(s"$base/idx")
    val idx = BloomSkipping.BloomIndex.load(spark, s"$base/idx")
    assert(idx.expectedItems == 400 && math.abs(idx.fpp - 0.02) < 1e-9)
    // disjoint per-leaf key ranges: the probe prunes to one file and
    // the partition column survives the subset read
    val got = idx.scan(spark, dir, Seq(("k", 450L)))
    assert(got.count() == 1 && got.columns.contains("batch_id"))
    // partition-path inference types small ids as INT
    assert(got.head().getAs[Number]("batch_id").longValue == 2L)
    assert(idx.prunedFiles(Seq(("k", 450L))).size < 3)
  }

  test("unindexed column and bad parameters refuse loudly") {
    val dir = tmpDir("bloom-validate")
    (0L until 10L).map(i => (i, i.toDouble)).toDF("k", "x")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    intercept[IllegalArgumentException] {
      BloomSkipping.buildBloomIndex(spark, dir, Seq("x")) // double: untyped
    }
    intercept[IllegalArgumentException] {
      BloomSkipping.buildBloomIndex(spark, dir, Seq("nope"))
    }
    val idx = BloomSkipping.buildBloomIndex(spark, dir, Seq("k"))
    intercept[IllegalArgumentException] {
      idx.prunedFiles(Seq(("x", 1L)))
    }
  }
}
