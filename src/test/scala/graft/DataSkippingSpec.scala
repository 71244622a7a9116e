package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataSkipping, ZOrder}
import graft.operators.DataSkipping.MinMaxIndex

/** Minmax skipping index: pruned scan equals the direct filtered read
  * (losslessness), pruning actually skips files on a z-ordered layout,
  * staleness in either direction is refused, and the incremental fold
  * equals a rebuild.
  */
class DataSkippingSpec extends SparkSuite {

  private val sf = SparkSuite.sf0001

  // one z-ordered copy of lineitem shared by the suite
  private lazy val dataDir: String = {
    val out = tmpDir("minmax-data") + "/li"
    ZOrder.layout(spark.read.parquet(s"$sf/lineitem.parquet"),
      Seq("l_partkey", "l_suppkey"), out, bits = 16, partitions = 16)
    out
  }
  private lazy val index: MinMaxIndex =
    DataSkipping.buildMinMaxIndex(spark, dataDir, Seq("l_partkey", "l_suppkey"))

  private def midQuarter(c: String): (String, Double, Double) = {
    val r = spark.read.parquet(dataDir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    (c, lo + (hi - lo) * 0.25, lo + (hi - lo) * 0.5)
  }

  test("pruned scan equals the direct filtered read, and prunes files") {
    val ranges = Seq(midQuarter("l_partkey"), midQuarter("l_suppkey"))
    val got = index.scan(spark, dataDir, ranges)
    val want = ranges.foldLeft(spark.read.parquet(dataDir)) {
      case (df, (c, lo, hi)) =>
        df.where(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
    }
    assert(want.count() > 0, "box must match rows")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "pruned scan must be exactly the direct filtered read")
    val total = index.stats.count()
    val read = index.prunedFiles(ranges).size
    assert(read < total, s"expected pruning on the z-ordered layout, read $read/$total")
    // single-dimension bands prune too — the z-order promise
    Seq("l_partkey", "l_suppkey").foreach { c =>
      val band = index.prunedFiles(Seq(midQuarter(c))).size
      assert(band < total, s"$c band read $band/$total — no skipping")
    }
  }

  test("empty prune keeps the schema; unindexed column is rejected") {
    val none = index.scan(spark, dataDir, Seq(("l_partkey", -10.0, -5.0)))
    assert(none.count() == 0)
    assert(none.schema == spark.read.parquet(dataDir).schema)
    intercept[IllegalArgumentException] {
      index.prunedFiles(Seq(("l_orderkey", 0.0, 1.0)))
    }
    intercept[IllegalArgumentException] { // inverted bounds match nothing
      index.prunedFiles(Seq(("l_partkey", 10.0, 5.0)))
    }
    intercept[IllegalArgumentException] {
      DataSkipping.buildMinMaxIndex(spark, dataDir, Seq("l_returnflag"))
    }
  }

  test("stale index is refused in both directions; update-fold equals rebuild") {
    val dir = tmpDir("minmax-stale") + "/d"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.limit(500).repartition(2).write.parquet(dir)
    val idx0 = DataSkipping.buildMinMaxIndex(spark, dir, Seq("l_partkey"))
    // grow the dir: scan must refuse, updated() must fold the new files in
    li.limit(900).repartition(3).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      idx0.scan(spark, dir, Seq(("l_partkey", 0.0, 1e9)))
    }
    assert(e.getMessage.contains("stale"))
    val folded = idx0.updated(spark, dir)
    val rebuilt = DataSkipping.buildMinMaxIndex(spark, dir, Seq("l_partkey"))
    assert(folded.stats.count() == rebuilt.stats.count())
    assert(folded.stats.exceptAll(rebuilt.stats).isEmpty
      && rebuilt.stats.exceptAll(folded.stats).isEmpty,
      "incremental fold must equal the rebuild")
    val all = folded.scan(spark, dir, Seq(("l_partkey", 0.0, 1e9)))
    assert(all.count() == spark.read.parquet(dir).count())
    // deleted file: refuse as well (the stats describe a rewrite)
    val victim = folded.stats.select("file").head().getString(0)
    val vPath = new java.io.File(new java.net.URI(victim).getPath)
    assert(vPath.delete(), s"fixture: could not delete $vPath")
    val e2 = intercept[IllegalArgumentException] {
      folded.scan(spark, dir, Seq(("l_partkey", 0.0, 1e9)))
    }
    assert(e2.getMessage.contains("stale"))
  }

  test("save/load round-trips through the IndexArtifact layout") {
    val out = tmpDir("minmax-artifact")
    index.save(out)
    val loaded = MinMaxIndex.load(spark, out)
    assert(loaded.cols.toSet == Set("l_partkey", "l_suppkey"))
    val ranges = Seq(midQuarter("l_partkey"))
    assert(loaded.prunedFiles(ranges).toSet == index.prunedFiles(ranges).toSet)
  }
}
