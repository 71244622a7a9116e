package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions.col

/** Durable IVF index (round-8 verdict task 4): the vectors frame is
  * hive-partitioned by cell so probes prune files, and the probe's
  * answer must match a driver-side brute-force over exactly the probed
  * cells — i.e. the physical layout changes I/O, never results.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"${SparkSuite.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private lazy val artifactPath: String = {
    val out = tmpDir("ivf-index")
    SimilarityQueries.buildIvfIndex(emb).save(out)
    out
  }

  test("artifact layout: vectors land under cell=N hive partitions") {
    val vecDir = new java.io.File(s"$artifactPath/vectors")
    val cells = vecDir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(cells.nonEmpty && cells.forall(_.startsWith("cell=")),
      s"expected cell=N partition dirs, got ${cells.mkString(",")}")
    // every trained cell that kept members has a partition directory
    assert(cells.length > 1, "a single partition would mean no pruning to win")
  }

  test("probe from the loaded artifact matches brute force over the probed cells") {
    val index = SimilarityQueries.IvfIndex.load(spark, artifactPath)
    val got = SimilarityQueries.probeIvfIndex(index, queries)
      .as[(Long, Long, Long, Double)].collect().toSeq

    // driver-side expectation: same centroids, same nprobe/k rules
    def widen(e: Seq[Float]): Array[Double] = e.map(_.toDouble).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cents = index.centroids.select("cell", "centroid", "cnorm")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    val members = index.vectors
      .select(col("cell").cast("long"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
      .map { case (c, id, e) => (c, id, widen(e)) }
    val qs = queries.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map { case (id, e) => (id, widen(e)) }
      .filter { case (_, v) => norm(v) > 0.0 }
    val expected = qs.flatMap { case (qid, qv) =>
      val qn = norm(qv)
      val cells = cents
        .map { case (cell, c, cn) => (cell, dot(qv, c) / (qn * cn)) }
        .sortBy { case (cell, cos) => (-cos, cell) }.take(4).map(_._1).toSet
      members
        .filter { case (c, id, v) => cells(c) && id != qid && norm(v) > 0.0 }
        .map { case (_, id, v) => (id, dot(qv, v) / (qn * norm(v))) }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(5).zipWithIndex
        .map { case ((id, cos), i) =>
          (qid, (i + 1).toLong, id,
            BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("probe scan prunes partitions: PartitionFilters carries the cell literals") {
    val index = SimilarityQueries.IvfIndex.load(spark, artifactPath)
    val plan = SimilarityQueries.probeIvfIndex(index, queries)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe must filter on the partition column at the scan:\n$plan")
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"expected an IN/INSET filter over probe cells in PartitionFilters:\n$plan")
    // a pruned scan never lists the whole index: the probe reads fewer
    // partition directories than the artifact holds
    val total = new java.io.File(s"$artifactPath/vectors")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("cell="))
    val exec = SimilarityQueries.probeIvfIndex(index, queries)
      .queryExecution.executedPlan
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val probed = inner.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }
    assert(probed.nonEmpty && probed.head < total,
      s"probe should read < $total partitions, read ${probed.headOption}")
  }

  test("save/load round-trip is lossless: reloaded probe equals fresh probe") {
    val fresh = SimilarityQueries.buildIvfIndex(emb)
    val a = SimilarityQueries.probeIvfIndex(fresh, queries)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val b = SimilarityQueries.probeIvfIndex(
      SimilarityQueries.IvfIndex.load(spark, artifactPath), queries)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a == b)
  }
}
