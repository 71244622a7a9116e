package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.queries.SimilarityQueries

/** Degenerate-corpus bounds for the semantic-dedup family: a corpus of
  * ALL-IDENTICAL embeddings floods every clustering scheme's densest
  * cell (no k, however derived, can split byte-identical vectors), so
  * it is the worst case for any within-cell pair join. The exact-
  * duplicate collapse must reduce it to ONE representative and ZERO
  * rep pairs — these tests assert both the exact output and, via the
  * executed plan's join metrics, that no join ever materialized a
  * corpus-quadratic row count.
  */
class DegenerateSpec extends SparkSuite {
  import spark.implicits._

  private val n = 3000

  /** embeddings.parquet with `n` byte-identical 64-dim vectors. */
  private lazy val dir: String = {
    val d = tmpDir("degenerate-emb")
    val v = Array.tabulate(64)(i => 0.125f * ((i % 8) + 1))
    (0 until n).map(i => (i.toLong, v, i % 3))
      .toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Sum of output rows over every join node actually executed (AQE
    * final plan, subqueries included). */
  private def joinOutputRows(df: DataFrame): Long = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def rows(p: SparkPlan): Long = {
      val here = unwrap(p)
      val own =
        if (here.nodeName.contains("Join"))
          here.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        else 0L
      own + here.children.map(rows).sum
    }
    rows(df.queryExecution.executedPlan)
  }

  test("semDedup on an all-identical corpus: linear output, no quadratic join") {
    val df = SimilarityQueries.semDedup(spark, dir)
    val out = df.collect()
    // every vector except id 0 is kept by id 0 at self-cosine 1.0
    assert(out.length === n - 1)
    assert(out.forall(r => r.getAs[Long]("kept_by") == 0L))
    assert(out.forall(r => math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9))
    // one rep, zero rep pairs: the only join rows are the n-1 members
    // meeting their own rep's self-candidate (plus metadata-scale
    // centroid traffic) — nowhere near the n*(n-1)/2 a naive
    // within-cell pair join would materialize
    val joined = joinOutputRows(df)
    assert(joined < 4L * n,
      s"pair term not bounded: $joined join rows for $n identical vectors")
  }

  test("semDedupIncremental on an all-identical corpus stays linear") {
    val df = SimilarityQueries.semDedupIncremental(spark, dir)
    val out = df.collect()
    // new batch = ids % 7 == 0; corpus min id (and thus sole rep) is 1
    val expected = (0 until n).count(_ % 7 == 0)
    assert(out.length === expected)
    assert(out.forall(r => r.getAs[Long]("kept_by") == 1L))
    val joined = joinOutputRows(df)
    assert(joined < 4L * n,
      s"pair term not bounded: $joined join rows for $n identical vectors")
  }

  test("semDedupCellCount grows with the corpus, floored at 16") {
    assert(SimilarityQueries.semDedupCellCount(1L) === 16L)
    assert(SimilarityQueries.semDedupCellCount(500L) === 16L)
    assert(SimilarityQueries.semDedupCellCount(16384L) === 16L)
    assert(SimilarityQueries.semDedupCellCount(16385L) === 17L)
    assert(SimilarityQueries.semDedupCellCount(1000000L) === 977L)
    // the paper's regime: tens of thousands of cells at web scale
    assert(SimilarityQueries.semDedupCellCount(100000000L) === 97657L)
  }

  test("clusterSample on identical vectors: one cell, exactly the budget, hash-ranked") {
    // all vectors land in one cell -> quota = ceil(budget * n/n) = budget;
    // rank must follow the md5-of-id order, reproducibly
    val rows = SimilarityQueries.clusterSampleN(spark, dir, budget = 100L)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 100)
    assert(rows.map(_._2).distinct.length === 1, "identical vectors must share a cell")
    assert(rows.forall(_._3 == n.toLong))
    assert(rows.map(_._4).sorted.toSeq == (1L to 100L))
    val expected = (0 until n).map(_.toLong)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .take(100)
    assert(rows.sortBy(_._4).map(_._1).toSeq == expected,
      "sample must follow the deterministic md5 rank")
  }

  test("labelDrift on identical vectors reports cosine 1.0 for every label") {
    // every label centroid equals the corpus centroid exactly (integer
    // sums of identical quantized vectors), so drift must read 1.0
    val rows = SimilarityQueries.labelDrift(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_._2).sum === n.toLong)
    rows.foreach { case (l, _, c) => assert(c === 1.0, s"label $l drifted: $c") }
  }

  test("clusterPurity on identical vectors: one flooded cell, purity = majority share") {
    val rows = SimilarityQueries.clusterPurity(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.size == 1, s"identical vectors must collapse to one cell: $rows")
    val (_, members, maj, purity) = rows.head
    assert(members == n.toLong)
    // labels cycle 0,1,2 evenly; the count tie breaks to the lowest label
    assert(maj == 0L && purity == 0.333333)
  }

  test("cellReps on identical vectors: one rep, the lowest id, at cosine 1") {
    val rows = SimilarityQueries.cellReps(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.size == 1)
    val (_, repId, members, cos) = rows.head
    assert(repId == 0L && members == n.toLong && cos == 1.0)
  }

  test("binaryQuantEval on identical vectors: full overlap at hamming zero") {
    val rows = SimilarityQueries.binaryQuantEval(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == (0L to 9L))
    rows.foreach { case (q, overlap, ham1) =>
      assert(overlap == 10L && ham1 == 0L, s"query $q: $overlap/$ham1")
    }
  }

  test("ivfRecallCurve on identical vectors: every probe width already has full recall") {
    val rows = SimilarityQueries.ivfRecallCurve(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (q, np, overlap) =>
      assert(overlap == 5L, s"query $q nprobe $np overlap $overlap")
    }
  }

  test("sourceOverlap on a single-source corpus is empty, not an error") {
    import graft.queries.TextQueries
    val d = tmpDir("degenerate-one-source")
    Seq((0L, "alpha beta gamma delta", "en", "only", 22L),
      (1L, "beta gamma delta epsilon", "en", "only", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(TextQueries.sourceOverlap(spark, d).count() == 0L)
  }

  test("pplBuckets' driver histogram bound is explicit, with a fallback message") {
    import graft.queries.TextQueries
    // under the cap: fine; over: a loud error naming the coarser-grid /
    // sketch fallback instead of a silent driver OOM on the collect
    TextQueries.requireHistBounded(2000000L)
    val e = intercept[IllegalArgumentException] {
      TextQueries.requireHistBounded(2000001L)
    }
    assert(e.getMessage.contains("coarsen") && e.getMessage.contains("sketch"))
  }
}
