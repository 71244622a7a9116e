package graft

import graft.queries.{SimilarityQueries, TextQueries}
import org.apache.spark.sql.functions.col

/** Semantics specs for the round-9 operators: temperature mixing,
  * word entropy, semantic decontamination, cluster purity, and the
  * oracle-gated durable-IVF probe.
  */
class Round9OpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = SparkSuite.sf0001

  test("temperatureMix: shares normalize and lower α flattens the mix") {
    val rows = TextQueries.temperatureMix(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    def sums(f: ((String, Long, Long, Double, Double, Double)) => Double) =
      rows.map(f).sum
    assert(math.abs(sums(_._4) - 1.0) < 1e-4)
    assert(math.abs(sums(_._5) - 1.0) < 1e-4)
    assert(math.abs(sums(_._6) - 1.0) < 1e-4)
    // α < 1 compresses the spread: the biggest source loses share, the
    // smallest gains, monotonically in α
    assert(rows.map(_._4).max >= rows.map(_._5).max)
    assert(rows.map(_._5).max >= rows.map(_._6).max)
    assert(rows.map(_._4).min <= rows.map(_._5).min)
    assert(rows.map(_._5).min <= rows.map(_._6).min)
  }

  test("wordEntropy: uniform corpus reads ln(vocab), constant corpus reads 0") {
    val dir = tmpDir("r9-entropy")
    Seq(
      (0L, "alpha beta gamma delta", "en", "uniform", 22L),
      (1L, "delta gamma beta alpha", "en", "uniform", 22L),
      (2L, "mono mono mono mono", "en", "constant", 19L),
      (3L, "mono mono", "en", "constant", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.wordEntropy(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nU, vU, hU) = got("uniform")
    assert(nU == 8L && vU == 4L)
    assert(math.abs(hU - math.log(4.0)) < 1e-6)
    val (_, nC, vC, hC) = got("constant")
    assert(nC == 6L && vC == 1L && hC == 0.0)
  }

  test("semanticDecontam flags a planted copy of a benchmark vector, not an orthogonal one") {
    val dir = tmpDir("r9-semdecontam")
    val dim = 64
    def unit(axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    val bench = (0L until 10L).map(i => (i, unit(i.toInt), i.toInt % 3))
    val corpus = Seq(
      (100L, unit(2), 0),  // exact copy of bench 2 -> cos 1.0
      (101L, unit(40), 1)) // orthogonal to every bench vector
    (bench ++ corpus).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.semanticDecontam(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((100L, 2L, 1.0)))
  }

  test("clusterPurity: members partition the corpus, purity in (0,1], majority from the label set") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val labels = emb.select("label").distinct().as[Int].collect().map(_.toLong).toSet
    val rows = SimilarityQueries.clusterPurity(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == emb.count())
    rows.foreach { case (cell, n, maj, p) =>
      assert(n > 0 && labels.contains(maj), s"cell $cell majority $maj")
      assert(p > 0.0 && p <= 1.0 + 1e-9, s"cell $cell purity $p")
      // the majority's count is p*n, which can't be beaten by an even
      // split of the rest across the remaining labels
      assert(p >= 1.0 / labels.size - 1e-6)
    }
  }

  test("annIvfProbe: ranked top-5 per query, self-free, deterministic") {
    val rows = SimilarityQueries.annIvfProbe(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length).toSeq, s"query $q ranks")
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"query $q cosine must be non-increasing with rank")
      assert(rs.forall(_._3 != q), s"query $q must not match itself")
    }
    val again = SimilarityQueries.annIvfProbe(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows == again)
  }
}
