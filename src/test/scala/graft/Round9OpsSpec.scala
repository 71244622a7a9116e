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

  test("PrefixSum.exclusivePrefix equals the sequential scan on sparse keys across many bins") {
    import graft.operators.PrefixSum
    // sparse non-contiguous keys, values with repeats, more rows than
    // partitions so bins really split
    val rows = (0 until 1000).map(i => (i.toLong * 7 + (i % 3), (i % 17).toLong + 1))
    val got = PrefixSum.exclusivePrefix(rows.toDS().repartition(13), 8)
      .collect().sortBy(_._1)
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (k, v) =>
      val e = (k, v, acc); acc += v; e
    }
    assert(got.toSeq == expected)
    // empty input stays empty, no job failure
    assert(PrefixSum.exclusivePrefix(Seq.empty[(Long, Long)].toDS(), 8).count() == 0L)
  }

  test("shardPack: offsets stay under the budget, shards cut exactly at the byte prefix") {
    val rows = TextQueries.shardPack(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.nonEmpty)
    var prefix = 0L
    rows.foreach { case (id, nb, shard, off) =>
      assert(shard == prefix / 65536L, s"doc $id shard")
      assert(off == prefix % 65536L, s"doc $id offset")
      assert(off >= 0 && off < 65536L)
      prefix += nb
    }
    // manifest is the exact per-shard rollup of the pack
    val manifest = TextQueries.shardManifest(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val byShard = rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (s, rs) =>
      (s, rs.size.toLong, rs.map(_._2).sum, rs.map(_._1).min, rs.map(_._1).max)
    }
    assert(manifest == byShard)
  }

  test("dimStats: a constant dimension reads zero variance, moments match direct computation") {
    val dir = tmpDir("r9-dimstats")
    // dim 1 constant 0.5; dim 2 alternates ±0.25
    val vecs = (0L until 8L).map { i =>
      (i, Array(0.5f, if (i % 2 == 0) 0.25f else -0.25f), 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.dimStats(spark, dir)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, m1, v1, mn1, mx1) = got(1L)
    assert(m1 == 0.5 && v1 == 0.0 && mn1 == 0.5 && mx1 == 0.5)
    val (_, m2, v2, mn2, mx2) = got(2L)
    assert(m2 == 0.0 && mn2 == -0.25 && mx2 == 0.25)
    assert(math.abs(v2 - 0.0625) < 1e-9)
  }

  test("cellReps: one rep per cell, rep belongs to its cell, members partition the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val reps = SimilarityQueries.cellReps(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(reps.nonEmpty)
    assert(reps.map(_._1).distinct.size == reps.size)
    assert(reps.map(_._3).sum == emb.count())
    // the rep's cosine is within [-1, 1] + rounding slack
    reps.foreach { case (cell, rep, n, cos) =>
      assert(n >= 1, s"cell $cell")
      assert(cos <= 1.0 + 1e-6 && cos >= -1.0 - 1e-6, s"cell $cell rep $rep cos $cos")
    }
    // purity and reps agree on the membership census
    val purity = SimilarityQueries.clusterPurity(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(reps.map(r => (r._1, r._3)).sorted == purity.map(p => (p._1, p._2)).sorted)
  }

  test("sourceOverlap: identical sources read jaccard 1, disjoint sources are omitted") {
    val dir = tmpDir("r9-srcoverlap")
    Seq(
      (0L, "a b c d e f", "en", "mirror1", 11L),
      (1L, "a b c d e f", "en", "mirror2", 11L),
      (2L, "q r s t u v", "en", "alone", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.sourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only the mirror pair overlaps; 'alone' shares nothing and is absent
    assert(got == Seq(("mirror1", "mirror2", 4L, 4L, 4L, 1.0)))
  }

  test("sourceOverlap: jaccard bounded by (0, 1], symmetric grain, totals consistent") {
    val rows = TextQueries.sourceOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b, s"$a/$b must be the upper triangle")
      assert(shared >= 1 && shared <= math.min(na, nb), s"$a/$b counts")
      assert(j > 0.0 && j <= 1.0, s"$a/$b jaccard $j")
    }
    // each source's total must be reported identically in every pair
    val totals = rows.flatMap { case (a, b, _, na, nb, _) => Seq(a -> na, b -> nb) }
    totals.groupBy(_._1).foreach { case (s, ts) =>
      assert(ts.map(_._2).distinct.size == 1, s"source $s total inconsistent")
    }
  }

  test("matryoshkaEval: overlap in [0, 10], both truncations per query, more dims never hurts on average") {
    val rows = SimilarityQueries.matryoshkaEval(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_._1)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == Seq(16L, 32L), s"query $q dims")
      rs.foreach { case (_, d, o) => assert(o >= 0 && o <= 10, s"query $q d$d overlap $o") }
    }
    // 32 dims should recover at least as much of the 64-dim top-10 as
    // 16 dims in aggregate (prefix information is nested)
    val o16 = rows.filter(_._2 == 16L).map(_._3).sum
    val o32 = rows.filter(_._2 == 32L).map(_._3).sum
    assert(o32 >= o16, s"aggregate overlap should not drop with more dims: 16->$o16 32->$o32")
  }

  test("bucketStats: four bands, internally consistent counts, and a planted flood collides") {
    val rows = TextQueries.bucketStats(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L))
    val nDocs = rows.map(_._2).distinct
    assert(nDocs.size == 1, "every band sees the same gram-bearing docs")
    rows.foreach { case (band, n, buckets, mx, cb, cd) =>
      assert(buckets <= n && mx >= 1 && mx <= n, s"band $band")
      assert(cd >= 2 * cb || cb == 0, s"band $band colliding docs vs buckets")
      assert(n - cd == buckets - cb, s"band $band singleton identity")
    }
    // a corpus of one text repeated floods every band into one bucket
    val dir = tmpDir("r9-bucketflood")
    (0L until 20L).map(i => (i, "spark joins the fast table scan", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextQueries.bucketStats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().foreach {
        case (band, n, buckets, mx, cb, cd) =>
          assert(n == 20L && buckets == 1L && mx == 20L && cb == 1L && cd == 20L,
            s"band $band should be one flooded bucket")
      }
  }

  test("binaryQuantEval: overlap in [0, 10], hamming at rank 1 in [0, 64], exact binary copy wins") {
    val rows = SimilarityQueries.binaryQuantEval(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (q, o, h1) =>
      assert(o >= 0 && o <= 10, s"query $q overlap $o")
      assert(h1 >= 0 && h1 <= 64, s"query $q ham_at_1 $h1")
    }
    // planted: corpus vector with the same sign pattern as a query has
    // hamming 0 and must be the hamming rank-1
    val dir = tmpDir("r9-binquant")
    val dim = 64
    def pat(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => if ((i + seed) % 3 == 0) 0.5f else -0.5f)
    val bench = (0L until 10L).map(i => (i, pat(i.toInt), 0))
    val corpus = Seq((100L, pat(0).map(_ * 2.0f), 0), (101L, pat(1), 1))
    (bench ++ corpus).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.binaryQuantEval(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(0L) == 0L, "query 0 has an exact sign copy in the corpus")
    assert(got(1L) == 0L, "query 1 has an exact sign copy in the corpus")
  }

  test("mediaFrameDedup: census identities hold, planted shared frames collide, empty payloads add nothing") {
    val rows = TextQueries.mediaFrameDedup(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 1)
    val (n, distinct, dups, mx) = rows.head
    assert(n >= distinct && dups == n - distinct && mx >= 1)
    // two payloads sharing their first 64 bytes collide on frame 0;
    // an empty payload contributes no frames (and no phantom ones)
    val dir = tmpDir("r9-framededup")
    val shared = "x" * 64
    Seq((0L, shared + "tailA", "en", "s", 69L),
      (1L, shared + "tailB-different", "en", "s", 79L),
      (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (n2, d2, dup2, mx2) = TextQueries.mediaFrameDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    // doc0: frames [64B shared][5B tail]; doc1: [64B shared][15B tail]
    assert(n2 == 4L && d2 == 3L && dup2 == 1L && mx2 == 2L,
      s"got n=$n2 distinct=$d2 dups=$dup2 max=$mx2")
  }

  test("dataCard: rates bounded, dominant lang dominates, planted dup corpus reads its rates") {
    val rows = TextQueries.dataCard(spark, sf)
      .as[(String, Long, Long, Double, Double, String, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (s, n, t, dup, short, _, share) =>
      assert(n > 0 && t >= 0, s)
      assert(dup >= 0.0 && dup < 1.0, s"$s dup_rate $dup")
      assert(short >= 0.0 && short <= 1.0, s"$s short_rate $short")
      assert(share > 0.0 && share <= 1.0, s"$s top_lang_share $share")
    }
    val dir = tmpDir("r9-datacard")
    Seq(
      (0L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen", "en", "s", 50L),
      (1L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen", "en", "s", 50L),
      (2L, "short doc", "de", "s", 9L),
      (3L, "another short", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (s, n, t, dup, short, topLang, share) = TextQueries.dataCard(spark, dir)
      .as[(String, Long, Long, Double, Double, String, Double)].collect().head
    assert(s == "s" && n == 4L && t == 15L + 15L + 2L + 2L)
    assert(dup == 0.25)            // one exact dup among four
    assert(short == 0.5)           // two docs under 15 tokens
    assert(topLang == "en" && share == 0.75)
  }

  test("ivfRecallCurve: recall is monotone in nprobe and saturates at full width") {
    val rows = SimilarityQueries.ivfRecallCurve(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byNp = rs.map(r => r._2 -> r._3).toMap
      assert(byNp.keySet == Set(1L, 2L, 4L, 8L), s"query $q widths")
      byNp.values.foreach(o => assert(o >= 0 && o <= 5, s"query $q overlap"))
      // widening the probe can only add candidates: overlap with the
      // fixed baseline top-5 is monotone non-decreasing in nprobe
      assert(byNp(1L) <= byNp(2L) && byNp(2L) <= byNp(4L) && byNp(4L) <= byNp(8L),
        s"query $q: ${byNp.toSeq.sorted}")
    }
  }

  test("resampleInterpolate: observed hours exact, interior gap takes the straight line") {
    import graft.queries.AnalyticsQueries
    // crafted events: user 1 observed at hours 0 and 3 (values 10, 40)
    // with a 2-hour interior gap -> interpolated 20, 30
    val dir = tmpDir("r9-interp")
    val h = 3600000L * 1000000L // hour in the parquet's nanos
    Seq(
      (1L, 0L * h, 1L, "a", 10.0, "{}"),
      (2L, 3L * h, 1L, "a", 40.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.resampleInterpolate(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      (1L, 0L, 1L, 1L, 10.0),
      (1L, 3600000L, 0L, 0L, 20.0),
      (1L, 7200000L, 0L, 0L, 30.0),
      (1L, 10800000L, 1L, 1L, 40.0)), got.toString)
    // on the real table: observed rows match ffill's filled value and
    // every interpolated value sits within its anchors' range
    val sf01 = sf
    val interp = AnalyticsQueries.resampleInterpolate(spark, sf01)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(interp.nonEmpty && interp.forall(r => !r._5.isNaN))
  }

  test("pqDistortion: codes partition the corpus per subspace, mse non-negative") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    val rows = SimilarityQueries.pqDistortion(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._3).sum == n, s"subspace $s members")
      assert(rs.map(_._2).distinct.size == rs.size, s"subspace $s code dup")
    }
    rows.foreach { case (s, c, nv, mse) =>
      assert(nv > 0 && mse >= 0.0, s"subspace $s code $c mse $mse")
    }
    assert(rows.map(_._1).distinct.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("dupSpectrum: df histogram identities, 11+ bucket absorbs a planted flood") {
    val rows = TextQueries.dupSpectrum(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 1 && r._1 <= 11))
    rows.filter(_._1 < 11).foreach { case (m, g, occ) =>
      assert(occ == m * g, s"bucket $m occurrence identity")
    }
    rows.filter(_._1 == 11).foreach { case (_, g, occ) =>
      assert(occ >= 11 * g, "11+ bucket mass")
    }
    // 20 copies of one text: every gram has df 20 -> all mass in 11+
    val dir = tmpDir("r9-spectrum")
    (0L until 20L).map(i => (i, "the quick brown fox jumps high", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val flood = TextQueries.dupSpectrum(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(flood == Seq((11L, 4L, 80L)), flood.toString)
  }

  test("trendTypes: early+late partition every type, shares bounded") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.trendTypes(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, e, l, share) =>
      assert(e + l == n && e >= 0 && l >= 0, s"type $t partition")
      assert(share >= 0.0 && share <= 1.0, s"type $t share $share")
    }
  }

  test("typeTransitions: probabilities normalize per from-type, pair count = events - users") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.typeTransitions(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val total = rs.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-4, s"from $from sums to $total")
    }
    // every consecutive pair within a user contributes exactly once
    val ev = graft.model.Tables.pq(spark, sf, "events")
    val expectedPairs = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expectedPairs)
  }

  test("hybridRrf: ranked top-5 per query, scores in RRF range, deterministic") {
    val rows = SimilarityQueries.hybridRrf(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == (1 to rs.size), s"query $q ranks")
      // max possible: rank 1 on both lists = 2/61; min: rank 50 on one
      rs.foreach { case (_, _, d, s) =>
        assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-9, s"query $q doc $d score $s")
        assert(d >= 10L, s"query $q must not retrieve a query id")
      }
      val sorted = rs.sortBy(_._2).map(_._4)
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"query $q fused score must be non-increasing with rank")
    }
    // determinism across runs
    val again = SimilarityQueries.hybridRrf(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows == again)
  }

  test("annFiltered: every neighbor shares its query's label, never beats the unfiltered top") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qLabels = emb.filter(col("vec_id") < 10)
      .select("vec_id", "label").as[(Long, Int)].collect()
      .map { case (id, l) => id -> l.toLong }.toMap
    val rows = SimilarityQueries.annFiltered(spark, sf)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, n, l, _) =>
      assert(l == qLabels(q), s"query $q neighbor $n label $l")
      assert(n >= 10L)
    }
    // the filtered rank-1 cosine can never exceed the unfiltered rank-1
    val unfiltered = SimilarityQueries.annTopK(spark, sf)
      .filter(col("rnk") === 1)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    rows.filter(_._2 == 1).foreach { case (q, _, _, _, cos) =>
      unfiltered.get(q).foreach(u => assert(cos <= u + 1e-9, s"query $q: $cos > $u"))
    }
  }
}
