package graft

import graft.queries.{SimilarityQueries, TextQueries}
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Specs for the LLM-pipeline operators (dedup / similarity / text /
  * multimodal) on the sf0.001 harness tables.
  */
class LlmOpsSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  test("minhash LSH reproduces exact n-gram Jaccard pairs (>= 0.8)") {
    val exact = TextQueries.ngramJaccard(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = TextQueries.minhashLsh(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dup pairs")
    assert(lsh == exact)
  }

  test("prefix-filtered jaccard join equals the exact inverted-index join") {
    val exact = TextQueries.ngramJaccard(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val pref = TextQueries.jaccardPrefixFiltered(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(pref == exact, "prefix filter must be lossless at the 0.8 threshold")
  }

  test("simhash finds planted near-dups with small hamming distance") {
    val planted = TextQueries.ngramJaccard(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sim = TextQueries.simhash(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // near-identical docs have near-identical simhashes; most planted
    // pairs (jaccard >= 0.8) must surface at hamming <= 6
    val found = planted.intersect(sim)
    assert(found.size >= planted.size / 2,
      s"simhash found only ${found.size} of ${planted.size} planted pairs")
  }

  test("wide simhash (128-bit) finds planted near-dups and stays hamming-bounded") {
    val planted = TextQueries.ngramJaccard(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val wide = TextQueries.simhashWide(spark, sf)
      .as[(Long, Long, Int)].collect()
    wide.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 7, s"bad pair ($a,$b,$h)")
    }
    val found = planted.intersect(wide.map(p => (p._1, p._2)).toSet)
    assert(found.size >= planted.size / 2,
      s"wide simhash found only ${found.size} of ${planted.size} planted pairs")
    // the scale property the gate exists for: 16-bit bands are ~256x
    // sparser than 8-bit ones, so the candidate surface must be a small
    // multiple of the true near-dup set, never bucket-quadratic
    val sim64 = TextQueries.simhash(spark, sf).count()
    assert(wide.length <= sim64 * 4 + 50,
      s"wide pair surface (${wide.length}) should not exceed the 64-bit gate's ($sim64) scale")
    // oversized-bucket fallback path agrees with the in-task expansion
    val viaJoin = TextQueries.simhashWideImpl(spark, sf, 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaJoin == wide.toSet, "fallback self-join must agree with grouped expansion")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = SimilarityQueries.embedNearDup(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.45 })
  }

  test("block-tiled all-pairs agrees with the single-block pass") {
    // blockRows = 97 forces ~5 quantile-bounded blocks at sf0.001; every
    // unordered pair must still be scored exactly once, in the block
    // owning its larger id, so the tiled union equals the one-shot pass.
    val single = SimilarityQueries.embedNearDup(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val tiled = SimilarityQueries.embedNearDupImpl(spark, sf, 97L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(single.nonEmpty)
    assert(tiled == single)
  }

  test("IVF ANN recall vs brute-force top-k") {
    val brute = SimilarityQueries.annTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityQueries.annIvf(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // nprobe=4 of 16 cells: expect meaningful overlap, not exactness
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall suspiciously low")
    assert(ivf.size == brute.size) // same k per query
  }

  test("PQ ANN: well-formed top-5 per query, deterministic across runs") {
    val rows = SimilarityQueries.annPq(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted == Seq(1, 2, 3, 4, 5), s"query $qid ranks")
      // ADC scores non-increasing down the ranking; self excluded
      val byRank = rs.sortBy(_._2)
      assert(byRank.sliding(2).forall { case Seq(a, b) => a._4 >= b._4 }, s"query $qid order")
      assert(rs.forall(_._3 != qid), s"query $qid scored itself")
    }
    // exact-integer Lloyd: a re-run trains identical codebooks and
    // returns the identical ranking, bit for bit
    val again = SimilarityQueries.annPq(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(again == rows)
  }

  test("decontamination flags only non-benchmark docs, with positive evidence") {
    val flagged = TextQueries.decontaminate(spark, sf)
      .as[(Long, Long)].collect()
    val benchIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0").select("doc_id").as[Long].collect().toSet
    assert(flagged.forall { case (id, n) => !benchIds.contains(id) && n > 0 })
  }

  test("repetition ratio is a [0,1) per-doc signal over 3-token-plus docs") {
    val reps = TextQueries.repetitionRatio(spark, sf)
      .select("doc_id", "rep_ratio").as[(Long, Double)].collect()
    assert(reps.nonEmpty)
    assert(reps.forall { case (_, r) => r >= 0.0 && r < 1.0 })
  }

  test("edit-distance verification covers exactly the near-dup pairs") {
    val exact = TextQueries.ngramJaccard(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val verified = TextQueries.editDistancePairs(spark, sf)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect()
    assert(verified.map(v => (v._1, v._2)).toSet == exact)
    // near-dup texts must be near in edit space too
    assert(verified.forall { case (_, _, s) => s >= 0.0 && s <= 1.0 })
  }

  test("corpus stats cover every source with consistent bounds") {
    val stats = TextQueries.corpusStats(spark, sf)
      .select("source", "n_docs", "min_chars", "max_chars").as[(String, Long, Long, Long)].collect()
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    assert(stats.length == nSources)
    assert(stats.forall { case (_, n, lo, hi) => n > 0 && lo <= hi })
  }

  test("stratified sample is deterministic and respects per-source rates") {
    val s1 = TextQueries.stratifiedSample(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = TextQueries.stratifiedSample(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "hash sampling must be reproducible run-to-run")
    assert(s1.nonEmpty && s1.size < 500)
  }

  test("clean corpus excludes benchmark source, dup losers, and contaminated docs") {
    val kept = TextQueries.cleanCorpus(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(kept.nonEmpty)
    assert(kept.forall(_._2 != "src0"))
    val contaminated = TextQueries.decontaminate(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.forall(k => !contaminated.contains(k._1)))
    val survivors = TextQueries.dedupKeep(spark, sf)
      .select("keep_id").as[Long].collect().toSet
    assert(kept.forall(k => survivors.contains(k._1)))
  }

  test("language-id predictions are deterministic and cover all docs") {
    val out = TextQueries.langId(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select("pred_lang").distinct().as[String].collect()
      .forall(Set("en", "de", "fr", "es")))
  }

  test("media pipeline: binary payloads featurize per-partition, deterministically") {
    val media = MediaPipeline.mediaFromDocuments(spark, sf)
    val feats = MediaPipeline.decodeAndFeaturize(media, parallelism = 4)
    val a = feats.collect().sortBy(_.docId)
    val b = MediaPipeline.decodeAndFeaturize(media, parallelism = 2).collect().sortBy(_.docId)
    assert(a.length == media.count())
    assert(a.toSeq == b.toSeq) // partitioning must not change results
    assert(a.forall(f => f.nBytes > 0 && f.width > 0 && f.height > 0))
  }

  test("fingerprint equals md5 of normalized text") {
    val one = TextQueries.fingerprints(spark, sf).limit(1).as[(Long, String)].head()
    val txt = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === one._1).select("text").as[String].head()
    val norm = txt.trim.replaceAll("\\s+", " ").toLowerCase
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one._2 == md)
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val exact = TextQueries.decontaminate(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val bloom = TextQueries.decontaminateBloom(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact, "the exact join must remove every bloom false positive")
  }

  test("LSH ANN agrees with exact cosine where they overlap, ranks correctly") {
    val lsh = SimilarityQueries.annLsh(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // per-query ranks are 1..n with non-increasing scores
    lsh.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._4 >= w(1)._4))
    }
    // any (query, neighbor) also in the exact top-5 carries the same cosine
    val exact = SimilarityQueries.annTopK(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    val shared = lsh.filter(r => exact.contains((r._1, r._3)))
    assert(shared.nonEmpty, "bucketed candidates should recover some exact top-5 hits")
    assert(shared.forall(r => exact((r._1, r._3)) == r._4))
  }

  test("kNN classify replays the majority vote over the exact top-5") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val expected = SimilarityQueries.annTopK(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rows) =>
        val votes = rows.map(r => labels(r._3)).groupBy(identity)
          .map { case (l, xs) => (l, xs.length) }
        q -> votes.toSeq.minBy { case (l, n) => (-n, l) }
      }
    val got = SimilarityQueries.knnClassify(spark, sf)
      .as[(Long, Int, Long)].collect()
    assert(got.length == expected.size)
    assert(got.forall { case (q, l, n) => expected(q) == ((l, n.toInt)) })
  }

  test("df-prune keeps non-frequent tokens verbatim; frequent terms vanish") {
    val out = TextQueries.dfPrune(spark, sf)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docsRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docsRows.length
    val df = docsRows.flatMap { case (_, t) => t.trim.split(" ", -1).distinct }
      .groupBy(identity).map { case (t, xs) => (t, xs.length) }
    val deny = df.filter(_._2 > n * 0.5).keySet
    assert(deny.nonEmpty, "corpus vocabulary should contain frequent terms")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docsRows.foreach { case (id, t) =>
      val kept = t.trim.split(" ", -1).filterNot(deny)
      val (nKept, fp) = out(id)
      assert(nKept == kept.length, s"doc $id kept-count")
      assert(fp == md5hex(kept.mkString(" ")), s"doc $id pruned fingerprint")
    }
  }

  test("sequence packing is the per-source prefix sum, offsets within budget") {
    val out = TextQueries.packSequences(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.forall { case (_, _, _, pid, off) => pid >= 0 && off >= 0 && off < 2048 })
    out.groupBy(_._2).values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, nTok, pid, off) =>
        assert(pid == cum / 2048 && off == cum % 2048)
        cum += nTok
      }
    }
  }

  test("mix order interleaves sources proportionally to their weights") {
    val out = TextQueries.mixOrder(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect()
    // per source, rn is 1..count and mix_key replays the integer formula
    out.groupBy(_._2).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length))
      sorted.foreach { case (_, _, rn, w, key) => assert(key == (rn - 1) * 3 / w) }
    }
    // proportionality: within any prefix of the global order, a weight-3
    // source has emitted ~3x the docs of a weight-1 source (±1 quantum),
    // until one of them is exhausted
    val ordered = out.sortBy(r => (r._5, r._2, r._1))
    val w3 = ordered.filter(_._4 == 3L).map(_._2).headOption
    val w1 = ordered.filter(_._4 == 1L).map(_._2).headOption
    (w3, w1) match {
      case (Some(s3), Some(s1)) =>
        val n3 = ordered.count(_._2 == s3)
        val n1 = ordered.count(_._2 == s1)
        var c3 = 0; var c1 = 0; var checked = false
        ordered.foreach { r =>
          if (r._2 == s3) c3 += 1
          if (r._2 == s1) c1 += 1
          if (c3 < n3 && c1 < n1 && c1 > 0) {
            checked = true
            assert(c3 >= 3 * c1 - 3 && c3 <= 3 * c1 + 3,
              s"interleave ratio drifted: $c3 vs $c1")
          }
        }
        assert(checked)
      case _ => fail("expected both weight classes present")
    }
  }

  test("redaction replays Java regex replacement exactly") {
    val out = TextQueries.redact(spark, sf)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rx = "\\b(customer|key|value)\\b"
    val docsRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    var masked = 0L
    docsRows.foreach { case (id, t) =>
      val red = t.replaceAll(rx, "<MASK>")
      val nm = rx.r.findAllIn(t).length
      val (_, gotN, gotLen, gotMd5) = out(id)
      assert(gotN == nm && gotLen == red.length && gotMd5 == md5hex(red))
      masked += nm
    }
    assert(masked > 0, "deny-list terms should occur in the corpus")
  }

  test("approx quantiles land within 2% RANK of exact (sketch returns samples)") {
    import graft.queries.AnalyticsQueries
    // rank-based tolerance: the sketch returns an actual sample, so its
    // VALUE can sit far from the interpolated exact quantile wherever
    // adjacent order statistics are far apart (tail of a small group) —
    // correctness means its rank is within the summary's rank error.
    val values = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val approx = AnalyticsQueries.approxQuantiles(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (tpe, n, p50, p90, p99) =>
      val sorted = values(tpe)
      assert(n == sorted.length.toLong)
      Seq((0.50, p50), (0.90, p90), (0.99, p99)).foreach { case (q, a) =>
        val rank = sorted.count(_ <= a).toDouble / sorted.length
        assert(math.abs(rank - q) <= 0.02 + 1.0 / sorted.length,
          s"$tpe p$q: approx $a has rank $rank")
      }
    }
  }

  test("HLL approx distinct lands within 5% of exact (its stated rsd x5)") {
    val rows = graft.queries.AnalyticsQueries.approxDistinctUsers(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, exact, approx) =>
      assert(math.abs(approx - exact).toDouble <= math.max(1.0, 0.05 * exact),
        s"$tpe: approx $approx too far from exact $exact")
    }
  }

  test("pca projection replays the quantized power iteration driver-side") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val dims = 64
    val q = raw.map { case (_, v) => v.map(x => math.floor(x.toDouble * 1048576.0)) }
    val n = q.length
    val means = Array.tabulate(dims)(i => q.map(_(i)).sum / n)
    val c = q.map(row => Array.tabulate(dims)(i => row(i) - means(i)))
    def step(v: Array[Double]): Array[Double] = {
      val acc = Array.fill(dims)(JBD.ZERO)
      c.foreach { row =>
        var y = 0.0
        var i = 0
        while (i < dims) { y += row(i) * v(i); i += 1 }
        i = 0
        while (i < dims) {
          // valueOf (Double.toString repr) matches Spark's round-on-double
          acc(i) = acc(i).add(JBD.valueOf(y * row(i)).setScale(6, RoundingMode.HALF_UP))
          i += 1
        }
      }
      acc.map(_.doubleValue / 1099511627776.0)
    }
    val v2 = step(step(Array.fill(dims)(1.0)))
    val norm = math.sqrt(v2.foldLeft(0.0)((a, x) => a + x * x))
    val expect = raw.map(_._1).zip(c.map { row =>
      var d = 0.0
      var i = 0
      while (i < dims) { d += row(i) * v2(i); i += 1 }
      BigDecimal(d / norm / 1048576.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }).toMap
    val got = graft.queries.SimilarityQueries.pcaProject(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, p) =>
      assert(math.abs(p - expect(id)) < 2e-6, s"vec $id: $p vs ${expect(id)}")
    }
    // the projection is a real spread, not a degenerate constant
    assert(got.values.max - got.values.min > 1e-3, "pc1 collapsed to a constant")
  }

  test("hard negatives: wrong label only, complete per query, ranked by cosine") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val hn = SimilarityQueries.hardNegatives(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(hn.length == 50, s"10 queries x top-5, got ${hn.length}")
    hn.foreach { case (q, _, n, nl, _) =>
      assert(labels(n) == nl, s"neighbor $n label mislabeled")
      assert(nl != labels(q), s"pair ($q, $n) shares label $nl")
      assert(n != q)
    }
    hn.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cos_sim must be non-increasing in rank")
    }
  }

  test("split leak equals near-dup pairs straddling the hash split") {
    val splits = TextQueries.splitAssign(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val pairs = TextQueries.minhashLsh(spark, sf)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val leaks = TextQueries.splitLeak(spark, sf)
      .as[(Long, String, Long, String, Double)].collect()
    leaks.foreach { case (a, s1, b, s2, _) =>
      assert(splits(a) == s1 && splits(b) == s2 && s1 != s2, s"bad leak row ($a,$b)")
      assert(pairs((a, b)), s"($a,$b) not a near-dup pair")
    }
    val expected = pairs.filter { case (a, b) => splits(a) != splits(b) }
    assert(leaks.map(l => (l._1, l._3)).toSet == expected)
    assert(expected.nonEmpty, "fixture should plant at least one straddling pair")
  }

  test("token-budget selection equals the naive global-window form across budgets") {
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        size(split(trim($"text"), " ")).cast("long").as("n_tokens"),
        round(size(regexp_extract_all($"text", lit("[a-zA-Z]"), lit(0)))
          .cast("double") / $"n_chars", 6).as("q"))
      .as[(Long, Long, Double)].collect()
    val ordered = scored.sortBy { case (id, _, q) => (-q, id) }
    val total = scored.map(_._2).sum
    for (budget <- Seq(0L, scored.map(_._2).min - 1, 137L, 5000L, total, total + 5)) {
      var cum = 0L
      val expect = ordered.iterator.map { case (id, t, q) =>
        cum += t; (id, q, t, cum)
      }.takeWhile(_._4 <= budget).toSeq.sortBy(_._1)
      val got = TextQueries.tokenBudgetSelectImpl(spark, sf, budget)
        .as[(Long, Double, Long, Long)].collect().toSeq
      assert(got == expect, s"budget $budget: ${got.length} vs ${expect.length} docs")
    }
  }
}
