package graft

import graft.functions.{MinHashAggregator, MinHashBandAggregator, SimHashAggregator, WordNGrams}
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Specs for the native n-gram expression, the fused signature
  * aggregators, and the round-2 dedup queries (survivors, clusters,
  * vocabulary).
  */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  private def refNgrams(text: String, n: Int): Seq[String] =
    text.trim.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSeq.distinct

  test("tokens_in_set equals the interpreted HOF form it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val set = Seq("the", "a", "of")
    val texts = Seq(
      "the cat of a hat the end",
      "no stopwords here",
      "the the the",
      "",           // split(trim) -> [""]
      "a  of")      // doubled space -> empty token in between
    val df = texts.toDF("text")
    val arr = array(set.map(lit): _*)
    val rows = df.select(
      graft.functions.TextFunctions.tokensInSet(split(trim(col("text")), " "), set).as("native"),
      size(filter(split(trim(col("text")), " "), t => array_contains(arr, t))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // codegen plan: the native expression, no interpreted lambda filter
    val plan = df.select(
      graft.functions.TextFunctions.tokensInSet(split(trim(col("text")), " "), set))
      .queryExecution.executedPlan.toString
    assert(plan.contains("tokens_in_set"), plan)
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("word_ngrams matches split+sliding reference, incl. edge cases") {
    val cases = Seq(
      "the quick brown fox jumps",
      "a  doubled  space keeps empty tokens",
      "  leading and trailing  ",
      "né häl—lo ünï code",
      "one two",   // shorter than n
      "one",
      "",
      "tab\tinside stays one-token here")
    cases.foreach { s =>
      val got = WordNGrams.ngrams(UTF8String.fromString(s), 3)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == refNgrams(s, 3), s"mismatch for '$s'")
    }
  }

  test("word_ngrams via the DataFrame API (codegen path) de-dups per row") {
    val df = Seq("a b a b a b", "x y z").toDF("text")
      .select(WordNGrams.word_ngrams(col("text"), 2).as("g"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b", "b a"))
    assert(rows(1) == Seq("x y", "y z"))
  }

  test("band aggregator finish equals hashing the plain signature slices") {
    val sig = MinHashAggregator.reduce(MinHashAggregator.zero, 0x12345L)
    val banded = MinHashBandAggregator.finish(sig.clone())
    assert(banded.length == MinHashBandAggregator.NumBands)
    // identical signatures band identically; a perturbed signature
    // changes exactly the band containing the perturbed slot
    val sig2 = sig.clone(); sig2(5) ^= 1L
    val banded2 = MinHashBandAggregator.finish(sig2)
    val diff = banded.indices.filter(i => banded(i) != banded2(i))
    assert(diff == Seq(5 / MinHashBandAggregator.RowsPerBand))
  }

  test("simhash aggregator: identical streams agree, sign rule holds") {
    val a = Seq(0x0fL, 0xf0L, 0x0fL).foldLeft(SimHashAggregator.zero)(SimHashAggregator.reduce)
    val b = Seq(0x0fL, 0x0fL, 0xf0L).foldLeft(SimHashAggregator.zero)(SimHashAggregator.reduce)
    assert(SimHashAggregator.finish(a) == SimHashAggregator.finish(b)) // order-free
    // bits 0-3 set in 2 of 3 inputs -> count +1 -> bit set; bits 4-7 in
    // 1 of 3 -> count -1 -> clear
    val sig = SimHashAggregator.finish(a)
    assert((sig & 0xffL) == 0x0fL)
    // merge across partitions == single-stream reduce
    val p1 = Seq(0x0fL).foldLeft(SimHashAggregator.zero)(SimHashAggregator.reduce)
    val p2 = Seq(0xf0L, 0x0fL).foldLeft(SimHashAggregator.zero)(SimHashAggregator.reduce)
    assert(SimHashAggregator.finish(SimHashAggregator.merge(p1, p2)) ==
      SimHashAggregator.finish(a))
  }

  test("dedup survivors: one keeper per fingerprint, lowest doc_id wins") {
    val keep = TextQueries.dedupKeep(spark, sf)
      .as[(String, Long, Long)].collect()
    val summary = TextQueries.dedupExact(spark, sf).as[(Long, Long, Long)].head()
    assert(keep.length.toLong == summary._2)          // n_distinct groups
    assert(keep.map(_._3).sum == summary._1)          // copies sum to n_docs
    assert(keep.map(_._2).distinct.length == keep.length)
  }

  test("dup clusters: every pair lands in one cluster, rep is the min id") {
    val pairs = TextQueries.minhashLsh(spark, sf)
      .select("id1", "id2").as[(Long, Long)].collect()
    val clusters = TextQueries.dupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep, s"cluster $rep rep is not the min id")
    }
  }

  test("simhash oversized-bucket fallback agrees with in-task expansion") {
    // maxBucket = 1 forces EVERY bucket with >= 2 members down the
    // band-self-join fallback; the default cap keeps them all in the
    // grouped in-task path. Same pairs either way — the cap is a task-
    // sizing decision, never a semantics change.
    val viaJoin = TextQueries.simhashImpl(spark, sf, 1)
      .as[(Long, Long, Int)].collect().toSeq
    val viaGroups = TextQueries.simhash(spark, sf)
      .as[(Long, Long, Int)].collect().toSeq
    assert(viaGroups.nonEmpty)
    assert(viaJoin == viaGroups)
  }

  test("LSH distributed-verify fallback agrees with the broadcast branch") {
    // maxCollect = 0 makes ANY candidate pair overflow the driver
    // budget, forcing the fully distributed verify join (and, via
    // editDistancePairsImpl, the distributed text join). Same rows
    // either way — the cap is a driver-memory guard, never a semantics
    // change.
    val viaBroadcast = TextQueries.minhashLsh(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val viaShuffle = TextQueries.minhashLshImpl(spark, sf, 0L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle == viaBroadcast)
    val edBroadcast = TextQueries.editDistancePairs(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val edShuffle = TextQueries.editDistancePairsImpl(spark, sf, 0L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(edShuffle == edBroadcast)
    val omBroadcast = TextQueries.overlapMatrix(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    val omShuffle = TextQueries.overlapMatrixImpl(spark, sf, 0L)
      .as[(String, String, Long)].collect().toSeq
    assert(omShuffle == omBroadcast)
  }

  test("guarded-collect overflow: hybrid verify, clusters, dedup-best agree across branches") {
    // maxCollect = 0 makes ANY pair set overflow the driver budget,
    // forcing the distributed branch of every consumer built on
    // collectOrDistributed — including the three operators that
    // previously lacked the guard their siblings had (round-6 verdict):
    // hybridVerify (forced broadcast), dupClusters (uncapped union-find
    // collect, now routed to label propagation), and dedupBest on top.
    val hvBroadcast = TextQueries.hybridVerify(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    val hvShuffle = TextQueries.hybridVerifyImpl(spark, sf, 0L)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(hvBroadcast.nonEmpty)
    assert(hvShuffle == hvBroadcast)
    val dcUnionFind = TextQueries.dupClusters(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val dcLabelProp = TextQueries.dupClustersImpl(spark, sf, 0L)
      .as[(Long, Long)].collect().toSeq
    assert(dcUnionFind.nonEmpty)
    assert(dcLabelProp == dcUnionFind)
    val dbBroadcast = TextQueries.dedupBest(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val dbShuffle = TextQueries.dedupBestImpl(spark, sf, 0L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(dbBroadcast.nonEmpty)
    assert(dbShuffle == dbBroadcast)
  }

  test("chunk dedup, adaptive length filter, hapax profile hold their invariants") {
    import org.apache.spark.sql.functions.{ceil => sqlCeil, _}
    // chunk dedup: chunks per doc == ceil(tokens/32); kept chunks across
    // the corpus == distinct chunk fingerprints (every fingerprint keeps
    // exactly its first occurrence)
    val cd = TextQueries.chunkDedup(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(cd.nonEmpty)
    cd.foreach { case (_, n, kept, dropped) => assert(kept + dropped == n) }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expChunks = docs
      .select(sqlCeil(size(graft.functions.TextFunctions.wsTokens(col("text"))) / 32.0)
        .cast("long").as("n")).as[Long].collect().sum
    assert(cd.map(_._2).sum == expChunks, "chunk count must be ceil(tokens/32) per doc")
    val distinctFps = docs
      .select(col("doc_id"), graft.functions.TextFunctions.wsTokens(col("text")).as("ts"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(ts) / 32.0) as int) - 1), " +
          "i -> md5(cast(concat_ws(' ', slice(ts, i * 32 + 1, 32)) as binary)))")).as("fp"))
      .distinct().count()
    assert(cd.map(_._3).sum == distinctFps, "one kept chunk per distinct fingerprint")
    // adaptive length filter: every survivor sits inside its own
    // source's [p10, p90] band, recomputed independently here
    val kept = TextQueries.adaptiveLenFilter(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(kept.nonEmpty)
    val bySource = docs.select(col("source"), col("n_chars").cast("long"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(xs: Array[Long], f: Double): Double = {
      val pos = (xs.length - 1) * f
      val lo = xs(pos.toInt)
      val hi = xs(math.min(pos.toInt + 1, xs.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    kept.foreach { case (id, src, n) =>
      val xs = bySource(src)
      assert(n >= pct(xs, 0.10) && n <= pct(xs, 0.90), s"doc $id outside $src band")
    }
    // hapax: bounded by vocab; ratio consistent
    val hp = TextQueries.hapaxProfile(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(hp.nonEmpty)
    hp.foreach { case (src, vocab, hapax, ratio) =>
      assert(hapax <= vocab, src)
      assert(math.abs(ratio - hapax.toDouble / vocab) < 1e-6, src)
    }
  }

  test("near-dup index round-trips through parquet; probe output is identical") {
    // the "nightly artifact" story: build once, save, and a probe
    // against the reloaded index matches a probe against the fresh one
    val dir01 = SparkSuite.sf001 // sf0.01 has cross-source src12 pairs
    val d = spark.read.parquet(s"$dir01/documents.parquet")
    val batch = d.filter(col("source") === "src12")
    val corpus = d.filter(col("source") =!= "src12")
    val built = TextQueries.buildNearDupIndex(corpus)
    val path = tmpDir("neardup-index")
    built.save(path)
    val loaded = TextQueries.NearDupIndex.load(spark, path)
    val fresh = TextQueries.probeNearDups(batch, built)
      .orderBy("new_id", "old_id").as[(Long, Long, Double)].collect().toSeq
    val viaDisk = TextQueries.probeNearDups(batch, loaded)
      .orderBy("new_id", "old_id").as[(Long, Long, Double)].collect().toSeq
    assert(fresh.nonEmpty)
    assert(viaDisk == fresh)
  }

  test("dedup-best keeps the max-alpha member; overlap matrix sums to the pair count") {
    val clusters = TextQueries.dupClusters(spark, sf).as[(Long, Long)].collect()
    val best = TextQueries.dedupBest(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(best.nonEmpty)
    val members = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    best.foreach { case (cid, keepId, n, _) =>
      assert(members(cid).contains(keepId), s"rep $keepId not in cluster $cid")
      assert(members(cid).size.toLong == n)
    }
    assert(best.map(_._3).sum == clusters.length.toLong)
    val nPairs = TextQueries.minhashLsh(spark, sf).count()
    val matrix = TextQueries.overlapMatrix(spark, sf)
      .as[(String, String, Long)].collect()
    assert(matrix.map(_._3).sum == nPairs, "matrix must partition the pair set")
    matrix.foreach { case (a, b, _) => assert(a <= b, "matrix must be upper-triangular") }
  }

  test("split assignment is deterministic and disjoint from nothing") {
    val s1 = TextQueries.splitAssign(spark, sf).as[(Long, String, String)].collect()
    val s2 = TextQueries.splitAssign(spark, sf).as[(Long, String, String)].collect()
    assert(s1.toSeq == s2.toSeq, "same ids must always land in the same split")
    val bySplit = s1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    assert(s1.length == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("bigram LM scores match a driver-side replay on one doc") {
    val docsTxt = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val allBigrams = docsTxt.values.toSeq.flatMap { t =>
      val w = t.trim.split(" ", -1); w.zip(w.drop(1))
    }
    val c2 = allBigrams.groupBy(identity).view.mapValues(_.length).toMap
    val c1 = allBigrams.groupBy(_._1).view.mapValues(_.length).toMap
    val vocab = docsTxt.values.toSeq.flatMap(_.trim.split(" ", -1)).distinct.length
    val got = TextQueries.ngramLm(spark, sf).as[(Long, Long, Double)].collect()
    assert(got.length == docsTxt.size) // every doc has >= 2 tokens here
    got.take(5).foreach { case (id, n, avgLogp) =>
      val w = docsTxt(id).trim.split(" ", -1)
      val bs = w.zip(w.drop(1))
      assert(bs.length.toLong == n)
      val expect = bs.map(b => math.log((c2(b) + 1.0) / (c1(b._1) + vocab))).sum / bs.length
      assert(math.abs(expect - avgLogp) < 1e-6, s"doc $id: $expect vs $avgLogp")
    }
  }

  test("incremental dedup equals the symmetric exact join restricted to new-vs-corpus") {
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val batch = "src12"
    val expected = TextQueries.ngramJaccard(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
      .flatMap { case (a, b, jac) =>
        (srcOf(a) == batch, srcOf(b) == batch) match {
          case (true, false) => Some((a, b, jac))
          case (false, true) => Some((b, a, jac))
          case _ => None // intra-batch or intra-corpus: not an incremental match
        }
      }.toSet
    val got = TextQueries.dedupIncremental(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"incremental probe diverged: got $got expected $expected")
  }

  test("top terms are distinct-per-doc doc frequencies") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expectDf = docs.flatMap { case (_, t) =>
      t.trim.split(" ", -1).distinct
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    TextQueries.topTerms(spark, sf).as[(String, Long)].collect().foreach {
      case (term, df) => assert(expectDf(term) == df, s"df mismatch for '$term'")
    }
  }

  /** Writes a synthetic documents table (full harness schema) so doc-set
    * properties can be pinned on constructed corpora, not just whatever
    * the sf fixture happens to contain. */
  private def withDocs(texts: Seq[String])(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-").toString
    try {
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "srcT", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      body(dir)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  /** Independent reference winnowing (Schleimer et al. 2003, w=4, k=3,
    * leftmost-min tie rule — the variant the query documents): returns
    * the selected (pos, hash) fingerprints in position order. */
  private def refWinnow(text: String): Seq[(Int, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ts = text.trim.split(" ", -1).toSeq
    val hs = ts.sliding(3).filter(_.size == 3).map(g => md5hex(g.mkString(" "))).toVector
    (0 to hs.length - 4).map { j =>
      val win = hs.slice(j, j + 4)
      val minh = win.min
      (j + win.indexOf(minh) + 1, minh) // 1-based gram position, leftmost min
    }.distinct.sortBy(_._1)
  }

  test("winnowing matches the reference selection; shared 6-token run shares a hash") {
    // 6 tokens = w + k - 1 (w=4 windows over k=3 grams): one full window
    // of shared grams exists in both docs, and both select ITS minimum,
    // so the selected hash sets must intersect — the MOSS guarantee.
    val run = "zq xv wk jm pt br" // 6 tokens, unique to the pair
    val d0 = s"alpha beta gamma $run delta epsilon"
    val d1 = s"one two three four five $run six seven"
    val noise = "entirely different words in this document stream here"
    val texts = Seq(d0, d1, noise)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    withDocs(texts) { dir =>
      val rows = TextQueries.winnowFingerprints(spark, dir)
        .select("doc_id", "n_grams", "n_fps", "digest")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(rows.length == 3) // every doc here has >= 6 tokens
      rows.foreach { case (id, nGrams, nFps, digest) =>
        val ref = refWinnow(texts(id.toInt))
        assert(nGrams == texts(id.toInt).trim.split(" ", -1).length - 2)
        assert(nFps == ref.length, s"doc $id fingerprint count")
        assert(digest == md5hex(ref.map(_._2).mkString("")), s"doc $id digest")
      }
      // the guarantee, via the (just-validated) reference selection:
      val shared = refWinnow(d0).map(_._2).toSet intersect refWinnow(d1).map(_._2).toSet
      assert(shared.nonEmpty, "docs sharing a 6-token run must share a fingerprint hash")
      assert((refWinnow(d0).map(_._2).toSet intersect refWinnow(noise).map(_._2).toSet).isEmpty)
      // ...and the overlap JOIN surfaces exactly that pair, no other
      val pairs = TextQueries.winnowOverlap(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq
      assert(pairs == Seq((0L, 1L, shared.size.toLong)),
        s"overlap join must report exactly the planted pair: $pairs")
    }
  }

  test("winnow top-k census equals the brute-force top-3 of the pair listing, bounded") {
    // shared runs engineered so doc 0 overlaps 1, 2 AND 3 with distinct
    // counts (ranking is exercised), doc 4 overlaps nothing
    val runA = "zq xv wk jm pt br"   // doc 0 & 1 (6 tokens: 1 shared fp)
    val runB = "ky ld nw os qe rt"   // doc 0 & 2
    val runC = "ua vb wc xd ye zf"   // doc 0 & 3
    val texts = Seq(
      s"alpha $runA beta $runB gamma $runC delta",
      s"one two $runA three four five",
      s"six seven $runB $runB eight nine",   // runB twice: distinct fps still
      s"ten eleven $runC twelve thirteen",
      "entirely different words in this document stream here")
    withDocs(texts) { dir =>
      val pairs = TextQueries.winnowOverlap(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq
      assert(pairs.map(p => (p._1, p._2)).toSet.size >= 3, s"fixture too sparse: $pairs")
      // brute-force: symmetrize, rank (n_shared desc, partner asc), top-3
      val want = pairs.flatMap { case (a, b, n) => Seq((a, b, n), (b, a, n)) }
        .groupBy(_._1).flatMap { case (d, ps) =>
          ps.sortBy(p => (-p._3, p._2)).take(3).zipWithIndex
            .map { case ((_, partner, n), i) => (d, i + 1L, partner, n) }
        }.toSet
      val got = TextQueries.winnowTopOverlaps(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"missing: ${want -- got}\nextra: ${got -- want}")
      // bounded: never more than 3 rows per doc, ranks are 1..k dense
      got.groupBy(_._1).foreach { case (d, rows) =>
        assert(rows.size <= 3 && rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq,
          s"doc $d rank structure: $rows")
      }
      assert(!got.exists(_._1 == 4L), "the no-overlap doc must be absent")
    }
  }

  /** Per-doc winnow fingerprint sets via the validated reference
    * selection — the brute-force side of the routing/cap tests. */
  private def refFpSets(texts: Seq[String]): Map[Long, Set[String]] =
    texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> refWinnow(t).map(_._2).toSet
    }.toMap

  test("forced-giant-bucket winnow overlap stays distributed and agrees") {
    // runH is shared by FOUR docs -> its fingerprint has df=4; runP by
    // two (df=2). With maxBucket=2 the df=4 bucket must route through
    // the distributed self-join arm while the df=2 one keeps the
    // in-task expansion — and the union must equal the all-small plan.
    val runH = "zq xv wk jm pt br"
    val runP = "ky ld nw os qe rt"
    val texts = Seq(
      s"alpha beta $runH gamma $runP delta",
      s"one two $runH three four",
      s"five six $runH seven eight",
      s"nine ten $runH eleven twelve",
      s"thirteen fourteen $runP fifteen sixteen",
      "entirely different words in this document stream here")
    withDocs(texts) { dir =>
      val idx = TextQueries.buildWinnowIndex(
        spark.read.parquet(s"$dir/documents.parquet"))
      val all = TextQueries.winnowOverlapRouted(idx, 10000, None)
      val routed = TextQueries.winnowOverlapRouted(idx, 2, None)
      // the hot arm is a real join in the plan, not a collect_list row
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("Join") && plan.contains("doc_id#"),
        s"forced-hot plan must contain the self-join arm:\n$plan")
      val want = all.as[(Long, Long, Long)].collect().toSet
      val got = routed.as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"missing: ${want -- got}\nextra: ${got -- want}")
      // cross-check the hot bucket against the reference selection
      val fpSets = refFpSets(texts)
      val hotShared = (0L to 3L).combinations(2).map(_.toSeq).map { p =>
        (p(0), p(1), (fpSets(p(0)) intersect fpSets(p(1))).size.toLong)
      }.toSet
      assert(hotShared.forall(got.contains),
        s"hot-bucket pairs missing from routed result: $hotShared vs $got")
    }
  }

  test("winnow df-cap drops stop fingerprints; census matches brute force") {
    val runH = "zq xv wk jm pt br" // df=4 -> capped at 3
    val runP = "ky ld nw os qe rt" // df=2 -> survives
    val texts = Seq(
      s"alpha beta $runH gamma $runP delta",
      s"one two $runH three four",
      s"five six $runH seven eight",
      s"nine ten $runH eleven twelve",
      s"thirteen fourteen $runP fifteen sixteen")
    withDocs(texts) { dir =>
      val idx = TextQueries.buildWinnowIndex(
        spark.read.parquet(s"$dir/documents.parquet"))
      // brute force with the cap: keep fingerprints with 2 <= df <= 3
      val fpSets = refFpSets(texts)
      val df = fpSets.values.flatten.toSeq.groupBy(identity).map { case (h, o) => h -> o.size }
      val live = df.filter { case (_, n) => n >= 2 && n <= 3 }.keySet
      val want = (for {
        a <- texts.indices; b <- texts.indices if a < b
        n = (fpSets(a.toLong) intersect fpSets(b.toLong) intersect live).size
        if n > 0
      } yield (a.toLong, b.toLong, n.toLong)).toSet
      assert(want.nonEmpty, "fixture must keep at least one uncapped pair")
      val got = TextQueries.winnowOverlapRouted(idx, 10000, Some(3L))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"missing: ${want -- got}\nextra: ${got -- want}")
      // the uncapped census must differ (the df=4 fingerprint pairs 4 docs)
      val uncapped = TextQueries.winnowOverlapRouted(idx, 10000, None)
        .as[(Long, Long, Long)].collect().toSet
      assert(uncapped != got, "cap must actually drop the planted hot fingerprint")
    }
  }

  test("bpe trainer learns the hand-computed merge sequence; encode replays it") {
    import graft.operators.BpeTrainer
    // Sennrich et al.'s worked vocabulary (sans the </w> marker — a
    // documented simplification): low x5, lower x2, newest x6, widest x3.
    // Hand-computed: (e,s)=9 ties (s,t)=9 -> lex smallest; then (es,t)=9;
    // then (l,o)=7 ties (o,w)=7 -> lex; then (lo,w)=7.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTrainer.trainLocal(vocab, 4)
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    // encoding an unseen word applies merges in rank order
    assert(BpeTrainer.encode("lowest", merges) == Seq("low", "est"))
    // symbols always concatenate back to the word
    Seq("low", "lower", "newest", "widest", "lowest", "xyzzy").foreach { w =>
      assert(BpeTrainer.encode(w, merges).mkString == w)
    }
    // the distributed pass agrees with the local loop: a corpus whose
    // word counts equal the vocab learns the same merges...
    val texts = vocab.flatMap { case (w, c) => Seq.fill(c.toInt)(w) } match {
      case ws => Seq(ws.mkString(" "))
    }
    withDocs(texts) { dir =>
      val viaSpark = BpeTrainer.train(
        spark.read.parquet(s"$dir/documents.parquet"), "text", 4)
      assert(viaSpark == merges)
      // ...and t_bpe_pairs IS iteration 0: its top row is merge #1
      val top = TextQueries.bpePairs(spark, dir).as[(String, Long)].head()
      assert(top == (merges.head.left + merges.head.right, merges.head.freq))
    }
    // vocabulary overflow fails loudly, pointing at minFreq
    withDocs(Seq("a b c d e f g h")) { dir =>
      val e = intercept[IllegalStateException] {
        BpeTrainer.train(
          spark.read.parquet(s"$dir/documents.parquet"), "text", 1, maxCollect = 3L)
      }
      assert(e.getMessage.contains("minFreq"))
    }
  }

  test("novelty: every gram is first-seen exactly once across the corpus") {
    val out = TextQueries.novelty(spark, sf)
      .select(col("doc_id"), col("n_grams"), col("novel_frac")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f <= 1.0, r.toString)
    }
    // the first doc in corpus order can only contain first-seen grams
    val first = out.minBy(_.getLong(0))
    assert(first.getDouble(2) == 1.0, first.toString)
    // each distinct gram is novel in exactly one doc, so the weighted
    // novelty mass equals the corpus' distinct-gram count
    val mass = out.map(r => math.round(r.getLong(1) * r.getDouble(2))).sum
    val distinctGrams = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      .agg(countDistinct("g")).head().getLong(0)
    assert(mass == distinctGrams, s"$mass != $distinctGrams")
  }

  test("boilerplate fraction is bounded and df-consistent") {
    val out = TextQueries.boilerplate(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f <= 1.0, r.toString)
    }
    // weighted boilerplate mass = number of (doc, gram) rows whose gram
    // document frequency >= 3, recomputed independently
    val mass = out.map(r => math.round(r.getLong(1) * r.getDouble(2))).sum
    val grams = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(WordNGrams.word_ngrams(col("text"), 3)).as("g"))
    val expected = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3)
      .agg(sum("df")).head().getLong(0)
    assert(mass == expected, s"$mass != $expected")
  }

  test("dsir: selected tracks the weight sign and exemplar docs score higher") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "source")
    val out = TextQueries.dsirSample(spark, sf)
    out.collect().foreach { r =>
      val w = r.getDouble(2)
      assert(r.getInt(3) == (if (w > 0.0) 1 else 0), r.toString)
    }
    // the target LM is trained on src1, so src1 docs must on average
    // look MORE like the target than the pool does
    val byTarget = out.join(d, "doc_id")
      .groupBy(col("source") === "src1")
      .agg(avg("dsir_weight").as("w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTarget(true) > byTarget(false),
      s"src1 ${byTarget(true)} should exceed rest ${byTarget(false)}")
  }

  test("bpe pair census matches a hand-computed reference") {
    val texts = Seq("aab ab", "aab bb x")
    // word counts: aab->2, ab->1, bb->1, x->1 (len<2 dropped)
    // pairs: aab -> aa, ab (x2 docs => weight 2 each); ab -> ab; bb -> bb
    // freq: aa=2, ab=2+1=3, bb=1
    withDocs(texts) { dir =>
      val got = TextQueries.bpePairs(spark, dir)
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("ab", 3L), ("aa", 2L), ("bb", 1L)), got.toString)
    }
  }

  /** Independent aHash reimplementation for the phash test oracle. */
  private def refAHashBands(text: String): Array[Int] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length.toLong
    val sums = new Array[Long](32); val cnts = new Array[Long](32)
    var tot = 0L
    bytes.indices.foreach { k =>
      val s = ((k * 32L) / n).toInt
      sums(s) += bytes(k).toLong & 0xffL; cnts(s) += 1; tot += bytes(k).toLong & 0xffL
    }
    Array.tabulate(4) { b =>
      (0 until 8).foldLeft(0) { (v, j) =>
        val s = b * 8 + j
        if (sums(s) * n >= tot * cnts(s)) v | (1 << j) else v
      }
    }
  }

  test("phash near-dup equals brute-force hamming<=3 (MIH completeness) on planted payloads") {
    val base = "the quick brown fox jumps over the lazy dog again and again ok"
    val texts = Seq(
      base,                       // 0: anchor
      base,                       // 1: byte-identical -> hamming 0
      base.replace("quick", "quack"), // 2: tiny perturbation
      "zzzz " * 12 + "yy",        // 3: different distribution
      ("ab" * 20) + "Q")          // 4: another shape
    withDocs(texts) { dir =>
      val got = TextQueries.phashNearDup(spark, dir)
        .as[(Long, Long, Int)].collect().toSet
      // brute force over the same fingerprints: every pair at hamming<=3
      // MUST be in the output (multi-index pigeonhole guarantee), and
      // nothing else may be
      val bands = texts.map(refAHashBands)
      val expect = (for {
        i <- texts.indices; j <- texts.indices if i < j
        h = (0 until 4).map(b => Integer.bitCount(bands(i)(b) ^ bands(j)(b))).sum
        if h <= 3
      } yield (i.toLong, j.toLong, h)).toSet
      assert(got == expect, s"got $got expect $expect")
      assert(expect.contains((0L, 1L, 0)), "identical payloads must pair at hamming 0")
    }
  }

  /** Independent 64-segment aHash reimplementation for the wide-phash oracle. */
  private def refAHash64(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length.toLong
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    var tot = 0L
    bytes.indices.foreach { k =>
      val s = ((k * 64L) / n).toInt
      sums(s) += bytes(k).toLong & 0xffL; cnts(s) += 1; tot += bytes(k).toLong & 0xffL
    }
    (0 until 64).foldLeft(0L) { (v, s) =>
      if (sums(s) * n >= tot * cnts(s)) v | (1L << s) else v
    }
  }

  test("wide phash equals brute-force hamming<=3 and the big-bucket arm agrees") {
    // payloads must clear the 64-octet floor (one byte per segment)
    val base = "the quick brown fox jumps over the lazy dog again and again, " +
      "then once more for good measure ok"
    val texts = Seq(
      base,                             // 0: anchor
      base,                             // 1: byte-identical -> hamming 0
      base.replace("quick", "quack"),   // 2: tiny perturbation
      "zzzz " * 14 + "yy",              // 3: different distribution
      ("ab" * 34) + "Q",                // 4: another shape
      "tiny, below the 64-byte floor",  // 5: must be excluded entirely
      "héllo wörld — ünïcode payload £ " * 3) // 6: multi-byte UTF-8 octets
    withDocs(texts) { dir =>
      val got = TextQueries.phashWide(spark, dir)
        .as[(Long, Long, Int)].collect().toSet
      // brute force over the same 64-bit fingerprints: every pair at
      // hamming<=3 MUST surface (4x16-bit bands, pigeonhole over 4 bands
      // is complete for tau=3) and nothing else may
      val eligible = texts.indices.filter(i =>
        texts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8).length >= 64)
      val fp = texts.map(refAHash64)
      val expect = (for {
        i <- eligible; j <- eligible if i < j
        h = java.lang.Long.bitCount(fp(i) ^ fp(j))
        if h <= 3
      } yield (i.toLong, j.toLong, h)).toSet
      assert(got == expect, s"got $got expect $expect")
      assert(expect.contains((0L, 1L, 0)), "identical payloads must pair at hamming 0")
      assert(!got.exists(p => p._1 == 5L || p._2 == 5L), "sub-floor doc must be excluded")
      // oversized-bucket fallback: maxBucket=1 forces EVERY bucket through
      // the distributed self-join arm; results must be identical
      val viaJoin = TextQueries.phashWideImpl(spark, dir, 1)
        .as[(Long, Long, Int)].collect().toSet
      assert(viaJoin == got, "big-bucket self-join arm must agree with in-task expansion")
    }
  }

  test("phash index: probe finds cross near-dups, updated() equals a full rebuild") {
    val base = "the quick brown fox jumps over the lazy dog again and again, " +
      "then once more for good measure ok"
    // corpus = docs 0-2 (anchor + two shapes); batch = docs 3-5 (a clone
    // of the anchor, a perturbation, an unrelated payload)
    val corpusTexts = Seq(base, "zzzz " * 14 + "yy", ("ab" * 34) + "Q")
    val batchTexts = Seq(base, base.replace("quick", "quack"), "mnop " * 16 + "w")
    withDocs(corpusTexts ++ batchTexts) { dir =>
      val all = spark.read.parquet(s"$dir/documents.parquet")
      val corpus = all.filter(col("doc_id") < 3)
      val batch = all.filter(col("doc_id") >= 3)
      val idx = TextQueries.buildPhashIndex(corpus)
      val got = TextQueries.probePhash(idx, batch)
        .as[(Long, Long, Int)].collect().toSet
      // brute-force reference: every (batch, corpus) pair at hamming<=3
      val fps = (corpusTexts ++ batchTexts).map(refAHash64)
      val want = (for {
        b <- 3 to 5; c <- 0 to 2
        h = java.lang.Long.bitCount(fps(b) ^ fps(c))
        if h <= 3
      } yield (b.toLong, c.toLong, h)).toSet
      assert(got == want, s"got $got want $want")
      assert(want.exists(_._3 == 0), "the byte-identical clone must surface at hamming 0")
      // incremental fold equals a rebuild over old ∪ batch
      val merged = idx.updated(batch).fps
        .as[(Long, Long)].collect().toSet
      val rebuilt = TextQueries.buildPhashIndex(all).fps
        .as[(Long, Long)].collect().toSet
      assert(merged == rebuilt, "updated() must be bit-identical to a full rebuild")
    }
  }

  test("kl drift matches a hand-computed two-source reference and is non-negative") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kl-").toString
    try {
      Seq(
        (0L, "a a b", "en", "s1", 5L),
        (1L, "a b b b", "en", "s2", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val got = TextQueries.klDrift(spark, dir)
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      // corpus: a=3, b=4, total 7
      def kl(counts: Map[String, Long]): Double = {
        val stot = counts.values.sum.toDouble
        counts.map { case (t, c) =>
          val p = c / stot
          val q = Map("a" -> 3L, "b" -> 4L)(t) / 7.0
          p * math.log(p / q)
        }.sum
      }
      val s1 = kl(Map("a" -> 2L, "b" -> 1L))
      val s2 = kl(Map("a" -> 1L, "b" -> 3L))
      assert(got.keySet == Set("s1", "s2"))
      assert(got("s1")._2 == 2L && got("s1")._3 == 3L)
      assert(got("s2")._2 == 2L && got("s2")._3 == 4L)
      assert(math.abs(got("s1")._4 - s1) < 2e-6, s"s1 ${got("s1")._4} vs $s1")
      assert(math.abs(got("s2")._4 - s2) < 2e-6, s"s2 ${got("s2")._4} vs $s2")
      assert(got.values.forall(_._4 >= -1e-9), "KL(source||corpus) is non-negative")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("bm25 matches a hand-computed score on a tiny corpus") {
    // q terms: spark, hash, merge; k1=1.2, b=0.75, Lucene +1 idf
    val texts = Seq(
      "spark spark hash x y",   // doc 0: tf(spark)=2, tf(hash)=1, dl=5
      "merge a b c",            // doc 1: tf(merge)=1, dl=4
      "u v w z")                // doc 2: no match, dl=4
    withDocs(texts) { dir =>
      val got = TextQueries.bm25(spark, dir)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
      val n = 3.0; val avgdl = (5.0 + 4.0 + 4.0) / 3.0
      def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      def tfn(tf: Double, dl: Double) =
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      val d0 = idf(1) * tfn(2, 5) + idf(1) * tfn(1, 5)
      val d1 = idf(1) * tfn(1, 4)
      assert(got.keySet == Set(0L, 1L), s"docs with no query term must not score: $got")
      assert(got(0L)._2 == 2L && got(1L)._2 == 1L)
      assert(math.abs(got(0L)._3 - d0) < 2e-6, s"${got(0L)._3} vs $d0")
      assert(math.abs(got(1L)._3 - d1) < 2e-6, s"${got(1L)._3} vs $d1")
    }
  }

  test("quality LR: scores in (0,1), kept thresholds the rounded score, stopwords raise it") {
    val texts = Seq(
      "the cat is in the hat and it is of the best",  // stopword-rich
      "xylophone quartz jackdaw vortex glyph numb")    // stopword-free
    withDocs(texts) { dir =>
      val got = TextQueries.qualityLr(spark, dir)
        .as[(Long, Double, Int)].collect().sortBy(_._1)
      got.foreach { case (_, s, kept) =>
        assert(s > 0.0 && s < 1.0, s"score $s out of (0,1)")
        assert(kept == (if (s >= 0.5) 1 else 0), s"kept mismatch at $s")
      }
      assert(got(0)._2 > got(1)._2,
        s"stopword-rich ${got(0)._2} should outscore stopword-free ${got(1)._2}")
    }
  }

  test("gopher rules: top-bigram mass and dup-5-gram coverage match hand-computed values") {
    val texts = Seq(
      // "a b"x3, "b a"x2, "b c"x1 -> top ("a b", 3), frac 6/7;
      // 5-grams all unique -> coverage 0
      "a b a b a b c",
      // every 5-gram repeats (period-5 stream) -> full coverage;
      // bigram tie at ct 3 -> lexicographically greatest wins ("z w")
      "x y z w v x y z w v x y z w v")
    withDocs(texts) { dir =>
      val tb = TextQueries.topBigramFraction(spark, dir)
        .as[(Long, Long, String, Long, Double)].collect().sortBy(_._1)
      assert(tb(0) == ((0L, 7L, "a b", 3L, BigDecimal(6.0 / 7).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
      assert(tb(1) == ((1L, 15L, "z w", 3L, 0.4)))
      val dg = TextQueries.dupGramCoverage(spark, dir)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
      assert(dg(0) == ((0L, 7L, 0L, 0.0)))
      assert(dg(1) == ((1L, 15L, 15L, 1.0)))
    }
  }

  test("curation funnel: stages are monotone and account for every doc") {
    val rows = TextQueries.curationFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, s1, s2, s3, s4) =>
      assert(n >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4, s"non-monotone at $src")
    }
    val d = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_._2).sum == d.count(), "every doc lands in exactly one source row")
    assert(rows.map(_._4).sum < rows.map(_._3).sum,
      "the language gate must cut something (corpus has non-en docs)")
  }

  test("ppl deciles equal a single-window ntile over the LM scores") {
    val scores = TextQueries.ngramLm(spark, sf)
      .select($"doc_id", $"avg_logp").as[(Long, Double)].collect()
    val n = scores.length
    val ordered = scores.sortBy { case (id, s) => (s, id) }
    // reference ntile(10): first n%10 buckets hold one extra row
    val q = n / 10
    val r = n % 10
    val expect = ordered.zipWithIndex.map { case ((_, s), i) =>
      val rnk = i + 1
      val d = if (rnk <= r * (q + 1)) (rnk - 1) / (q + 1) + 1
              else r + (rnk - r * (q + 1) - 1) / q + 1
      (d, s)
    }.groupBy(_._1).map { case (d, xs) =>
      val vs = xs.map(_._2)
      // mirror the query: exact decimal sum -> double division -> round 6
      val mean = vs.map(v => BigDecimal(v).setScale(6)).sum.toDouble / vs.length
      (d, vs.length.toLong, vs.min, vs.max,
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = TextQueries.pplBuckets(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4)) ==
      expect.map(e => (e._1, e._2, e._3, e._4)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-9, s"decile ${g._1} mean: ${g._5} vs ${e._5}")
    }
    assert(got.map(_._2).sum == n, "every scored doc lands in exactly one decile")
  }

  test("doremi weights: normalized, floor-bounded, hardest source heaviest") {
    val w = TextQueries.doremiWeights(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(w.length == 20)
    assert(math.abs(w.map(_._4).sum - 1.0) < 1e-4, "weights must normalize")
    assert(w.forall(_._4 > 0), "the 1e-6 floor keeps every source present")
    // the source with the lowest mean score (hardest) gets the max weight
    val hardest = w.minBy(r => (r._3, r._1))._1
    val heaviest = w.maxBy(r => (r._4, r._1))._1
    assert(hardest == heaviest, s"hardest $hardest should be heaviest, got $heaviest")
  }
}
