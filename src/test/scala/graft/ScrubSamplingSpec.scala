package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Specs for the round-8 curation additions: duplicate-substring scrub,
  * aggressive-normalization dedup, priority-weighted sampling, and the
  * per-source distinct-n diversity metric.
  */
class ScrubSamplingSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  /** Crafted corpus: docs 1/2 share a verbatim 7-token run (every one of
    * its 5-grams duplicates), doc 3 repeats a 5-gram within itself, doc 4
    * is all-unique, doc 5 is shorter than one gram.
    */
  private lazy val craftedDir: String = {
    val d = tmpDir("scrub-docs")
    val shared = "alpha beta gamma delta epsilon zeta eta"
    Seq(
      (1L, s"intro one $shared tail one", "en", "src0"),
      (2L, s"other words here $shared closing remark", "en", "src1"),
      (3L, "p q r s t u p q r s t u", "en", "src0"),
      (4L, "completely unique tokens never repeated anywhere honestly", "en", "src1"),
      (5L, "tiny doc here", "en", "src0"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("substring scrub removes shared spans, keeps unique text verbatim") {
    val out = TextQueries.substringScrub(spark, craftedDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    // docs 1 and 2: exactly the 7 shared-run positions are covered (the
    // run's three 5-grams all occur in both docs), the framing survives
    assert(out(1L) == ((11L, 7L, "intro one tail one")))
    assert(out(2L) == ((12L, 7L, "other words here closing remark")))
    // doc 3: within-doc repetition — every 5-gram of the repeated block
    // occurs twice, so the whole doc is scrubbed away
    assert(out(3L)._2 == 12L && out(3L)._3 == "")
    // doc 4: nothing shared, nothing removed
    assert(out(4L) == ((7L, 0L, "completely unique tokens never repeated anywhere honestly")))
    // doc 5: below gram width, passes through whole
    assert(out(5L) == ((3L, 0L, "tiny doc here")))
  }

  test("substring scrub conserves tokens: kept + removed = total (sf0.001)") {
    val bad = TextQueries.substringScrub(spark, sf)
      .select(col("n_tokens"), col("n_removed"),
        when(col("scrubbed") === "", lit(0))
          .otherwise(size(split(col("scrubbed"), " "))).as("n_kept"))
      .filter(col("n_kept") + col("n_removed") =!= col("n_tokens"))
      .count()
    assert(bad == 0L)
  }

  test("aggressive-norm dedup collapses punctuation/case/digit variants") {
    val d = tmpDir("norm-docs")
    Seq(
      (1L, "Hello, World! Edition 3 (2024)"),
      (2L, "hello world edition 7 2019"),   // digits masked, punct stripped
      (3L, "HELLO   world — edition 5, 2021."),
      (4L, "a genuinely different document"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextQueries.dedupNorm(spark, d)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, 3L), (4L, 1L)))
  }

  test("norm dedup partitions the corpus: copies sum to corpus size") {
    val total = TextQueries.dedupNorm(spark, sf)
      .agg(sum("n_copies")).as[Long].head()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == n)
  }

  test("priority sample is deterministic, ranked, and length-biased") {
    val a = TextQueries.sampleWeighted(spark, sf).collect()
    val b = TextQueries.sampleWeighted(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "hash-derived draw must replay exactly")
    assert(a.length == 25)
    val pr = a.map(_.getDouble(4))
    assert(pr.zip(pr.tail).forall { case (x, y) => x >= y }, "rank = priority desc")
    // inclusion probability is proportional to n_chars, so the sample
    // mean must sit above the corpus mean (deterministic given the data)
    val sampleMean = a.map(_.getLong(3)).sum.toDouble / a.length
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg("n_chars")).as[Double].head()
    assert(sampleMean > corpusMean,
      s"weighted draw should favor long docs: $sampleMean vs $corpusMean")
  }

  test("bpe encode: concat identity, bounds, and word-cache parity") {
    import graft.operators.BpeTrainer
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val merges = BpeTrainer.train(d, "text", nMerges = 30, minFreq = 2L).sortBy(_.rank)
    assert(merges.nonEmpty)
    // subtokens concatenate back to the word, for every distinct word
    val vocab = d.select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    vocab.foreach { w =>
      val enc = BpeTrainer.encode(w, merges)
      assert(enc.mkString("") == w, s"round-trip failed for '$w'")
    }
    // the distributed word-cache path equals a direct per-doc encode
    val got = TextQueries.bpeEncodeCorpus(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = d.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        val ws = t.trim.split(" ").filter(_.nonEmpty)
        id -> (ws.length.toLong, ws.map(w => BpeTrainer.encode(w, merges).size.toLong).sum)
      }.toMap
    assert(got == direct)
    // bounds: one token per word minimum, one per char maximum
    got.values.foreach { case (nw, nb) => assert(nb >= nw && nb <= nw * 64) }
  }

  test("lang confusion cells sum to the corpus and shares to 1 per label") {
    val rows = TextQueries.langConfusion(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val share = cells.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$lang shares sum to $share")
    }
  }

  test("incremental scrub vs empty corpus reduces to the global scrub of the batch") {
    import org.apache.spark.sql.{types => T}
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val batch = d.filter(col("source") === "src12")
    // batch-only dir so the global operator sees exactly the batch
    val bDir = tmpDir("scrub-batch")
    batch.write.mode("overwrite").parquet(s"$bDir/documents.parquet")
    // empty corpus -> dup rule degenerates to batch-internal multiplicity
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      T.StructType(batch.schema.fields))
    val viaProbe = TextQueries.probeScrub(batch, TextQueries.buildScrubIndex(empty))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val global = TextQueries.substringScrub(spark, bDir)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(viaProbe == global)
  }

  test("incremental scrub marks corpus-shared grams a batch-only view misses") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val batch = d.filter(col("source") === "src12")
    val corpus = d.filter(col("source") =!= "src12")
    val incr = TextQueries.probeScrub(batch, TextQueries.buildScrubIndex(corpus))
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    val solo = TextQueries.probeScrub(batch,
      TextQueries.ScrubIndex(TextQueries.buildScrubIndex(corpus).counts.limit(0)))
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    // against the corpus the cover can only grow, and on the planted
    // near-dup fixtures it must strictly grow somewhere
    assert(incr.keySet == solo.keySet)
    assert(incr.forall { case (id, n) => n >= solo(id) })
    assert(incr.values.sum > solo.values.sum)
  }

  test("embed outliers: a planted far vector ranks first in its label") {
    import graft.queries.SimilarityQueries
    val d = tmpDir("outlier-emb")
    val base = Array.tabulate(64)(i => 0.1f * ((i % 5) + 1))
    val rows = (0 until 200).map { i =>
      val v =
        if (i == 77) Array.fill(64)(0.95f)            // the planted outlier
        else base.map(x => x + 0.001f * (i % 7))      // a tight cluster
      (i.toLong, v, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SimilarityQueries.embedOutliers(spark, d).collect()
    assert(out.length == 10, "5 per label x 2 labels")
    val top1 = out.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L).head
    assert(top1.getLong(2) == 77L, s"planted outlier should rank first: $top1")
    out.foreach(r => assert(r.getDouble(3) >= 0.0))
    // determinism: identical on re-run (exact integer ranking)
    assert(SimilarityQueries.embedOutliers(spark, d).collect().toSeq == out.toSeq)
  }

  test("misra-gries: heavies survive and bounds hold under any partitioning") {
    import graft.functions.FrequentItemsAggregator
    val k = 8
    // 100-term vocabulary (>> k) with three planted heavies
    val items = (0 until 3000).map { i =>
      if (i % 3 == 0) "heavy0" else if (i % 5 == 0) "heavy1"
      else if (i % 7 == 1) "heavy2" else s"tail${i % 97}"
    }
    val exact = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = items.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val st = items.toDF("w").repartition(parts).as[String]
        .select(FrequentItemsAggregator(k).toColumn).head()
      assert(st.n == n)
      assert(st.counters.size <= k)
      // guarantee: every item with freq > n/(k+1) has a counter
      exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { w =>
        assert(st.counters.contains(w), s"$w lost at parts=$parts: ${st.counters}")
      }
      // bounds: estimate <= true, and underestimates by at most n/(k+1)
      st.counters.foreach { case (w, est) =>
        val t = exact.getOrElse(w, 0L)
        assert(est <= t, s"$w overestimated: $est > $t")
        assert(est >= t - n / (k + 1), s"$w undershot the bound: $est vs $t")
      }
    }
  }

  test("heavy hitters equals the full-vocabulary aggregate it avoids") {
    val got = TextQueries.heavyHitters(spark, sf)
      .as[(String, Long)].collect().toSeq
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val n = toks.count()
    val want = toks.groupBy("w").count()
      .filter(col("count") * 33 > n)
      .orderBy(col("count").desc, col("w"))
      .as[(String, Long)].collect().toSeq
    assert(want.nonEmpty && got == want)
  }

  test("zipf fit: negative slope per source, deterministic across runs") {
    val a = TextQueries.zipfFit(spark, sf).collect()
    val b = TextQueries.zipfFit(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(1) <= 50)
      assert(r.getDouble(2) < 0.0, s"rank-frequency slope must fall: $r")
    }
  }

  test("anneal plan: both phases normalize to 1 and phase 2 tracks quality") {
    val rows = TextQueries.annealPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-3)
    // the highest-quality source must gain share from phase 1 to 2,
    // the lowest must lose (q_mean spread exists on the fixtures)
    val byQ = rows.sortBy(_._4)
    assert(byQ.last._4 > byQ.head._4, "fixtures should spread quality")
    assert(byQ.last._6 > byQ.last._5 - 1e-9, s"best source should gain: ${byQ.last}")
    assert(byQ.head._6 < byQ.head._5 + 1e-9, s"worst source should lose: ${byQ.head}")
  }

  test("magic-byte sniffing classifies real container signatures") {
    import graft.multimodal.MediaPipeline
    val payloads: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00).map(_.toByte), "image/jpeg"),
      (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A), "image/png"),
      (3L, "GIF89a....".getBytes("US-ASCII"), "image/gif"),
      (4L, "RIFF1234WAVE".getBytes("US-ASCII"), "audio/wav"),
      (5L, "%PDF-1.7".getBytes("US-ASCII"), "application/pdf"),
      (6L, Array[Byte]('P', 'K', 0x03, 0x04, 0x14), "application/zip"),
      (7L, "just plain text".getBytes("UTF-8"), "image/jpeg"), // spoofed!
      (8L, Array[Byte](0x00, 0x01), "application/octet-stream"))
    val got = payloads.toDF("doc_id", "payload", "mime")
      .select(col("doc_id"), MediaPipeline.sniffedFormat(col("payload")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "jpeg", 2L -> "png", 3L -> "gif", 4L -> "riff",
      5L -> "pdf", 6L -> "zip", 7L -> "unknown", 8L -> "unknown"))
    // the census shape: the spoofed jpeg shows up as (image/jpeg, unknown)
    val cells = payloads.toDF("doc_id", "payload", "mime")
      .select(col("mime"), MediaPipeline.sniffedFormat(col("payload")).as("s"))
      .groupBy("mime", "s").count()
      .as[(String, String, Long)].collect().toSet
    assert(cells.contains(("image/jpeg", "unknown", 1L)))
    assert(cells.contains(("image/jpeg", "jpeg", 1L)))
  }

  test("round-8 operators survive an empty corpus with zero rows, not nulls") {
    val d = tmpDir("empty-docs")
    spark.read.parquet(s"$sf/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(TextQueries.substringScrub(spark, d).count() == 0)
    assert(TextQueries.dedupNorm(spark, d).count() == 0)
    assert(TextQueries.sampleWeighted(spark, d).count() == 0)
    assert(TextQueries.diversity(spark, d).count() == 0)
    assert(TextQueries.zipfFit(spark, d).count() == 0)
    assert(TextQueries.heavyHitters(spark, d).count() == 0)
    assert(TextQueries.bpeEncodeCorpus(spark, d).count() == 0)
    assert(TextQueries.langConfusion(spark, d).count() == 0)
    assert(TextQueries.annealPlan(spark, d).count() == 0)
  }

  test("diversity ratios are in (0, 1] and cover every source") {
    val rows = TextQueries.diversity(spark, sf).collect()
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio <= 1.0, r.toString)
      assert(r.getLong(2) <= r.getLong(1), r.toString)
    }
  }
}
