package graft.cli

import graft.SparkSuite
import graft.queries.TextQueries
import org.apache.spark.sql.functions.col

/** `build-index` round-trips: the CLI verb writes each index kind on
  * the shared [[graft.queries.IndexArtifact]] layout, and a probe
  * against the reloaded artifact matches a probe against a freshly
  * built index — the whole nightly-refresh story, driven through the
  * command surface a production job would use.
  */
class BuildIndexCliSpec extends SparkSuite {
  import spark.implicits._

  private val docsPath = s"${SparkSuite.sf001}/documents.parquet"

  private def cmd(kind: String): String = {
    val out = tmpDir(s"cli-$kind-index")
    val (k, o, n) = Main.buildIndexCmd(
      spark, Map("kind" -> kind, "in" -> docsPath, "out" -> out))
    assert(k == kind && o == out && n > 0)
    out
  }

  private lazy val d = spark.read.parquet(docsPath)
  private lazy val batch = d.filter(col("source") === "src12")
  private lazy val corpus = d.filter(col("source") =!= "src12")

  test("build-index neardup: probe against the CLI artifact matches a fresh build") {
    val out = tmpDir("cli-neardup-index")
    // neardup/chunk indexes are corpus-side artifacts: build them over
    // the corpus split so the probe-vs-batch flow is the real one
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    Main.buildIndexCmd(spark,
      Map("kind" -> "neardup", "in" -> s"$out-corpus", "out" -> out))
    val loaded = TextQueries.NearDupIndex.load(spark, out)
    val fresh = TextQueries.probeNearDups(batch, TextQueries.buildNearDupIndex(corpus))
      .orderBy("new_id", "old_id").as[(Long, Long, Double)].collect().toSeq
    val viaCli = TextQueries.probeNearDups(batch, loaded)
      .orderBy("new_id", "old_id").as[(Long, Long, Double)].collect().toSeq
    assert(fresh.nonEmpty && viaCli == fresh)
  }

  test("build-index phash: probe against the CLI artifact matches a fresh build; update folds") {
    val out = tmpDir("cli-phash-index")
    val base = "the quick brown fox jumps over the lazy dog again and again, " +
      "then once more for good measure ok"
    Seq((0L, base, "en", "srcA", base.length.toLong),
        (1L, "zzzz " * 14 + "yy", "en", "srcA", 72L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out-corpus")
    Seq((2L, base, "en", "srcB", base.length.toLong), // clone: hamming 0
        (3L, "mnop " * 16 + "w", "en", "srcB", 81L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out-batch")
    Main.buildIndexCmd(spark,
      Map("kind" -> "phash", "in" -> s"$out-corpus", "out" -> out))
    val loaded = TextQueries.PhashIndex.load(spark, out)
    val batch = spark.read.parquet(s"$out-batch")
    val viaCli = TextQueries.probePhash(loaded, batch)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaCli.contains((2L, 0L, 0)), s"clone must probe at hamming 0: $viaCli")
    // update-index folds the batch; the merged artifact then knows it
    val out2 = tmpDir("cli-phash-index2")
    Main.updateIndexCmd(spark, Map("kind" -> "phash",
      "in" -> s"$out-batch", "index" -> out, "out" -> out2))
    val merged = TextQueries.PhashIndex.load(spark, out2).fps
      .as[(Long, Long)].collect().toMap
    assert(merged.keySet == Set(0L, 1L, 2L, 3L))
    // re-folding the SAME batch must be rejected (ids already indexed)
    val dup = intercept[IllegalArgumentException] {
      Main.updateIndexCmd(spark, Map("kind" -> "phash",
        "in" -> s"$out-batch", "index" -> out2, "out" -> tmpDir("cli-phash-x")))
    }
    assert(dup.getMessage.contains("already indexed"), dup.getMessage)
  }

  test("build-index chunk: probe against the CLI artifact matches a fresh build") {
    val out = tmpDir("cli-chunk-index")
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    Main.buildIndexCmd(spark,
      Map("kind" -> "chunk", "in" -> s"$out-corpus", "out" -> out))
    val loaded = TextQueries.ChunkIndex.load(spark, out)
    val fresh = TextQueries.probeChunks(batch, TextQueries.buildChunkIndex(corpus))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val viaCli = TextQueries.probeChunks(batch, loaded)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(fresh.nonEmpty && viaCli == fresh)
  }

  test("build-index drift: klAgainst the CLI artifact matches a fresh reference") {
    val out = cmd("drift")
    val loaded = TextQueries.TermDistribution.load(spark, out)
    val fresh = TextQueries.buildTermDistribution(d)
    assert(loaded.gt == fresh.gt && loaded.vocab == fresh.vocab)
    val a = TextQueries.klAgainst(batch, fresh).head()
    val b = TextQueries.klAgainst(batch, loaded).head()
    assert(a == b)
  }

  test("build-index winnow: overlap and fingerprints from the CLI artifact match") {
    val out = cmd("winnow")
    val loaded = TextQueries.WinnowIndex.load(spark, out)
    val freshIdx = TextQueries.buildWinnowIndex(d)
    val fresh = TextQueries.winnowOverlapFrom(freshIdx)
      .as[(Long, Long, Long)].collect().toSeq
    val viaCli = TextQueries.winnowOverlapFrom(loaded)
      .as[(Long, Long, Long)].collect().toSeq
    assert(fresh.nonEmpty && viaCli == fresh)
    val fp = TextQueries.winnowFingerprintsFrom(freshIdx)
      .as[(Long, Long, Long, String)].collect().toSeq
    val fpCli = TextQueries.winnowFingerprintsFrom(loaded)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(fp.nonEmpty && fpCli == fp)
  }

  test("build-index scrub: probe against the CLI artifact matches a fresh build") {
    val out = tmpDir("cli-scrub-index")
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    Main.buildIndexCmd(spark,
      Map("kind" -> "scrub", "in" -> s"$out-corpus", "out" -> out))
    val loaded = TextQueries.ScrubIndex.load(spark, out)
    val fresh = TextQueries.probeScrub(batch, TextQueries.buildScrubIndex(corpus))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val viaCli = TextQueries.probeScrub(batch, loaded)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(fresh.nonEmpty && viaCli == fresh)
  }

  test("scrub verb: --index matches the library probe; no index matches the global mark") {
    val idx = tmpDir("cli-scrubverb-index")
    corpus.write.mode("overwrite").parquet(s"$idx-corpus")
    Main.buildIndexCmd(spark,
      Map("kind" -> "scrub", "in" -> s"$idx-corpus", "out" -> idx))
    val bPath = tmpDir("cli-scrubverb-batch")
    batch.write.mode("overwrite").parquet(bPath)

    val out1 = tmpDir("cli-scrubverb-out1")
    val (o1, n1, rem1) = Main.scrubCmd(spark,
      Map("in" -> bPath, "out" -> out1, "index" -> idx))
    assert(o1 == out1 && n1 == batch.count() && rem1 > 0)
    val viaCli = spark.read.parquet(out1).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val lib = TextQueries.probeScrub(batch,
        TextQueries.ScrubIndex.load(spark, idx))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(viaCli == lib)

    // no --index: global mark over the input alone
    val out2 = tmpDir("cli-scrubverb-out2")
    Main.scrubCmd(spark, Map("in" -> bPath, "out" -> out2))
    val solo = spark.read.parquet(out2).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val bDir = tmpDir("cli-scrubverb-bdir")
    batch.write.mode("overwrite").parquet(s"$bDir/documents.parquet")
    val global = TextQueries.substringScrub(spark, bDir)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(solo == global)
  }

  test("scrub verb summary survives an empty input without an NPE") {
    val empty = tmpDir("cli-scrub-empty-in")
    d.limit(0).write.mode("overwrite").parquet(s"$empty/documents.parquet")
    val out = tmpDir("cli-scrub-empty-out")
    val (_, n, removed) = Main.scrubCmd(
      spark, Map("in" -> s"$empty/documents.parquet", "out" -> out))
    assert(n == 0L && removed == 0L)
  }

  test("ingest verb: jsonl and text land on the documents contract") {
    import java.nio.file.{Files, Paths}
    val in = tmpDir("cli-ingest-in")
    Files.writeString(Paths.get(s"$in/crawl-a.jsonl"),
      """{"text":"the quick brown fox","lang":"en"}
        |{"text":"der schnelle braune fuchs","lang":"de"}
        |{"text":"no lang on this one"}
        |""".stripMargin)
    val out = tmpDir("cli-ingest-out")
    val (_, n) = Main.ingestCmd(spark,
      Map("in" -> s"$in/crawl-a.jsonl", "out" -> out))
    assert(n == 3)
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = got.orderBy("text").collect()
    assert(rows.map(_.getString(2)).sorted.toSeq == Seq("de", "en", "und"))
    assert(rows.forall(_.getString(3) == "crawl-a"))
    assert(rows.forall(r => r.getLong(4) == r.getString(1).length.toLong))
    assert(got.select("doc_id").distinct().count() == 3)
    // the ingested table feeds the operator surface directly
    assert(graft.queries.TextQueries.dedupNorm(spark,
      { val d = tmpDir("cli-ingest-docs")
        got.write.mode("overwrite").parquet(s"$d/documents.parquet"); d })
      .count() == 3)

    // one-doc-per-line text ingest
    Files.writeString(Paths.get(s"$in/plain.txt"), "alpha beta\ngamma delta\n")
    val out2 = tmpDir("cli-ingest-out2")
    val (_, n2) = Main.ingestCmd(spark,
      Map("in" -> s"$in/plain.txt", "out" -> out2, "format" -> "text"))
    assert(n2 == 2)
    assert(spark.read.parquet(out2).columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("export verb: sharded JSONL, deterministic layout, ingest reads it back unchanged") {
    val docsDir = tmpDir("cli-export-docs")
    val docs = spark.read.parquet(s"${SparkSuite.sf0001}/documents.parquet")
    docs.write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val out = tmpDir("cli-export-out")
    val (_, n, shards) = Main.exportCmd(spark,
      Map("in" -> s"$docsDir/documents.parquet", "out" -> out, "shards" -> "4"))
    assert(n == docs.count() && shards == 4)
    // hive layout: one dir per shard, shard = doc_id % 4
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(shardDirs.toSeq == (0 until 4).map(i => s"shard=$i"))
    val back = spark.read.json(out)
    assert(back.count() == n)
    import org.apache.spark.sql.functions.{col, expr}
    assert(back.filter(expr("doc_id % 4 != shard")).count() == 0)
    // ingest∘export is an identity on the contract columns
    val ingested = tmpDir("cli-export-reingest")
    val (_, n2) = Main.ingestCmd(spark,
      Map("in" -> out, "out" -> ingested, "format" -> "jsonl"))
    assert(n2 == n)
    val a = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(ingested)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // gzip variant still round-trips through Spark's json reader
    val outGz = tmpDir("cli-export-gz")
    val (_, nGz, _) = Main.exportCmd(spark,
      Map("in" -> s"$docsDir/documents.parquet", "out" -> outGz,
        "shards" -> "2", "gzip" -> "true"))
    assert(nGz == n)
    assert(new java.io.File(outGz).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).exists(_.getName.endsWith(".json.gz")))
  }

  test("export --by-bytes: packed layout, manifest next to the shards, ingest round-trip") {
    import org.apache.spark.sql.functions.{col, octet_length, sum => fsum, count => fcount, min => fmin, max => fmax, lit}
    val docsDir = tmpDir("cli-bybytes-docs")
    val docs = spark.read.parquet(s"${SparkSuite.sf0001}/documents.parquet")
    docs.write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val budget = 8192L
    val out = tmpDir("cli-bybytes-out")
    val (_, n, shards) = Main.exportCmd(spark,
      Map("in" -> s"$docsDir/documents.parquet", "out" -> out,
        "by-bytes" -> budget.toString))
    assert(n == docs.count() && shards > 1, s"expected multiple shards, got $shards")
    // the manifest sits next to the shards, underscore-hidden from the
    // JSONL reader, and matches the packByBytes layout recomputed here
    import spark.implicits._
    val expected = graft.queries.TextQueries.packByBytes(
      docs.select(col("doc_id").cast("long"),
        octet_length(col("text")).cast("long")).as[(Long, Long)], budget)
    val wantManifest = graft.queries.TextQueries.manifestOf(expected)
      .collect().map(_.toSeq).toSeq
    val gotManifest = spark.read.parquet(s"$out/_manifest")
      .orderBy("shard_id").collect().map(_.toSeq).toSeq
    assert(gotManifest == wantManifest)
    assert(gotManifest.size == shards)
    // written shards agree with the manifest: per-shard doc count and
    // text byte mass recomputed from the JSONL itself
    val back = spark.read.json(out)
    assert(back.count() == n)
    val fromShards = back
      .groupBy(col("shard").cast("long").as("shard_id"))
      .agg(fcount(lit(1)).as("n_items"),
        fsum(octet_length(col("text")).cast("long")).as("n_bytes"),
        fmin("doc_id").as("first_doc"), fmax("doc_id").as("last_doc"))
      .orderBy("shard_id").collect().map(_.toSeq).toSeq
    assert(fromShards == wantManifest)
    // tar-writer convention: a shard exceeds the budget only via its
    // LAST item straddling the cut (first byte inside, mass beyond)
    gotManifest.foreach { r =>
      val (nItems, nBytes) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      assert(nItems >= 1)
      assert(nBytes <= budget + docs.agg(fmax(octet_length(col("text"))))
        .head().getInt(0), s"shard mass $nBytes far beyond budget")
    }
    // ingest∘export identity on the contract columns
    val ingested = tmpDir("cli-bybytes-reingest")
    val (_, n2) = Main.ingestCmd(spark,
      Map("in" -> out, "out" -> ingested, "format" -> "jsonl"))
    assert(n2 == n)
    val a = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(ingested)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // --shards and --by-bytes are mutually exclusive
    intercept[IllegalArgumentException] {
      Main.exportCmd(spark, Map("in" -> s"$docsDir/documents.parquet",
        "out" -> tmpDir("cli-bybytes-x"), "by-bytes" -> "1024", "shards" -> "4"))
    }
  }

  test("update-index: incremental refresh probes identically to a full rebuild") {
    // split the corpus itself: index the first part, fold in the second
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val (oldIds, addIds) = ids.splitAt(ids.length - 5)
    val oldDocs = corpus.filter(col("doc_id").isin(oldIds.map(Long.box).toSeq: _*))
    val addDocs = corpus.filter(col("doc_id").isin(addIds.map(Long.box).toSeq: _*))
    val oldDir = tmpDir("upd-old-docs"); oldDocs.write.mode("overwrite").parquet(oldDir)
    val addDir = tmpDir("upd-add-docs"); addDocs.write.mode("overwrite").parquet(addDir)
    for (kind <- Seq("neardup", "chunk", "drift", "winnow", "scrub")) {
      val v1 = tmpDir(s"upd-$kind-v1"); val v2 = tmpDir(s"upd-$kind-v2")
      Main.buildIndexCmd(spark, Map("kind" -> kind, "in" -> oldDir, "out" -> v1))
      Main.updateIndexCmd(spark,
        Map("kind" -> kind, "in" -> addDir, "index" -> v1, "out" -> v2))
      val probe: String => Seq[Seq[Any]] = kind match {
        case "neardup" => p => TextQueries.probeNearDups(
          batch, TextQueries.NearDupIndex.load(spark, p))
          .orderBy("new_id", "old_id").collect().toSeq.map(_.toSeq)
        case "chunk" => p => TextQueries.probeChunks(
          batch, TextQueries.ChunkIndex.load(spark, p))
          .orderBy("doc_id").collect().toSeq.map(_.toSeq)
        case "drift" => p => TextQueries.klAgainst(
          batch, TextQueries.TermDistribution.load(spark, p))
          .collect().toSeq.map(_.toSeq)
        case "winnow" => p => TextQueries.winnowOverlapFrom(
          TextQueries.WinnowIndex.load(spark, p))
          .orderBy("id1", "id2").collect().toSeq.map(_.toSeq)
        case "scrub" => p => TextQueries.probeScrub(
          batch, TextQueries.ScrubIndex.load(spark, p))
          .orderBy("doc_id").collect().toSeq.map(_.toSeq)
      }
      val full = tmpDir(s"upd-$kind-full")
      corpus.write.mode("overwrite").parquet(s"$full-docs")
      Main.buildIndexCmd(spark, Map("kind" -> kind, "in" -> s"$full-docs", "out" -> full))
      assert(probe(v2) == probe(full), s"$kind: incremental != full rebuild")
    }
    // duplicate ids are rejected, not silently merged
    val v1 = tmpDir("upd-dup-v1")
    Main.buildIndexCmd(spark, Map("kind" -> "neardup", "in" -> oldDir, "out" -> v1))
    val err = intercept[Exception] {
      Main.updateIndexCmd(spark, Map("kind" -> "neardup", "in" -> oldDir,
        "index" -> v1, "out" -> tmpDir("upd-dup-v2")))
    }
    assert(err.getMessage != null)
  }

  test("curate verb: output equals the cleanCorpus query, funnel report present") {
    val out = tmpDir("cli-curate-out")
    val (_, n, funnel) = Main.curateCmd(spark,
      Map("in" -> SparkSuite.sf0001, "out" -> out))
    val direct = TextQueries.cleanCorpus(spark, SparkSuite.sf0001)
    assert(n == direct.count() && n > 0)
    val a = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(a == direct.collect().map(_.toSeq).toSet)
    assert(funnel.nonEmpty && funnel.forall(_.startsWith("funnel: ")))
    // bad --in dies loudly, not with an opaque parquet error
    val e = intercept[IllegalArgumentException] {
      Main.curateCmd(spark, Map("in" -> tmpDir("cli-curate-empty"), "out" -> out))
    }
    assert(e.getMessage.contains("documents.parquet"))
  }

  test("update-index ivf: frozen-centroid add, probe matches assignment invariants") {
    import graft.queries.SimilarityQueries
    val emb = spark.read.parquet(s"${SparkSuite.sf0001}/embeddings.parquet")
    val oldE = emb.filter(col("vec_id") < 400)
    val addE = emb.filter(col("vec_id") >= 400)
    val oldDir = tmpDir("upd-ivf-old"); oldE.write.mode("overwrite").parquet(oldDir)
    val addDir = tmpDir("upd-ivf-add"); addE.write.mode("overwrite").parquet(addDir)
    val v1 = tmpDir("upd-ivf-v1"); val v2 = tmpDir("upd-ivf-v2")
    Main.buildIndexCmd(spark, Map("kind" -> "ivf", "in" -> oldDir, "out" -> v1))
    Main.updateIndexCmd(spark,
      Map("kind" -> "ivf", "in" -> addDir, "index" -> v1, "out" -> v2))
    val i1 = SimilarityQueries.IvfIndex.load(spark, v1)
    val i2 = SimilarityQueries.IvfIndex.load(spark, v2)
    // centroids frozen, vectors grew by the batch
    assert(i2.centroids.collect().map(_.getLong(0)).sorted.toSeq ==
      i1.centroids.collect().map(_.getLong(0)).sorted.toSeq)
    assert(i2.vectors.count() == i1.vectors.count() + addE.count())
    // every batch vector landed in a trained cell and probes resolve
    val cells = i1.centroids.select("cell").as[Long].collect().toSet
    val newCells = i2.vectors.filter(col("vec_id") >= 400)
      .select("cell").as[Long].collect().toSet
    assert(newCells.subsetOf(cells))
    val probed = SimilarityQueries.probeIvfIndex(i2, emb.filter(col("vec_id") < 10))
    assert(probed.count() > 0)
  }

  test("scrub verb --stream: checkpointed probe processes only new files on restart") {
    // nightly artifact over the corpus
    val idx = tmpDir("cli-scrubstream-index")
    corpus.write.mode("overwrite").parquet(s"$idx-corpus")
    Main.buildIndexCmd(spark,
      Map("kind" -> "scrub", "in" -> s"$idx-corpus", "out" -> idx))

    // streaming ingest dir: first half of the batch arrives
    val inDir = tmpDir("cli-scrubstream-in")
    val ids = batch.select("doc_id").as[Long].collect().sorted
    val half = ids(ids.length / 2)
    batch.filter(col("doc_id") < half)
      .write.mode("append").parquet(inDir)
    val out = tmpDir("cli-scrubstream-out")
    val ckpt = tmpDir("cli-scrubstream-ckpt")
    val o = Map("in" -> inDir, "out" -> out, "index" -> idx,
      "stream" -> "true", "checkpoint" -> ckpt)
    val (_, n1, _) = Main.scrubCmd(spark, o)
    assert(n1 == ids.count(_ < half))

    // rest of the batch lands; same checkpoint -> only the new file runs
    batch.filter(col("doc_id") >= half)
      .write.mode("append").parquet(inDir)
    val (_, n2, rem2) = Main.scrubCmd(spark, o)
    assert(n2 == ids.length.toLong, s"expected all ${ids.length} docs, got $n2")
    assert(rem2 > 0, "corpus-indexed grams must scrub something")

    // the streamed output matches per-micro-batch probes doc-for-doc
    // (within-batch multiplicity is per micro-batch by construction;
    // cross-batch duplicates are the nightly index rebuild's job)
    val streamed = spark.read.parquet(out).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val loadedIdx = graft.queries.TextQueries.ScrubIndex.load(spark, idx)
    val perBatch = Seq(col("doc_id") < half, col("doc_id") >= half)
      .flatMap { pred =>
        graft.queries.TextQueries.probeScrub(
            spark.read.parquet(inDir).filter(pred), loadedIdx)
          .as[(Long, Long, Long, String)].collect().toSeq
      }.sortBy(_._1)
    assert(streamed == perBatch)
  }

  test("ingest verb: upstream doc_id is validated, not silently corrupted") {
    import java.nio.file.{Files, Paths}
    val in = tmpDir("cli-ingest-id-in")

    // valid numeric ids are kept verbatim
    Files.writeString(Paths.get(s"$in/good.jsonl"),
      """{"doc_id":"7","text":"alpha"}
        |{"doc_id":"9","text":"beta"}
        |""".stripMargin)
    val outGood = tmpDir("cli-ingest-id-good")
    val (_, nGood) = Main.ingestCmd(spark,
      Map("in" -> s"$in/good.jsonl", "out" -> outGood))
    assert(nGood == 2)
    assert(spark.read.parquet(outGood).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(7L, 9L))

    // a non-numeric id would become NULL after the long cast: fail fast
    Files.writeString(Paths.get(s"$in/badid.jsonl"),
      """{"doc_id":"7","text":"alpha"}
        |{"doc_id":"not-a-number","text":"beta"}
        |""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      Main.ingestCmd(spark, Map(
        "in" -> s"$in/badid.jsonl", "out" -> tmpDir("cli-ingest-id-bad")))
    }
    assert(e1.getMessage.contains("non-numeric"))

    // duplicate upstream ids corrupt every keyed operator: fail fast
    Files.writeString(Paths.get(s"$in/dupid.jsonl"),
      """{"doc_id":"7","text":"alpha"}
        |{"doc_id":"7","text":"beta"}
        |""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      Main.ingestCmd(spark, Map(
        "in" -> s"$in/dupid.jsonl", "out" -> tmpDir("cli-ingest-id-dup")))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("join-asof verb: nearest + tolerance through the native operator, left-total") {
    val dir = tmpDir("cli-asof")
    Seq((1L, 18L, "mid"), (1L, 25L, "fwd"), (2L, 10L, "none"))
      .toDF("k", "t", "tag").write.mode("overwrite").parquet(s"$dir/left")
    Seq((1L, 10L, 100L), (1L, 10L, 101L), (1L, 30L, 102L))
      .toDF("k", "rt", "rid").write.mode("overwrite").parquet(s"$dir/right")
    val out = s"$dir/out"
    val (o, n) = Main.joinAsofCmd(spark, Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid", "direction" -> "nearest",
      "tolerance-ms" -> "20", "out" -> out))
    assert(o == out && n == 3) // left-total: one output row per left row
    val got = spark.read.parquet(out).select("tag", "rid")
      .as[(String, Option[Long])].collect().toMap
    assert(got == Map(
      "mid" -> Some(101L),  // 8 back vs 12 fwd: backward arm, tie rid 101
      "fwd" -> Some(102L),  // 15 back vs 5 fwd: forward arm
      "none" -> None))      // key 2 has no right rows
    // mapped key names and the backward default also parse
    val out2 = s"$dir/out2"
    val (_, n2) = Main.joinAsofCmd(spark, Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k=k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid", "out" -> out2))
    assert(n2 == 3)
    val back = spark.read.parquet(out2).select("tag", "rid")
      .as[(String, Option[Long])].collect().toMap
    assert(back("mid").contains(101L) && back("fwd").contains(101L))
    val bad = intercept[IllegalArgumentException] {
      Main.joinAsofCmd(spark, Map(
        "left" -> s"$dir/left", "right" -> s"$dir/right",
        "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
        "direction" -> "sideways", "out" -> s"$dir/out3"))
    }
    assert(bad.getMessage.contains("backward|forward|nearest"))
    // --salt N forces the salted merge, --salt auto detects (and on this
    // tiny uniform fixture routes plain); both answers match the default
    val base = Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid")
    val (_, nS) = Main.joinAsofCmd(spark,
      base ++ Map("salt" -> "4", "out" -> s"$dir/outS"))
    assert(nS == 3)
    val saltGot = spark.read.parquet(s"$dir/outS").select("tag", "rid")
      .as[(String, Option[Long])].collect().toMap
    assert(saltGot == back, s"--salt must never change the answer: $saltGot")
    assert(!spark.read.parquet(s"$dir/outS").columns.exists(_.contains("salt")))
    val (_, nA) = Main.joinAsofCmd(spark,
      base ++ Map("salt" -> "auto", "out" -> s"$dir/outA"))
    assert(nA == 3)
    val autoGot = spark.read.parquet(s"$dir/outA").select("tag", "rid")
      .as[(String, Option[Long])].collect().toMap
    assert(autoGot == back, s"--salt auto must never change the answer: $autoGot")
    val badSalt = intercept[IllegalArgumentException] {
      Main.joinAsofCmd(spark, base ++ Map("salt" -> "1", "out" -> s"$dir/outB"))
    }
    assert(badSalt.getMessage.contains("auto"), badSalt.getMessage)
  }

  test("join-asof --stream: checkpointed left joins only new files on restart") {
    val dir = tmpDir("cli-asof-stream")
    Seq((1L, 10L, 100L), (1L, 30L, 102L))
      .toDF("k", "rt", "rid").write.mode("overwrite").parquet(s"$dir/right")
    // first left file, first run
    Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    val args = Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid", "stream" -> "true",
      "checkpoint" -> s"$dir/ckpt", "out" -> s"$dir/out")
    val (_, n1) = Main.joinAsofCmd(spark, args)
    assert(n1 == 1L)
    // a second file lands; the same checkpoint must process ONLY it
    Seq((1L, 31L, 1L)).toDF("k", "t", "lid")
      .write.mode("append").parquet(s"$dir/left")
    val (_, n2) = Main.joinAsofCmd(spark, args)
    assert(n2 == 1L, s"restart must join only the new file's rows, got $n2")
    val got = spark.read.parquet(s"$dir/out").select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(0L -> Some(100L), 1L -> Some(102L)),
      s"both runs' backward matches must accumulate in out: $got")
  }

  test("join-asof --right-stream: both sides live, dimension state survives restart") {
    val dir = tmpDir("cli-asof-ss")
    Seq((1L, 10L, 100L))
      .toDF("k", "rt", "rid").write.mode("overwrite").parquet(s"$dir/right")
    Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    val args = Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid", "stream" -> "true", "right-stream" -> "true",
      "watermark" -> "1hour", // unspaced form: one argv token pre-parse
      "mode" -> "arrival", // this test pins the live arrival contract
      "checkpoint" -> s"$dir/ckpt", "out" -> s"$dir/out")
    val (_, n1) = Main.joinAsofCmd(spark, args)
    assert(n1 == 1L)
    // BOTH sides advance; the restarted query must resume from the
    // checkpoint, see only the new files, and key 1's held dimension row
    // must have been superseded by the newer write before the new fact
    Seq((1L, 30L, 102L))
      .toDF("k", "rt", "rid").write.mode("append").parquet(s"$dir/right")
    Seq((1L, 31L, 1L), (2L, 6L, 4L)).toDF("k", "t", "lid")
      .write.mode("append").parquet(s"$dir/left")
    val (_, n2) = Main.joinAsofCmd(spark, args)
    assert(n2 == 2L, s"restart must join only the new files' rows, got $n2")
    val got = spark.read.parquet(s"$dir/out").select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(0L -> Some(100L), 1L -> Some(102L), 4L -> None),
      s"stream-stream CLI result diverged: $got")
    // a live join can't look forward: reject loudly
    val bad = intercept[IllegalArgumentException] {
      Main.joinAsofCmd(spark, args ++ Map("direction" -> "forward",
        "checkpoint" -> s"$dir/ckpt2", "out" -> s"$dir/out2"))
    }
    assert(bad.getMessage.contains("backward"))
    // and an unknown ordering contract rejects loudly too
    val badMode = intercept[IllegalArgumentException] {
      Main.joinAsofCmd(spark, args ++ Map("mode" -> "sideways",
        "checkpoint" -> s"$dir/ckpt3", "out" -> s"$dir/out3"))
    }
    assert(badMode.getMessage.contains("event-time|arrival"))
  }

  test("join-asof --right-stream --mode event-time: out-of-order dimension write retro-matches") {
    // the default event-time contract through the CLI: the fact arrives
    // in run 1, the dimension row it must match (rt < t) only in run 2;
    // flush runs advance the watermark until the buffered fact drains —
    // the tail-stays-buffered behavior the CLI doc promises
    val dir = tmpDir("cli-asof-et")
    Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rid")
      .write.mode("overwrite").parquet(s"$dir/right")
    val args = Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right",
      "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
      "tiebreak" -> "rid", "stream" -> "true", "right-stream" -> "true",
      "watermark" -> "1minute",
      "checkpoint" -> s"$dir/ckpt", "out" -> s"$dir/out")
    val (_, n1) = Main.joinAsofCmd(spark, args)
    assert(n1 == 0L, "nothing may emit before the watermark passes the fact")
    Seq((1L, 10L, 100L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    Main.joinAsofCmd(spark, args)
    Seq((9L, 10000000L, 900L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    Main.joinAsofCmd(spark, args)
    Seq((9L, 10000001L, 901L)).toDF("k", "rt", "rid")
      .write.mode("append").parquet(s"$dir/right")
    Main.joinAsofCmd(spark, args)
    val got = spark.read.parquet(s"$dir/out").select("lid", "rid")
      .as[(Long, Option[Long])].collect().toList
    assert(got == List((0L, Some(100L))),
      s"the late dimension write must retro-match exactly once: $got")
  }

  test("join-asof --stream rejects an out dir holding the legacy flat layout") {
    val dir = tmpDir("cli-asof-legacy")
    Seq((1L, 10L, 100L)).toDF("k", "rt", "rid")
      .write.mode("overwrite").parquet(s"$dir/right")
    Seq((1L, 18L, 0L)).toDF("k", "t", "lid")
      .write.mode("overwrite").parquet(s"$dir/left")
    // a pre-batch_id out dir: flat parquet files at the root
    Seq((0L, Some(100L))).toDF("lid", "rid")
      .write.mode("overwrite").parquet(s"$dir/out")
    val err = intercept[IllegalArgumentException] {
      Main.joinAsofCmd(spark, Map(
        "left" -> s"$dir/left", "right" -> s"$dir/right",
        "on" -> "k", "left-time" -> "t", "right-time" -> "rt",
        "stream" -> "true", "checkpoint" -> s"$dir/ckpt",
        "out" -> s"$dir/out"))
    }
    assert(err.getMessage.contains("batch_id"),
      s"legacy layout must fail with the migration hint: ${err.getMessage}")
  }

  test("interval-join verb: pairs and --count round-trip through parquet") {
    val dir = tmpDir("cli-ij")
    Seq((1L, 0L, 10L, 0L), (1L, 20L, 30L, 1L), (2L, 0L, 10L, 2L))
      .toDF("k", "s", "e", "lid").write.mode("overwrite").parquet(s"$dir/left")
    Seq((1L, 5L, 8L, 10L), (1L, 9L, 25L, 11L), (2L, 50L, 60L, 12L))
      .toDF("k", "ws", "we", "rid").write.mode("overwrite").parquet(s"$dir/right")
    val base = Map(
      "left" -> s"$dir/left", "right" -> s"$dir/right", "on" -> "k",
      "left-start" -> "s", "left-end" -> "e",
      "right-start" -> "ws", "right-end" -> "we")
    val (_, nP) = Main.intervalJoinCmd(spark,
      base ++ Map("bucket-ms" -> "8", "out" -> s"$dir/pairs"))
    assert(nP == 3)
    val pairs = spark.read.parquet(s"$dir/pairs")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 10L), (0L, 11L), (1L, 11L)),
      s"pairs diverged: $pairs")
    // --count, adaptive bucket (no --bucket-ms): left-total census
    val (_, nC) = Main.intervalJoinCmd(spark,
      base ++ Map("count" -> "true", "out" -> s"$dir/counts"))
    assert(nC == 3)
    val counts = spark.read.parquet(s"$dir/counts")
      .select("lid", "n_overlaps").as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 2L, 1L -> 1L, 2L -> 0L), s"census diverged: $counts")
    val bad = intercept[IllegalArgumentException] {
      Main.intervalJoinCmd(spark,
        base ++ Map("bucket-ms" -> "soon", "out" -> s"$dir/x"))
    }
    assert(bad.getMessage.contains("millisecond"))
    // point-in-interval mode: --right-point against a points table
    Seq((1L, 7L, 20L), (1L, 25L, 21L), (2L, 55L, 22L), (2L, 99L, 23L))
      .toDF("k", "p", "pid").write.mode("overwrite").parquet(s"$dir/points")
    val (_, nCt) = Main.intervalJoinCmd(spark, Map(
      "left" -> s"$dir/left", "right" -> s"$dir/points", "on" -> "k",
      "left-start" -> "s", "left-end" -> "e", "right-point" -> "p",
      "count" -> "true", "out" -> s"$dir/pcounts"))
    assert(nCt == 3)
    val pCounts = spark.read.parquet(s"$dir/pcounts")
      .select("lid", "n_matches").as[(Long, Long)].collect().toMap
    // lid0 [0,10) holds p=7; lid1 [20,30) holds p=25; lid2 (k=2) [0,10)
    // holds neither k=2 point (55, 99)
    assert(pCounts == Map(0L -> 1L, 1L -> 1L, 2L -> 0L), s"$pCounts")
    val conflicted = intercept[IllegalArgumentException] {
      Main.intervalJoinCmd(spark, Map(
        "left" -> s"$dir/left", "right" -> s"$dir/points",
        "left-start" -> "s", "left-end" -> "e", "right-point" -> "p",
        "right-start" -> "p", "out" -> s"$dir/x2"))
    }
    assert(conflicted.getMessage.contains("mutually exclusive"))
    // --report prices a width without running the join
    val (repOut, repCand) = Main.intervalJoinCmd(spark, base ++ Map(
      "bucket-ms" -> "8", "report" -> "true", "out" -> s"$dir/unused"))
    assert(repOut == "(report)")
    // slots at width 8 for the fixture: candidates = sum |L|x|R| per slot
    assert(repCand > 0, s"report must count candidate pressure, got $repCand")
    assert(!new java.io.File(s"$dir/unused").exists, "--report must not write output")
    // --report + --stream: the dry-run flag must never lose to the
    // branch that consumes files and advances a checkpoint
    val dryVsRun = intercept[IllegalArgumentException] {
      Main.intervalJoinCmd(spark, base ++ Map(
        "bucket-ms" -> "8", "report" -> "true", "stream" -> "true",
        "checkpoint" -> s"$dir/ck-dry", "out" -> s"$dir/unused2"))
    }
    assert(dryVsRun.getMessage.contains("drop one of the two flags"))
    // the streaming overlap shape demands an explicit state bound
    val needMaxLen = intercept[IllegalArgumentException] {
      Main.intervalJoinCmd(spark, base ++ Map(
        "stream" -> "true", "checkpoint" -> s"$dir/ck0", "out" -> s"$dir/x3"))
    }
    assert(needMaxLen.getMessage.contains("max-len-ms"), needMaxLen.getMessage)
    // fully-duplicate left rows must NOT merge in the --count census:
    // the verb injects a per-row uniquifier (dropped on output), so the
    // census stays one row per input left row
    Seq((1L, 0L, 10L, 0L), (1L, 0L, 10L, 0L), (1L, 20L, 30L, 1L))
      .toDF("k", "s", "e", "lid").write.mode("overwrite").parquet(s"$dir/dupleft")
    val (_, nDup) = Main.intervalJoinCmd(spark, base ++ Map(
      "left" -> s"$dir/dupleft", "count" -> "true",
      "bucket-ms" -> "8", "out" -> s"$dir/dupcounts"))
    assert(nDup == 3, s"duplicate left rows must each keep a census row, got $nDup")
    val dupOut = spark.read.parquet(s"$dir/dupcounts")
    assert(!dupOut.columns.contains("__ij_cli_rowid"), "uniquifier must be dropped")
    val dupCounts = dupOut
      .select("lid", "n_overlaps").as[(Long, Long)].collect().sorted.toSeq
    assert(dupCounts == Seq((0L, 2L), (0L, 2L), (1L, 1L)), s"$dupCounts")
  }

  test("interval-join --stream: live intervals + points, checkpointed, batch-equal") {
    val dir = tmpDir("cli-ij-stream")
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    val H = 3600000L
    // epoch-ms intervals (the streaming arm's unit contract); the far-
    // future flush point (pid 12, +10h) advances the watermark (2h
    // delay) past every real event so the buffered matches drain
    Seq((1L, h0, h0 + 600000L, 0L), (2L, h0 + 60000L, h0 + 120000L, 1L))
      .toDF("k", "s", "e", "iid").write.mode("overwrite").parquet(s"$dir/iv")
    Seq((1L, h0 + 300000L, 10L), (2L, h0 + 90000L, 11L), (9L, h0 + 10 * H, 12L))
      .toDF("pk", "p", "pid").write.mode("overwrite").parquet(s"$dir/pt")
    val args = Map(
      "left" -> s"$dir/iv", "right" -> s"$dir/pt", "on" -> "k=pk",
      "left-start" -> "s", "left-end" -> "e", "right-point" -> "p",
      "stream" -> "true", "checkpoint" -> s"$dir/ck",
      "watermark" -> "2hours", "out" -> s"$dir/out")
    val (_, n1) = Main.intervalJoinCmd(spark, args)
    assert(n1 == 2, s"first run must emit the two passed matches, got $n1")
    val got = spark.read.parquet(s"$dir/out").select("iid", "pid")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 10L), (1L, 11L)), s"$got")
    // restart with the same checkpoint: only NEW files are consumed —
    // a fresh interval + in-window point BEYOND the persisted watermark
    // (~h0+8h), plus a new flush row to drain them
    Seq((3L, h0 + 9 * H, h0 + 9 * H + 600000L, 2L))
      .toDF("k", "s", "e", "iid").coalesce(1)
      .write.mode("append").parquet(s"$dir/iv")
    Seq((3L, h0 + 9 * H + 60000L, 13L), (9L, h0 + 20 * H, 14L))
      .toDF("pk", "p", "pid").coalesce(1)
      .write.mode("append").parquet(s"$dir/pt")
    val (_, n2) = Main.intervalJoinCmd(spark, args)
    assert(n2 == 1, s"restart must emit only the new match, got $n2")
    val got2 = spark.read.parquet(s"$dir/out").select("iid", "pid")
      .as[(Long, Long)].collect().toSet
    assert(got2 == Set((0L, 10L), (1L, 11L), (2L, 13L)), s"$got2")
  }

  test("interval-join --stream overlap shape: stream-stream range join, batch-equal") {
    val dir = tmpDir("cli-ij-sso")
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    Seq((1L, h0, h0 + 60000L, 0L), (1L, h0 + 120000L, h0 + 180000L, 1L),
        (2L, h0, h0 + 30000L, 2L))
      .toDF("k", "s", "e", "lid").write.mode("overwrite").parquet(s"$dir/l")
    Seq((1L, h0 + 30000L, h0 + 90000L, 10L), (1L, h0 + 170000L, h0 + 200000L, 11L),
        (2L, h0 + 40000L, h0 + 50000L, 12L))
      .toDF("rk", "rs", "re", "rid").write.mode("overwrite").parquet(s"$dir/r")
    val want = graft.operators.IntervalJoin.overlap(
        spark.read.parquet(s"$dir/l"), spark.read.parquet(s"$dir/r"),
        Seq("k" -> "rk"), "s", "e", "rs", "re", bucketMs = Some(30000L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(want == Set((0L, 10L), (1L, 11L)), s"batch reference: $want")
    val (_, n) = Main.intervalJoinCmd(spark, Map(
      "left" -> s"$dir/l", "right" -> s"$dir/r", "on" -> "k=rk",
      "left-start" -> "s", "left-end" -> "e",
      "right-start" -> "rs", "right-end" -> "re",
      "stream" -> "true", "checkpoint" -> s"$dir/ck",
      "max-len-ms" -> "120000", "out" -> s"$dir/out"))
    // inner stream-stream join: pairs emit in the run both sides arrive
    assert(n == 2, s"overlap pairs must emit without a flush, got $n")
    val got = spark.read.parquet(s"$dir/out").select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"$got")
  }

  test("sessionize verb: batch and streaming arms agree; stream resumes from checkpoint") {
    val dir = tmpDir("cli-sess")
    val gap = 60000L
    val h0 = 1700000000000L
    // two users, sessions split by >60s gaps; fed to the stream arm in
    // TWO runs (restart), shuffled within each run's file
    val phase1 = Seq((1L, h0 + 5000L), (1L, h0), (2L, h0 + 2000L))
    val phase2 = Seq((1L, h0 + 200000L), (2L, h0 + 3000L + 0L),
      (2L, h0 + 400000L))
    (phase1 ++ phase2).toDF("user_id", "ts_ms")
      .write.mode("overwrite").parquet(s"$dir/all")
    val (_, nB) = Main.sessionizeCmd(spark, Map(
      "in" -> s"$dir/all", "out" -> s"$dir/batch", "gap-ms" -> gap.toString))
    val batch = spark.read.parquet(s"$dir/batch")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(nB == 4 && batch == Set(
      (1L, h0, h0 + 5001L, 2L), (1L, h0 + 200000L, h0 + 200001L, 1L),
      (2L, h0 + 2000L, h0 + 3001L, 2L), (2L, h0 + 400000L, h0 + 400001L, 1L)),
      s"batch sessions diverged: $batch")
    // stream arm: phase 1, then phase 2 + a flush user far enough ahead
    // that the watermark closes every real session
    phase1.toDF("user_id", "ts_ms").write.mode("overwrite").parquet(s"$dir/feed")
    val args = Map("in" -> s"$dir/feed", "out" -> s"$dir/stream",
      "gap-ms" -> gap.toString, "stream" -> "true",
      "watermark" -> "5minutes", "checkpoint" -> s"$dir/ckpt")
    Main.sessionizeCmd(spark, args)
    phase2.toDF("user_id", "ts_ms").write.mode("append").parquet(s"$dir/feed")
    Main.sessionizeCmd(spark, args)
    Seq((99L, h0 + 100L * 3600000L)).toDF("user_id", "ts_ms")
      .write.mode("append").parquet(s"$dir/feed")
    Main.sessionizeCmd(spark, args)
    Seq((99L, h0 + 100L * 3600000L + 1L)).toDF("user_id", "ts_ms")
      .write.mode("append").parquet(s"$dir/feed")
    Main.sessionizeCmd(spark, args)
    val streamed = spark.read.parquet(s"$dir/stream")
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(_._1 != 99L)
    assert(streamed == batch,
      s"stream arm diverged from batch: $streamed vs $batch")
  }

  test("hll kind: build, incremental update, and the overlap verb round-trip") {
    import graft.queries.SketchQueries
    val out = tmpDir("cli-hll-index")
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    batch.write.mode("overwrite").parquet(s"$out-batch")
    Main.buildIndexCmd(spark,
      Map("kind" -> "hll", "in" -> s"$out-corpus", "out" -> out))
    // incremental update through the verb ≈ full rebuild (HIP
    // merge-order wobble bounded at 1% + 2 — see SketchSpec)
    val (_, upd, grown) = Main.updateIndexCmd(spark, Map("kind" -> "hll",
      "in" -> s"$out-batch", "index" -> out, "out" -> s"$out-upd"))
    assert(grown == batch.count())
    def ests(ix: SketchQueries.HllIndex): Map[String, Long] = ix.sketches
      .select(col("source"),
        org.apache.spark.sql.functions.hll_sketch_estimate(col("sk")).cast("long"))
      .as[(String, Long)].collect().toMap
    val full = ests(SketchQueries.buildHllIndex(d))
    val incr = ests(SketchQueries.HllIndex.load(spark, upd))
    assert(full.keySet == incr.keySet)
    full.foreach { case (s, fe) =>
      assert(math.abs(fe - incr(s)) <= fe / 100 + 2, s"$s: $fe vs ${incr(s)}")
    }
    // the overlap verb: the src12 batch probed against the corpus-only
    // index — src12 shares content with the corpus (the fixture's
    // planted cross-source dups) but nothing should exceed the batch
    // plus sketch noise
    val probeOut = tmpDir("cli-hll-probe")
    val (_, nProbed) = Main.overlapCmd(spark,
      Map("in" -> s"$out-batch", "index" -> out, "out" -> probeOut))
    val rows = spark.read.parquet(probeOut)
      .select("source", "n_batch", "n_shared_est")
      .as[(String, Long, Long)].collect()
    assert(nProbed == rows.length && rows.nonEmpty)
    assert(!rows.exists(_._1 == "src12"), "index was built without src12")
    rows.foreach { case (s, nb, sh) =>
      assert(sh >= 0 && sh <= (nb * 21) / 20 + 20,
        s"$s: shared $sh outside [0, batch + noise] for batch $nb")
    }
  }

  test("overlap verb routes by artifact kind: theta artifacts probe by direct intersection") {
    val out = tmpDir("cli-theta-index")
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    batch.write.mode("overwrite").parquet(s"$out-batch")
    Main.buildIndexCmd(spark,
      Map("kind" -> "theta", "in" -> s"$out-corpus", "out" -> out))
    val probeOut = tmpDir("cli-theta-probe")
    val (_, n) = Main.overlapCmd(spark,
      Map("in" -> s"$out-batch", "index" -> out, "out" -> probeOut))
    assert(n > 0)
    // exact shared-gram counts per source for the src12 batch
    val g = d.select(col("source"),
      org.apache.spark.sql.functions.explode(
        graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      .distinct()
    val bg = g.filter(col("source") === "src12").select("g").distinct()
    val exact = g.filter(col("source") =!= "src12")
      .join(bg, "g").groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val got = spark.read.parquet(probeOut)
      .select("source", "n_shared_est")
      .as[(String, Long)].collect().toMap
    // sub-sketch-capacity corpus: theta is exact here — estimates must
    // EQUAL the exact counts (IE through hll would only be close)
    exact.foreach { case (s, e) =>
      assert(got(s) == e, s"$s: theta probe ${got(s)} != exact $e")
    }
    got.filterNot { case (s, _) => exact.contains(s) }.foreach { case (s, v) =>
      assert(v == 0L, s"$s shares nothing with the batch, probe says $v")
    }
  }

  test("kll kind: build, update, and the quantiles verb answer rank-correct percentiles") {
    import graft.queries.SketchQueries
    val out = tmpDir("cli-kll-index")
    corpus.write.mode("overwrite").parquet(s"$out-corpus")
    batch.write.mode("overwrite").parquet(s"$out-batch")
    Main.buildIndexCmd(spark,
      Map("kind" -> "kll", "in" -> s"$out-corpus", "out" -> out))
    Main.updateIndexCmd(spark, Map("kind" -> "kll",
      "in" -> s"$out-batch", "index" -> out, "out" -> s"$out-upd"))
    val qOut = tmpDir("cli-kll-q")
    val (_, nRows) = Main.quantilesCmd(spark, Map(
      "index" -> s"$out-upd", "out" -> qOut, "ps" -> "0.5,0.9", "global" -> "true"))
    assert(nRows == 1L)
    val row = spark.read.parquet(qOut).head()
    val lens = d.select(col("n_chars").cast("double")).as[Double].collect().sorted
    assert(row.getLong(0) == lens.length, "global n_docs must cover corpus+batch")
    Seq(0.5 -> row.getDouble(1), 0.9 -> row.getDouble(2)).foreach { case (p, est) =>
      val r = lens.count(_ <= est).toDouble / lens.length
      assert(math.abs(r - p) <= 0.05, s"global p$p=$est has rank $r")
    }
    intercept[IllegalArgumentException] { // ranks outside (0,1] rejected
      Main.quantilesCmd(spark, Map(
        "index" -> s"$out-upd", "out" -> tmpDir("cli-kll-bad"), "ps" -> "0,1.5"))
    }
  }

  test("every kind lands on the shared IndexArtifact layout") {
    // one convention across kinds: named frames under <out>/<frame>,
    // scalars (drift only) under <out>/_meta — so any downstream job
    // can scan an index frame like an ordinary parquet table
    def frames(out: String): Set[String] =
      new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(frames(cmd("neardup")) == Set("bands", "grams"))
    assert(frames(cmd("chunk")) == Set("fps"))
    assert(frames(cmd("winnow")) == Set("fps"))
    assert(frames(cmd("drift")) == Set("counts", "_meta"))
    assert(frames(cmd("hll")) == Set("sketches"))
    assert(frames(cmd("kll")) == Set("sketches"))
    assert(frames(cmd("theta")) == Set("sketches", "_meta"))
    // ivf builds from embeddings, not documents
    val ivfOut = tmpDir("cli-ivf-index")
    Main.buildIndexCmd(spark, Map("kind" -> "ivf",
      "in" -> s"${graft.SparkSuite.sf0001}/embeddings.parquet", "out" -> ivfOut))
    assert(frames(ivfOut) == Set("centroids", "vectors"))
    // minmax builds from any flat parquet dir and needs --cols
    val mmOut = tmpDir("cli-minmax-index")
    Main.buildIndexCmd(spark, Map("kind" -> "minmax",
      "in" -> s"${graft.SparkSuite.sf0001}/lineitem.parquet", "out" -> mmOut,
      "cols" -> "l_partkey"))
    assert(frames(mmOut) == Set("stats"))
    intercept[IllegalArgumentException] { // --cols is mandatory
      Main.buildIndexCmd(spark, Map("kind" -> "minmax",
        "in" -> s"${graft.SparkSuite.sf0001}/lineitem.parquet",
        "out" -> tmpDir("cli-minmax-bad")))
    }
  }
}
