package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis + document-dedup operators over the `documents` table —
  * the LLM-training-pipeline surface (dedup, quality, lang-id, token
  * stats, fingerprints). Everything is declarative column algebra; the
  * pairwise-similarity operators use the sparse inverted-index join
  * (gram -> doc) that scales as the standard MinHash/LSH pipeline.
  */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Exact dedup summary: distinct normalized-text fingerprints. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(fingerprint(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(fingerprint(col("text")))).as("n_dups"))

  /** Word-3-gram sets per doc: (doc_id, gram) rows + per-doc sizes.
    *
    * Built with posexplode + window `lead`, NOT transform(sequence(...))
    * over the token array: CollapseProject inlines the `split` into every
    * lambda element reference, re-evaluating it O(tokens) times per doc
    * in interpreted mode. The row-based form splits once per doc and
    * stays in whole-stage codegen.
    */
  private def gramTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs(spark, dir)
      .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "t")))
      .withColumn("t1", lead("t", 1).over(w))
      .withColumn("t2", lead("t", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("g"))
      .distinct()
      // reused up to 4x (signatures, verification x2, sizes): materialize
      // once instead of recomputing the explode+window+distinct lineage
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    (grams, sizes)
  }

  /** Exact pairwise n-gram Jaccard >= 0.8 via the inverted-index join
    * (gram -> docs): only docs sharing a gram are ever paired — the
    * sparse similarity join, not an O(n^2) cross join.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val (grams, sizes) = gramTables(spark, dir)
    jaccardOfPairs(
      grams.as("a").join(grams.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("inter")),
      sizes)
  }

  private def jaccardOfPairs(inter: DataFrame, sizes: DataFrame): DataFrame = {
    val j = col("inter").cast(DoubleType) / (col("n1") + col("n2") - col("inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("id1"), col("n").as("n1"))), "id1")
      .join(broadcast(sizes.select(col("doc_id").as("id2"), col("n").as("n2"))), "id2")
      .withColumn("jaccard", j)
      .filter(col("jaccard") >= 0.8)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** MinHash + LSH near-dup detection, verified with exact Jaccard — the
    * 100 TB-scale path: 128 permutations (xxhash64 seeded per index),
    * 32 bands x 4 rows; candidate pairs from band-bucket joins only,
    * then exact verification restricted to candidates. At the 0.8
    * threshold the miss probability per true pair is ~(1-s^4)^32 < 5e-8.
    * Output == exact n-gram Jaccard >= 0.8 (same oracle).
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val (grams, sizes) = gramTables(spark, dir)
    val bands = 32
    val rowsPerBand = graft.functions.MinHashAggregator.NumPerm / bands
    // per-doc minhash signature via the typed MinHash aggregator: one
    // string hash per gram + 128 integer mixes, no 128-column codegen
    // monster (observed janino compile dominating the flat-column form)
    val mh = udaf(graft.functions.MinHashAggregator)
    val sig = grams
      .withColumn("gh", xxhash64(col("g")))
      .groupBy("doc_id").agg(mh(col("gh")).as("sig"))
    // band hash: one row per (doc, band)
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("bh"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
      // materialize BEFORE the broadcast: a broadcast build over an
      // unmaterialized subtree re-executes it per partition (observed:
      // 32 sequential jobs re-running the whole LSH pipeline)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidates.count()
    // exact verification on candidates only; the candidate set is small
    // by LSH design — force broadcast so AQE can never pick a shuffled
    // join for it (observed plan-choice variance otherwise)
    val g1 = grams.select(col("doc_id").as("id1"), col("g"))
    val g2 = grams.select(col("doc_id").as("id2"), col("g"))
    val inter = g2
      .join(broadcast(candidates.join(g1, "id1")), Seq("id2", "g"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    jaccardOfPairs(inter, sizes)
  }

  /** SimHash near-dup detection: 64-bit signature from token hashes,
    * pairs with Hamming distance <= 6 found via 8x8-bit band join
    * (pigeonhole: <=7 differing bits always leave one band intact, so
    * recall at the <=6 threshold is exact). Hash-dependent — verified in
    * ScalaTest against the planted Jaccard pairs, no SQL oracle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // 64 flat weighted-bit-count aggregates over exploded tokens (codegen
    // + map-side partial agg; the lambda formulation is interpreted and
    // orders of magnitude slower), then assemble the 64-bit signature.
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitCols = (0 until 64).map { b =>
      sum(when(expr(s"(shiftright(h, $b) & 1L) = 1L"), 1L).otherwise(-1L)).as(s"b$b")
    }
    val simExpr = (0 until 64)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce((a, c) => a.bitwiseOR(c))
    val sigs = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"), simExpr.as("sim"))
    val banded = sigs.select(col("doc_id"), col("sim"),
        explode(expr(
          "transform(sequence(0, 7), k -> struct(k AS band, shiftright(sim, k * 8) & 255L AS bh))")).as("e"))
      .select(col("doc_id"), col("sim"), col("e.band"), col("e.bh"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("id1", "id2")
  }

  /** Token counting: whitespace tokens + regex ("BPE-ish") tokens. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast(LongType).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast(LongType).as("n_re_tokens"))
      .orderBy("doc_id")

  /** Quality scoring: token stats, alpha ratio, stopword ratio. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val w = wsTokens(col("text"))
    docs(spark, dir).select(
      col("doc_id"),
      size(w).cast(LongType).as("n_tokens"),
      (col("n_chars").cast(DoubleType) / size(w)).as("avg_token_len"),
      (size(regexp_extract_all(col("text"), lit("[a-zA-Z]"), lit(0))).cast(LongType)
        .cast(DoubleType) / col("n_chars")).as("alpha_ratio"),
      (tokensInSet(w, stopwords).cast(DoubleType) / size(w)).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** N-gram-heuristic language ID: marker-word counts per language,
    * argmax with fixed priority (en > de > fr > es).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val w = wsTokens(col("text"))
    val markers = Map(
      "en" -> Seq("the", "and", "of", "is"),
      "de" -> Seq("der", "und", "die", "ist"),
      "fr" -> Seq("le", "et", "les", "est"),
      "es" -> Seq("el", "y", "los", "es"))
    docs(spark, dir).select(
        col("doc_id"), col("lang"),
        tokensInSet(w, markers("en")).cast(LongType).as("c_en"),
        tokensInSet(w, markers("de")).cast(LongType).as("c_de"),
        tokensInSet(w, markers("fr")).cast(LongType).as("c_fr"),
        tokensInSet(w, markers("es")).cast(LongType).as("c_es"))
      .withColumn("pred_lang",
        when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") && col("c_en") >= col("c_es"), "en")
          .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), "de")
          .when(col("c_fr") >= col("c_es"), "fr")
          .otherwise("es"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: MD5 over normalized text. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Rabin-Karp rolling-hash fingerprint via the native Catalyst
    * expression (graft.functions.RollingHash — codegen'd, no UDF).
    */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Multimodal column plumbing: payloads as opaque binary + typed
    * metadata (real media decode is stubbed — see graft.multimodal).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
      sha2(col("text").cast(BinaryType), 256).as("sha"),
      expr("CAST(16 * (1 + n_chars % 64) AS INT)").as("fake_width"),
      expr("CAST(16 * (1 + n_chars % 36) AS INT)").as("fake_height"))
      .orderBy("doc_id")
}
