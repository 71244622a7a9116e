package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: decompose the three similarity-join gates that read >10×
  * for 10× data in the r11+r12 sf1 sweeps — `d_jaccard_prefix`,
  * `d_winnow_overlap`, `d_bbit_minhash` — into their pipeline stages so
  * candidate growth can be separated from verify work and from genuine
  * output growth. The question the probe answers: is the super-linear
  * wall-clock CANDIDATE-bound (a filter stage is missing / too weak),
  * VERIFY-bound (per-candidate exact work grows), or OUTPUT-bound (the
  * corpus's duplicate rate rises with size, so the answer itself
  * grows)? Run at sf0.1 and sf1 and compare the per-stage ratios.
  *
  * Usage: runMain graft.tools.SimJoinProbe [sfDir] [reps]
  */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(name: String)(f: => Seq[(String, Long)]): Unit = {
      val t0 = System.nanoTime()
      val kvs = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s ${secs}%7.2f s  " +
        kvs.map { case (k, v) => s"$k=$v" }.mkString("  "))
    }

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep  dir=$dir ===")

      // ---- d_jaccard_prefix: grams -> prefixes -> candidates -> verify
      val grams = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      t("prefix/grams") { Seq("rows" -> grams.count()) }
      val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
      t("prefix/vocab") {
        val r = dfreq.agg(count(lit(1)).as("v"), max("df").as("maxdf")).head()
        Seq("vocab" -> r.getLong(0), "max_df" -> r.getLong(1))
      }
      val pref = grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(collect_list(struct(col("df"), col("g"))).as("pairs"))
        .select(col("doc_id"), size(col("pairs")).cast("long").as("n"),
          posexplode(expr(
            "slice(array_sort(pairs), 1, cast(floor(size(pairs) * 0.2) as int) + 1).g"))
            .as(Seq("i", "g")))
      t("prefix/prefix-rows") { Seq("rows" -> pref.count()) }
      // candidate stage WITHOUT the PPJoin length/positional residuals —
      // the r12 form, kept for before/after comparison
      val cand0 = pref.as("a").join(pref.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      t("prefix/cand-unfiltered") { Seq("rows" -> cand0.count()) }
      // candidate stage exactly as the gate builds it (length +
      // positional residuals in-join)
      val cand = pref.as("a").join(pref.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n") * 4 <= col("b.n") * 5 && col("b.n") * 4 <= col("a.n") * 5 &&
            least(col("a.n") - col("a.i"), col("b.n") - col("b.i")) * 9 >=
              (col("a.n") + col("b.n")) * 4)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      t("prefix/cand-expanded") { Seq("rows" -> cand.count()) }
      val candD = cand.distinct()
      t("prefix/cand-distinct") { Seq("pairs" -> candD.count()) }
      val docsG = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          graft.functions.WordNGrams.word_ngrams(col("text"), 3).as("gs"))
      val verified = candD
        .join(docsG.select(col("doc_id").as("id1"), col("gs").as("gs1")), "id1")
        .join(docsG.select(col("doc_id").as("id2"), col("gs").as("gs2")), "id2")
        .withColumn("inter", size(array_intersect(col("gs1"), col("gs2"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("gs1")) + size(col("gs2")) - col("inter")))
      t("prefix/verify+output") {
        val r = verified.agg(
          count(lit(1)).as("verified"),
          sum((size(col("gs1")) + size(col("gs2"))).cast("long")).as("vwork"),
          sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("out")).head()
        Seq("verified" -> r.getLong(0), "verify_gram_work" -> r.getLong(1),
          "output_pairs" -> r.getLong(2))
      }

      // ---- d_winnow_overlap: winnowed index -> buckets -> pair expansion
      graft.queries.TextQueries.dropWinnowCache(spark)
      val fps = graft.queries.TextQueries
        .buildWinnowIndex(spark.read.parquet(s"$dir/documents.parquet")).fps
        .select(col("doc_id"), explode(expr("array_distinct(sel.h)")).as("h"))
      t("winnow/index-rows") { Seq("rows" -> fps.count()) }
      val buckets = fps.groupBy("h").agg(count(lit(1)).as("n"))
      t("winnow/buckets") {
        val r = buckets.filter(col("n") > 1).agg(
          count(lit(1)).as("nb"),
          sum(expr("n * (n - 1) div 2")).as("pairRows"),
          max("n").as("maxb")).head()
        Seq("buckets_gt1" -> r.getLong(0), "expanded_pair_rows" -> r.getLong(1),
          "max_bucket" -> r.getLong(2))
      }
      t("winnow/output") {
        Seq("output_pairs" ->
          graft.queries.TextQueries.winnowOverlap(spark, dir).count())
      }

      // ---- d_bbit_minhash: signature pass + pairs×64 calibration join
      t("bbit/signature-rows") {
        // the docs×64 narrow bit table — corpus-pass cost, no pair term
        val n = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            size(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("ng"))
          .filter(col("ng") > 0).count()
        Seq("docs_with_sig" -> n, "bit_rows" -> n * 64)
      }
      t("bbit/full-query") {
        Seq("output_pairs" ->
          graft.queries.TextQueries.bbitMinhash(spark, dir).count())
      }

      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
