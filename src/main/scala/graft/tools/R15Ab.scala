package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.queries.{SimilarityQueries, TextQueries}

/** Same-session A/B for the round-15 rewrites, timing construction +
  * noop action (bench methodology: one untimed warm, then min of 2) —
  * the honest comparison for construction-eager shapes whose routing
  * checks materialize the heavy aggregate BEFORE the final action
  * (MetricsDump times only the final action and undercounts them).
  *
  * Arms:
  *   scrub: shipped count-then-mark (two gram derivations + mark join)
  *          vs the one-pass capped-postings census — measured WORSE
  *          (typed-buffer aggregate over every occurrence) and rejected
  *   topk:  r14 unionAll symmetrize (pair core planned per arm) vs the
  *          shipped in-row explode symmetrize
  *   pca:   r14 unpersisted four-pass training vs the shipped
  *          persisted frame
  *
  * Usage: runMain graft.tools.R15Ab [sfDir]
  */
object R15Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def docsDf = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- scrub: the REJECTED one-pass capped-postings census (r15) —
    // kept here as the measured-worse arm; the shipped query is the
    // count-then-mark form whose scaladoc records this A/B ----
    def scrubCensus(): DataFrame = {
      val maxPostings = 10000
      val toks = TextQueries.tokArrays(docsDf)
      val grams = TextQueries.positionalGrams5(toks)
      val cc = udaf(graft.functions.CappedCollectPairs(maxPostings))
      val agg = grams.groupBy("g").agg(cc(col("doc_id"), col("p")).as("st"))
        .select(col("g"), col("st._1").as("ct"), col("st._2").as("dps"))
        .filter(col("ct") >= 2)
        .persist()
      val small = agg.filter(col("ct") <= maxPostings)
        .select(explode(col("dps")).as("dp"))
        .select(col("dp._1").as("doc_id"), col("dp._2").as("p"))
      val hotG = agg.filter(col("ct") > maxPostings).select("g")
      val marks = if (hotG.limit(1).count() == 0L) small else
        small.unionAll(grams.join(broadcast(hotG), "g").select("doc_id", "p"))
      graft.operators.CacheRelease.afterConsumer(agg)
      TextQueries.rebuildScrubbed(toks, TextQueries.covFromStarts(marks))
        .orderBy("doc_id")
    }

    // ---- topk: the r14 unionAll symmetrize over the routed census ----
    def topkOld(): DataFrame = {
      val pairs = TextQueries.winnowOverlapRouted(
        TextQueries.WinnowIndex(TextQueries.winnowFrame(spark, sfDir)),
        TextQueries.winnowMaxBucket, dfCap = None)
      val sym = pairs.select(col("id1").as("doc_id"),
          col("id2").as("partner_id"), col("n_shared"))
        .unionAll(pairs.select(col("id2").as("doc_id"),
          col("id1").as("partner_id"), col("n_shared")))
      val topk = udaf(graft.functions.TopKAggregator(3))
      sym.groupBy("doc_id")
        .agg(topk(col("n_shared").cast(DoubleType), col("partner_id")).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("doc_id"),
          (col("pos") + 1).cast(LongType).as("rnk"),
          col("p._2").as("partner_id"),
          col("p._1").cast(LongType).as("n_shared"))
        .orderBy("doc_id", "rnk")
    }

    // ---- pca: the r14 unpersisted four-pass training ----
    def pcaOld(): DataFrame = {
      import spark.implicits._
      val dims = 64
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> floor(cast(x as double) * 1048576.0))").as("q"))
      val means = e.select(posexplode(col("q")).as(Seq("i", "qi")))
        .groupBy("i").agg((sum("qi") / count(lit(1))).as("m"))
        .orderBy("i").select("m").as[Double].collect()
      require(means.length == dims)
      val ml = array(means.map(lit): _*)
      def centered = e.withColumn("c", zip_with(col("q"), ml, (a, b) => a - b))
      def dotCol(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, z) => acc + z)
      def step(v: Array[Double]): Array[Double] = {
        val vl = array(v.map(lit): _*)
        centered
          .withColumn("y", dotCol(col("c"), vl))
          .select(col("y"), posexplode(col("c")).as(Seq("i", "ci")))
          .groupBy("i")
          .agg(sum(round(col("y") * col("ci"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("w"))
          .orderBy("i")
          .select(col("w").cast("double")).as[Double].collect()
          .map(_ / 1099511627776.0)
      }
      val v1 = step(Array.fill(dims)(1.0))
      val v2 = step(v1)
      val norm = math.sqrt(v2.foldLeft(0.0)((a, x) => a + x * x))
      val vl2 = array(v2.map(lit): _*)
      centered
        .select(col("vec_id"),
          round(dotCol(col("c"), vl2) / lit(norm) / lit(1048576.0), 6).as("pc1"))
        .orderBy("vec_id")
    }

    def timeDf(label: String, mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        // bench semantics exactly: clearCache drops blocks (the winnow
        // memo re-arms and re-materializes inside the next timed run)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once() // warm: janino/JIT for this arm's operator shapes
      val t = math.min(once(), once())
      println(f"[r15ab] $label%-10s $t%.3f s")
      t
    }

    timeDf("scrub_mark", () =>
      graft.SparkEntry.queries("d_substring_scrub")(spark, sfDir))
    timeDf("scrub_census", () => scrubCensus())
    timeDf("topk_old", () => topkOld())
    timeDf("topk_new", () =>
      graft.SparkEntry.queries("d_winnow_topk")(spark, sfDir))
    timeDf("pca_old", () => pcaOld())
    timeDf("pca_new", () =>
      graft.SparkEntry.queries("s_pca_project")(spark, sfDir))
    // bracket: re-time the first arm to expose window drift across the run
    timeDf("scrub_mark2", () =>
      graft.SparkEntry.queries("d_substring_scrub")(spark, sfDir))
    spark.stop()
  }
}
