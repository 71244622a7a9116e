package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the CURRENT TextQueries.minhashLsh pipeline stage by
  * stage (native word_ngrams gram table, fused MinHash+band aggregator,
  * band join, verification) to localize fixed per-stage overhead.
  */
object MinhashProbe {
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
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val grams = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          explode(graft.functions.WordNGrams.word_ngrams(col("text"), 3)).as("g"))
      t("grams")(grams.count())
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      t("sizes")(sizes.count())
      val mh = udaf(graft.functions.MinHashBandAggregator)
      val banded = grams
        .withColumn("gh", xxhash64(col("g")))
        .groupBy("doc_id").agg(mh(col("gh")).as("bh"))
        .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "bh")))
      t("banded")(banded.count())
      val candDF = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      import spark.implicits._
      var candRows: Array[(Long, Long)] = null
      t("candidates")({ candRows = candDF.as[(Long, Long)].collect(); candRows.length.toLong })
      val candidates = candRows.toSeq.toDF("id1", "id2")
      val g1 = grams.select(col("doc_id").as("id1"), col("g"))
      val g2 = grams.select(col("doc_id").as("id2"), col("g"))
      val inter = g2
        .join(broadcast(candidates.join(g1, "id1")), Seq("id2", "g"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
      t("inter")(inter.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
