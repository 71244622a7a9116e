package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for d_containment's candidate-generation forms (r15): times the
  * full query (construction + noop sink, bench methodology: min of 2
  * after one untimed warm) with three candidate generators feeding the
  * SAME exact verify — the shipped prefix-bounded arm, the plain
  * inverted-index self-join, and the bucket-grouped expansion. All
  * three provably return identical rows (the verify filter defines the
  * answer; candidates only differ in superset size).
  *
  * r15 measurement that killed the "route small corpora to an
  * unbounded arm" idea (sf0.1, local[32], same session, canary-
  * bracketed): prefix 3.0–3.8s, selfjoin 5.5s, bucket 5.5s — the
  * crossover sits BELOW sf0.1 on the current corpus, so the prefix
  * bound stays unconditional in [[graft.queries.TextQueries.containment]].
  *
  * Usage: runMain graft.tools.ContainAb [sfDir]
  */
object ContainAb {
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

    def docsG = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.WordNGrams.word_ngrams(col("text"), 3).as("gs"))
    def idx = docsG.select(col("doc_id"), size(col("gs")).as("n"),
      explode(col("gs")).as("g"))

    def verify(cand: DataFrame): DataFrame = cand
      .join(docsG.select(col("doc_id").as("id1"), col("gs").as("gs1")), "id1")
      .join(docsG.select(col("doc_id").as("id2"), col("gs").as("gs2")), "id2")
      .withColumn("inter", size(array_intersect(col("gs1"), col("gs2"))))
      .withColumn("containment", col("inter").cast("double") /
        least(size(col("gs1")), size(col("gs2"))))
      .filter(col("containment") >= 0.9)
      .select("id1", "id2", "containment")
      .orderBy("id1", "id2")

    def selfJoinCand: DataFrame = {
      val i = idx.select("doc_id", "g")
      i.as("a").join(i.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
    }

    def bucketCand: DataFrame = idx.groupBy("g")
      .agg(expr("sort_array(collect_list(doc_id))").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
      .select(col("id1"),
        explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("id2"))
      .distinct()

    def timeDf(label: String, mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once() // warm (janino/JIT for this arm's operator shapes)
      println(f"[containab] $label%-8s ${math.min(once(), once())}%.3f s")
    }

    timeDf("prefix", () =>
      graft.SparkEntry.queries("d_containment")(spark, sfDir))
    timeDf("selfjoin", () => verify(selfJoinCand))
    timeDf("bucket", () => verify(bucketCand))
    timeDf("prefix2", () =>
      graft.SparkEntry.queries("d_containment")(spark, sfDir))
    spark.stop()
  }
}
