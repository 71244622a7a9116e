package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: time minhashLsh stage by stage at a given sf. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val grams = docs.select(col("doc_id"), explode(wordNgrams(wsTokens(col("text")), 3)).as("g"))
    t("grams")(grams.count())
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    t("sizes")(sizes.count())
    val nPerm = 128; val bands = 32; val rpb = 4
    val sigCols = (0 until nPerm).map(i => min(xxhash64(col("g"), lit(i))).as(s"s$i"))
    val sig = grams.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    t("sig")(sig.count())
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rpb).map(r => col(s"s${b * rpb + r}")): _*).as("bh"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    t("banded")(banded.count())
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    t("candidates")(candidates.count())
    val g1 = grams.select(col("doc_id").as("id1"), col("g"))
    val g2 = grams.select(col("doc_id").as("id2"), col("g"))
    val inter = g2
      .join(broadcast(candidates.join(g1, "id1")), Seq("id2", "g"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    inter.explain("formatted")
    t("inter")(inter.count())
    val j = col("inter").cast(DoubleType) / (col("n1") + col("n2") - col("inter"))
    val out = inter
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard", j)
      .filter(col("jaccard") >= 0.8)
    t("final")(42L)
    spark.stop()
  }
}
