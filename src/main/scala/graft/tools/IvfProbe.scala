package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: time the IVF pipeline stage by stage to find the blowup. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = 64
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val e = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(Seq(col("vec_id")) ++
          (0 until D).map(i => element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
      base.withColumn("norm",
        sqrt((0 until D).map(i => col(s"e$i") * col(s"e$i")).reduce(_ + _)))
    }
    t("e")(e.count())
    val seeds = e.filter(col("vec_id") < 16)
      .select(Seq(col("vec_id").as("cell"), col("norm").as("snorm")) ++
        (0 until D).map(i => col(s"e$i").as(s"se$i")): _*)
    t("seeds")(seeds.count())
    def seedCos(l: String): Column =
      (0 until D).map(i => col(s"$l.e$i") * col(s"se$i")).reduce(_ + _) /
        (col(s"$l.norm") * col("snorm"))
    val crossed = e.as("a").join(broadcast(seeds), lit(true))
      .select(col("a.vec_id").as("vec_id"), col("cell"), seedCos("a").as("sc"))
    t("crossed")(crossed.count())
    val wAssign = Window.partitionBy("vec_id").orderBy(col("sc").desc, col("cell"))
    val assign = crossed
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
    t("assign")(assign.count())
    val wProbe = Window.partitionBy("query_id").orderBy(col("sc").desc, col("cell"))
    val probes = e.filter(col("vec_id") < 10).as("a")
      .join(broadcast(seeds), lit(true))
      .select(col("a.vec_id").as("query_id"), col("cell"), seedCos("a").as("sc"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= 4)
      .select("query_id", "cell")
    t("probes")(probes.count())
    val cand = probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    t("cand")(cand.count())
    def flatDot(l: String, r: String): Column =
      (0 until D).map(i => col(s"$l.e$i") * col(s"$r.e$i")).reduce(_ + _)
    val wRank = Window.partitionBy("query_id").orderBy(col("c").desc, col("neighbor_id"))
    val fin = cand
      .join(e.as("a"), col("query_id") === col("a.vec_id"))
      .join(e.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        (flatDot("a", "b") / (col("a.norm") * col("b.norm"))).as("c"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 5)
    t("final")(fin.count())
    spark.stop()
  }
}
