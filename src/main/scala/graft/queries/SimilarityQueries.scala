package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity operators: brute-force cosine (correctness
  * baseline) and an IVF-style cell-probed variant (the scale path —
  * candidate set shrinks from N to the probed cells' population).
  * Dot products fold sequentially in double, matching the DuckDB oracle
  * bit-for-bit; outputs round to 6 decimals.
  */
object SimilarityQueries {

  /** Embedding dim of the harness tables (64 float32 elements). */
  private val D = 64

  /** Vectors as D flat double columns e0..eD-1 plus the L2 norm: keeps
    * every dot product a flat codegen'd expression chain instead of an
    * interpreted higher-order-function fold (~20x faster on pair joins).
    * The left-assoc sum matches the oracle's sequential accumulation.
    */
  private def vectors(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(Seq(col("vec_id")) ++
        (0 until D).map(i => element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
    e.withColumn("norm",
      sqrt((0 until D).map(i => col(s"e$i") * col(s"e$i")).reduce(_ + _)))
  }

  private def flatDot(l: String, r: String): Column =
    (0 until D).map(i => col(s"$l.e$i") * col(s"$r.e$i")).reduce(_ + _)

  private def cos(dotC: Column): Column = dotC / (col("a.norm") * col("b.norm"))

  /** Near-duplicate pairs: cosine >= 0.45 over all pairs (id1 < id2).
    * Brute force is the correctness baseline; at scale the LSH/IVF
    * variants below bound the candidate set.
    */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    broadcast(e.as("a")).join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        cos(flatDot("a", "b")).as("c"))
      .filter(col("c") >= 0.45)
      .select(col("id1"), col("id2"), round(col("c"), 6).as("cos_sim"))
      .orderBy("id1", "id2")
  }

  /** Brute-force cosine top-k: queries = vec_id < 10, k = 5. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    val w = Window.partitionBy("query_id").orderBy(col("c").desc, col("neighbor_id"))
    broadcast(q.as("a")).join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        cos(flatDot("a", "b")).as("c"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("c"), 6).as("cos_sim"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-style ANN: coarse cells seeded by the first 16 vectors; each
    * vector assigned to its max-cosine cell; queries probe their 4
    * nearest cells and rank only those cells' members. Deterministic
    * (row_number tie-breaks on cell/neighbor id). At scale: seeds become
    * k-means centroids — [[KMeans.fit]] is that trained quantizer
    * (distributed Lloyd, broadcast assignment, spec-tested) — and
    * probing reads ~nprobe/ncells of the data. This gate query keeps
    * the naive deterministic seeds so the DuckDB oracle replays exactly.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    val seeds = e.filter(col("vec_id") < 16)
      .select(Seq(col("vec_id").as("cell"), col("norm").as("snorm")) ++
        (0 until D).map(i => col(s"e$i").as(s"se$i")): _*)
    def seedCos(l: String): Column =
      (0 until D).map(i => col(s"$l.e$i") * col(s"se$i")).reduce(_ + _) /
        (col(s"$l.norm") * col("snorm"))
    // NARROW intermediates: (vec_id, cell) only — carrying the 64 flat
    // vector columns through windows/joins blows up planning and row
    // width; vectors are joined back in once, at the final ranking.
    val wAssign = Window.partitionBy("vec_id").orderBy(col("sc").desc, col("cell"))
    val assign = e.as("a").join(broadcast(seeds), lit(true))
      .select(col("a.vec_id").as("vec_id"), col("cell"), seedCos("a").as("sc"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
    val wProbe = Window.partitionBy("query_id").orderBy(col("sc").desc, col("cell"))
    val probes = e.filter(col("vec_id") < 10).as("a")
      .join(broadcast(seeds), lit(true))
      .select(col("a.vec_id").as("query_id"), col("cell"), seedCos("a").as("sc"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= 4)
      .select("query_id", "cell")
    // candidate pairs -> join vectors back in -> rank within query
    val cand = probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val wRank = Window.partitionBy("query_id").orderBy(col("c").desc, col("neighbor_id"))
    broadcast(cand)
      .join(e.as("a"), col("query_id") === col("a.vec_id"))
      .join(e.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"), cos(flatDot("a", "b")).as("c"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("c"), 6).as("cos_sim"))
      .orderBy("query_id", "rnk")
  }
}
