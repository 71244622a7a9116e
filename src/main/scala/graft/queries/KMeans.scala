package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the real
  * version of the IVF coarse quantizer ([[SimilarityQueries.annIvf]]
  * seeds cells with the first k vectors; "at scale seeds become k-means
  * centroids" — this is that upgrade).
  *
  * Shape per iteration: centroids broadcast to the assignment join
  * (narrow (vec_id, cell) intermediate, never 64 columns through a
  * window), then one shuffle on (cell, dim) to re-average. Iterations
  * are a driver loop over small DataFrames — the standard pattern for
  * fixed-iteration ML on Spark; centroids are collected (k x D doubles,
  * driver-scale) each round, which is exactly what the next broadcast
  * needs anyway.
  *
  * Not under the DuckDB gate: iterative double accumulation across
  * nondeterministic partition orders makes bit-exact cross-engine
  * replay dishonest; properties are spec-tested instead (determinism
  * given data, non-increasing objective, nearest-centroid optimality).
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Vectors as (vec_id, pos, x) rows — the narrow shape every stage
    * here works in.
    */
  private def posVec(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))

  /** Assign each vector to its nearest centroid by squared L2 distance
    * (ties: lowest cell id). dist^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is
    * rank-invariant so only -2 v.c + |c|^2 is scored.
    */
  def assign(spark: SparkSession, embeddings: DataFrame, model: Model): DataFrame = {
    import spark.implicits._
    val cent = model.centroids.zipWithIndex.flatMap { case (c, cell) =>
      c.iterator.zipWithIndex.map { case (v, pos) => (cell, pos, v) }
    }.toSeq.toDF("cell", "pos", "c")
    val cnorm = cent.groupBy("cell").agg(sum(col("c") * col("c")).as("cn"))
    val scored = posVec(embeddings)
      .join(broadcast(cent), "pos")
      .groupBy("vec_id", "cell").agg(sum(col("x") * col("c")).as("dot"))
      .join(broadcast(cnorm), "cell")
      .withColumn("score", -lit(2.0) * col("dot") + col("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("score"), col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
  }

  /** Fit k centroids: init = first k vectors by vec_id (deterministic),
    * `iters` Lloyd rounds. Empty cells keep their previous centroid.
    */
  def fit(spark: SparkSession, embeddings: DataFrame, k: Int, iters: Int): Model = {
    import spark.implicits._
    val init = embeddings.orderBy("vec_id").limit(k)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]]
      .collect().map(_.toArray)
    var model = Model(init)
    (1 to iters).foreach { _ =>
      val assigned = assign(spark, embeddings, model)
      val means = posVec(embeddings)
        .join(assigned, "vec_id")
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
      val next = model.centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      model = Model(next)
    }
    model
  }

  /** Mean squared distance to the assigned centroid (training objective). */
  def cost(spark: SparkSession, embeddings: DataFrame, model: Model): Double = {
    import spark.implicits._
    val assigned = assign(spark, embeddings, model)
    val cent = model.centroids.zipWithIndex.flatMap { case (c, cell) =>
      c.iterator.zipWithIndex.map { case (v, pos) => (cell, pos, v) }
    }.toSeq.toDF("cell", "pos", "c")
    posVec(embeddings)
      .join(assigned, "vec_id")
      .join(broadcast(cent), Seq("cell", "pos"))
      .select(col("vec_id"), ((col("x") - col("c")) * (col("x") - col("c"))).as("d2"))
      .groupBy("vec_id").agg(sum("d2").as("dist2"))
      .agg(avg("dist2")).as[Double].head()
  }
}
