package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One parquet layout for every durable index artifact the pipeline
  * rebuilds nightly and probes from ingest jobs ([[TextQueries.NearDupIndex]],
  * [[TextQueries.ChunkIndex]], [[TextQueries.TermDistribution]],
  * [[TextQueries.WinnowIndex]]): each named frame lands under
  * `path/<name>` as an ordinary parquet table, and driver-scale scalars
  * (totals a probe needs before any distributed work) land together in a
  * single-row `path/_meta` table. Keeping every index on the same layout
  * means one CLI verb builds any of them (`build-index --kind ...`), any
  * downstream job can scan a frame with the usual pushdown/pruning, and
  * new index kinds inherit the convention instead of hand-rolling paths.
  *
  * Scale shape: frames are written with whatever partitioning the build
  * plan produced (corpus-scale indexes stay distributed parquet);
  * `_meta` is a deliberate one-row, one-file table — the scalars are
  * driver-held at build time and driver-needed at load time, so a
  * coalesce(1) costs nothing and spares the loader a distributed read.
  */
object IndexArtifact {
  /** Write `frames` under `path/<name>` plus the `_meta` scalars.
    * Overwrites any prior artifact at `path` frame-by-frame — the
    * nightly-rebuild contract (the same path is refreshed in place).
    */
  def save(
      path: String,
      frames: Map[String, DataFrame],
      meta: Map[String, Long] = Map.empty,
      partitionedBy: Map[String, Seq[String]] = Map.empty): Unit = {
    require(frames.nonEmpty, "an index artifact needs at least one frame")
    frames.foreach { case (name, df) =>
      val w = df.write.mode("overwrite")
      partitionedBy.get(name).filter(_.nonEmpty)
        .fold(w)(cols => w.partitionBy(cols: _*))
        .parquet(s"$path/$name")
    }
    if (meta.nonEmpty) {
      val spark = frames.head._2.sparkSession
      import spark.implicits._
      meta.toSeq.sorted.toDF("key", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
    }
  }

  /** A named frame of an artifact written by [[save]]. */
  def frame(spark: SparkSession, path: String, name: String): DataFrame =
    spark.read.parquet(s"$path/$name")

  /** The `_meta` scalars of an artifact written by [[save]]. */
  def meta(spark: SparkSession, path: String): Map[String, Long] =
    spark.read.parquet(s"$path/_meta")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
