package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the as-of join's formulations: the native operator
  * auto-selected ([[graft.queries.AnalyticsQueries.asofJoin]]), each
  * physical path pinned (merge / broadcast-index), and the
  * union+window composition
  * ([[graft.queries.AnalyticsQueries.asofJoinViaWindow]]) on the same
  * data. Prints cold + min-warm seconds per form (the bench-noise
  * discipline: min of the warm reps is the only trustworthy point on
  * this box). Usage: `runMain graft.tools.AsOfAb [sfDir] [reps]`.
  *
  * Round-11 measured points (min-warm, local[32]; full table + reading
  * in the README "Current numbers" section): sf0.1 merge 0.67 / bcast
  * 0.96; 10x both sides merge 1.21 / bcast 3.70 (auto correctly flips
  * to merge past the broadcast threshold); 10x facts vs fixed dim all
  * paths within noise (~0.9-1.0s) — a single box cannot exhibit the
  * broadcast path's win because local exchanges are in-process memcpy;
  * its case is the plan shape (zero left exchange), pinned in
  * AsOfJoinSpec.
  */
object AsOfAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val forms = Seq(
      "native" -> (() =>
        graft.queries.AnalyticsQueries.asofJoin(spark, sfDir)),
      // both physical paths pinned, so the comparison survives the
      // auto-select flipping with scale (a 10x right side crosses the
      // broadcast threshold and "native" silently becomes "merge")
      "merge" -> (() =>
        graft.queries.AnalyticsQueries.asofJoinPinned(spark, sfDir, Some(false))),
      "bcast" -> (() =>
        graft.queries.AnalyticsQueries.asofJoinPinned(spark, sfDir, Some(true))),
      "window" -> (() =>
        graft.queries.AnalyticsQueries.asofJoinViaWindow(spark, sfDir)))
    val lines = forms.map { case (name, build) =>
      val runs = (0 until reps).map(_ => time {
        build().write.format("noop").mode("overwrite").save()
      })
      spark.catalog.clearCache()
      f""""$name":{"cold":${runs.head}%.3f,"warm_min":${runs.tail.min}%.3f}"""
    }
    spark.stop()
    println(lines.mkString("{", ",", s""","sf":"$sfDir","reps":$reps}"""))
  }
}
