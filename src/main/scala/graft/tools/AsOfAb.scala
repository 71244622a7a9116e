package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the as-of join's two formulations: the native
  * merge-pass operator ([[graft.queries.AnalyticsQueries.asofJoin]])
  * vs the union+window composition
  * ([[graft.queries.AnalyticsQueries.asofJoinViaWindow]]) on the same
  * data. Prints cold + min-warm seconds per form (the bench-noise
  * discipline: min of the warm reps is the only trustworthy point on
  * this box). Usage: `runMain graft.tools.AsOfAb [sfDir] [reps]`.
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
