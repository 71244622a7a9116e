package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness pricing the mergeable-HLL rolling-distinct design
  * ([[graft.queries.SketchQueries.rollingDistinct]]) against the exact
  * formulation it replaces, on a generated high-cardinality fixture
  * (the harness `events` table tops out at ~1.5k users — too small for
  * the shuffle to matter; real per-day id universes don't).
  *
  * What each arm pays after the scan:
  *   exact  — distinct (day, id) pairs (id-scale exchange), exploded
  *            ×window to every window they serve (id×window-scale
  *            exchange), then a two-phase countDistinct per window.
  *   sketch — ONE per-day sketch aggregate (registers cross the
  *            exchange, ids never do), day×window-scale kilobyte rows,
  *            one union aggregate.
  * The gap is the id×window-scale shuffle, so it widens linearly with
  * both cardinality and window length — the 100 TB argument made
  * measurable on one box. The harness also reports the worst sketch
  * estimate error vs exact, pricing accuracy next to speed.
  *
  * Usage: `runMain graft.tools.SketchAb [rows] [days] [window] [reps]`.
  */
object SketchAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000000)
    val days = args.lift(1).map(_.toInt).getOrElse(90)
    val window = args.lift(2).map(_.toInt).getOrElse(28)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dayMs = 86400000L
    val dir = java.nio.file.Files.createTempDirectory("sketch_ab").toString
    // ~n/2 distinct ids, day-skewed arrival (an id's active day clusters
    // around its hash), so per-day universes overlap but are not equal —
    // deterministic column algebra, no driver-side generation
    spark.range(n.toLong)
      .select(
        (pmod(col("id") * 2654435761L, lit(n.toLong / 2))).as("uid"),
        (pmod(col("id") * 1103515245L + pmod(col("id"), lit(7)), lit(days.toLong))
          * dayMs).as("day_ms"))
      .write.mode("overwrite").parquet(s"$dir/ev")
    val ev = spark.read.parquet(s"$dir/ev")
    val perDayDays = ev.select(col("day_ms").as("target_day")).distinct()
    def toWindows(df: DataFrame): DataFrame = df
      .withColumn("target_day",
        explode(sequence(col("day_ms"),
          col("day_ms") + lit((window - 1).toLong * dayMs), lit(dayMs))))
      .drop("day_ms")
      .join(broadcast(perDayDays), "target_day")
    def exact(): DataFrame = toWindows(ev.distinct())
      .groupBy("target_day").agg(countDistinct("uid").as("n"))
    def sketch(): DataFrame = toWindows(
        ev.groupBy("day_ms").agg(hll_sketch_agg(col("uid"), lit(14)).as("sk")))
      .groupBy("target_day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bench(build: () => DataFrame): (Double, Double) = {
      val runs = (0 until reps).map(_ => time {
        build().write.format("noop").mode("overwrite").save()
      })
      (runs.head, runs.tail.min)
    }
    val (exCold, exWarm) = bench(exact)
    val (skCold, skWarm) = bench(sketch)
    // accuracy: worst relative error across windows
    val err = exact().withColumnRenamed("n", "n_exact")
      .join(sketch().withColumnRenamed("n", "n_est"), "target_day")
      .agg(max(abs(col("n_est") - col("n_exact")) / col("n_exact")))
      .head().getDouble(0)
    spark.stop()
    println(
      f"""{"exact":{"cold":$exCold%.3f,"warm_min":$exWarm%.3f},""" +
      f""""sketch":{"cold":$skCold%.3f,"warm_min":$skWarm%.3f},""" +
      f""""speedup_warm":${exWarm / skWarm}%.2f,"max_rel_err":$err%.4f,""" +
      s""""rows":$n,"days":$days,"window":$window,"reps":$reps}""")
  }
}
