package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the as-of join's SKEW posture: a deliberately
  * hot-keyed fact table (90% of left rows on one key) through the
  * plain merge exec vs [[graft.plans.AsOfJoin.joinSalted]]. Unlike the
  * broadcast-vs-merge A/B (whose win is network-bound and invisible on
  * one box), per-key task serialization is REAL on local[32]: the hot
  * key's entire left volume runs in a single merge task, so salting
  * shows up directly in wall-clock. Usage:
  * `runMain graft.tools.AsOfSkewAb [leftRows] [rightRows] [reps]`.
  *
  * Round-12 measured points (min-warm, local[32], 4M×200k, 90% hot):
  * merge 7.59s (the hot key's 3.6M left rows in ONE task), salted×8
  * 2.67s (2.8×), salted×32 1.84s (4.1×) — the salted paths verify
  * output-equal to the merge in AsOfJoinSpec; this harness only prices
  * them.
  */
object AsOfSkewAb {
  def main(args: Array[String]): Unit = {
    val nLeft = args.headOption.map(_.toInt).getOrElse(4000000)
    val nRight = args.lift(1).map(_.toInt).getOrElse(200000)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val dir = java.nio.file.Files.createTempDirectory("asof_skew").toString
    // 90% of facts on key 1 (the bot user), the rest uniform over 2..64;
    // deterministic column algebra, no driver-side generation
    spark.range(nLeft.toLong)
      .select(
        when(pmod(col("id"), lit(10)) < 9, lit(1L))
          .otherwise(pmod(col("id") * 2654435761L, lit(63)) + 2L).as("k"),
        pmod(col("id") * 1103515245L + 12345L, lit(1000000000L)).as("t"),
        col("id").as("lid"))
      .write.mode("overwrite").parquet(s"$dir/left")
    spark.range(nRight.toLong)
      .select(
        (pmod(col("id") * 2654435761L, lit(64)) + 1L).as("k"),
        pmod(col("id") * 69069L + 1L, lit(1000000000L)).as("rt"),
        col("id").as("rid"))
      .write.mode("overwrite").parquet(s"$dir/right")
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    import graft.plans.{AsOfDirection, AsOfJoin}
    def merge() = AsOfJoin.backward(l, r, Seq(l("k")), Seq(r("k")),
      l("t"), r("rt"), Seq(r("rid")), broadcast = Some(false))
    def salted(n: Int) = AsOfJoin.joinSalted(AsOfDirection.Backward, l, r,
      Seq(l("k")), Seq(r("k")), l("t"), r("rt"), Seq(r("rid")), saltBuckets = n)
    val forms = Seq(
      "merge" -> (() => merge()),
      "salted8" -> (() => salted(8)),
      "salted32" -> (() => salted(32)))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val lines = forms.map { case (name, build) =>
      val runs = (0 until reps).map(_ => time {
        build().write.format("noop").mode("overwrite").save()
      })
      f""""$name":{"cold":${runs.head}%.3f,"warm_min":${runs.tail.min}%.3f}"""
    }
    spark.stop()
    println(lines.mkString("{", ",",
      s""","left":$nLeft,"right":$nRight,"hot_frac":0.9,"reps":$reps}"""))
  }
}
