package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock + files-touched A/B for the bloom pruned point scan: the
  * SAME `l_orderkey = X` lookup answered three ways over a
  * hash-scattered copy of lineitem — full directory read + filter,
  * the bloom-pruned scan ([[graft.operators.BloomSkipping]]; only
  * files whose filter admits the key are opened), and the
  * MINMAX-pruned scan over the same layout, which demonstrates the
  * gap the bloom index exists to close: a high-cardinality key in
  * arrival order gives every file a (min, max) box spanning the whole
  * domain, so the box test keeps everything while the membership test
  * keeps ~fpp of the files. Index consult inside the timer, min of
  * `reps` per arm, same honesty contract as [[ScanAb]]: on warm local
  * NVMe the consult cost can exceed the saved scan — the win converts
  * to wall-clock where file opens cost milliseconds (object stores,
  * 10⁵-file tables), and `files` printed per arm is the number that
  * transfers to that regime.
  *
  * Usage: `runMain graft.tools.BloomAb [sfDir] [files] [reps]`.
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
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
    import graft.operators.{BloomSkipping, DataSkipping}

    val base = java.nio.file.Files.createTempDirectory("bloom_ab").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    // hash-scatter: every file sees the whole key domain — the
    // arrival-order shape that defeats minmax on point lookups
    li.repartition(nFiles).write.mode("overwrite").parquet(s"$base/nat")
    val rows = spark.read.parquet(s"$base/nat").count()
    val perFile = math.max(1000L, rows / nFiles)
    val t0 = System.nanoTime()
    val bIdx = BloomSkipping.buildBloomIndex(
      spark, s"$base/nat", Seq("l_orderkey"), expectedItems = perFile)
    println(f"[bloom_ab] build ${(System.nanoTime() - t0) / 1e9}%.3f s " +
      f"($rows rows, $nFiles files, expectedItems=$perFile)")
    bIdx.save(s"$base/bidx")
    DataSkipping.buildMinMaxIndex(spark, s"$base/nat", Seq("l_orderkey"))
      .save(s"$base/midx")

    val key = spark.read.parquet(s"$base/nat")
      .select("l_orderkey").head().getLong(0)

    def time(body: => Long): (Double, Long) = {
      val t = System.nanoTime(); val n = body
      ((System.nanoTime() - t) / 1e9, n)
    }
    def minOf(label: String, files: => Int, body: => Long): Unit = {
      body // untimed: janino/JIT for this arm's shapes
      val runs = (1 to reps).map(_ => time(body))
      val r = runs.head._2
      require(runs.forall(_._2 == r), s"$label: row counts diverged")
      println(f"[bloom_ab] $label%-12s min ${runs.map(_._1).min}%.3f s  " +
        f"($r rows, $files/$nFiles files)")
    }
    minOf("full", nFiles,
      spark.read.parquet(s"$base/nat").where(col("l_orderkey") === key).count())
    minOf("bloom", BloomSkipping.BloomIndex.load(spark, s"$base/bidx")
        .prunedFiles(Seq(("l_orderkey", key))).size,
      BloomSkipping.BloomIndex.load(spark, s"$base/bidx")
        .scan(spark, s"$base/nat", Seq(("l_orderkey", key))).count())
    minOf("minmax", DataSkipping.MinMaxIndex.load(spark, s"$base/midx")
        .prunedFiles(Seq(("l_orderkey", key.toDouble, key.toDouble))).size,
      DataSkipping.MinMaxIndex.load(spark, s"$base/midx")
        .scan(spark, s"$base/nat",
          Seq(("l_orderkey", key.toDouble, key.toDouble))).count())
    spark.stop()
  }
}
