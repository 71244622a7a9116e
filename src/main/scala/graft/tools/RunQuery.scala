package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query by name with timing and optional
  * plan dump. Usage: runMain graft.tools.RunQuery <name> [sfDir] [explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doExplain = args.contains("explain")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (doExplain) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runquery] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"[runquery] $name warm: $n2 rows in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
