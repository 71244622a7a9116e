package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** A/B for the winnow overlap census at scale (r15): the shipped
  * capped-collect census (one pass, O(cap) buffers, hot-bucket routing
  * — the r13-verdict-mandated safety) vs the pre-hardening r13 form
  * (native collect_list, no df signal, no cap: a boilerplate
  * fingerprint shared by millions of docs would hold a corpus-scale id
  * list in ONE aggregation buffer). The r13 form is kept here ONLY as
  * the measurement baseline for the safety's price — it must not ship.
  * Times construction + noop action, min of 2 after an untimed warm.
  * Usage: runMain graft.tools.WinnowAb [sfDir]
  */
object WinnowAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // the r13 pre-hardening census: native collect_list, unbounded
    def overlapR13(): DataFrame = {
      val fps = TextQueries.winnowFrame(spark, sfDir)
        .select(col("doc_id"), explode(expr("array_distinct(sel.h)")).as("h"))
      fps.groupBy("h")
        .agg(expr("sort_array(collect_list(doc_id))").as("ids"))
        .filter(size(col("ids")) > 1)
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"),
          explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("id2"))
        .groupBy("id1", "id2")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("id1", "id2")
    }

    def timeDf(label: String, mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once()
      println(f"[winnowab] $label%-10s ${math.min(once(), once())}%.3f s")
    }

    timeDf("shipped", () =>
      graft.SparkEntry.queries("d_winnow_overlap")(spark, sfDir))
    timeDf("r13_raw", () => overlapR13())
    timeDf("shipped2", () =>
      graft.SparkEntry.queries("d_winnow_overlap")(spark, sfDir))
    spark.stop()
  }
}
