package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the z-order layout: the SAME table written three
  * ways — natural (hash-scattered), linear-sorted on one key, and
  * z-ordered on two keys ([[graft.operators.ZOrder.layout]]) — then,
  * for a 2-D box predicate and for each single-dimension band, count
  * the FILES a footer-stats reader must touch (a file is touched iff
  * its per-file min/max box intersects the predicate box — exactly the
  * parquet row-group/file pruning rule) and the rows those files hold.
  * The claim being priced: linear sort skips perfectly on ITS key and
  * not at all on the other; z-order skips on BOTH at a sqrt-ish rate.
  * At 100 TB "files touched" is the scan bill, so this is the number
  * that justifies the layout pass.
  *
  * Usage: `runMain graft.tools.ZOrderAb [sfDir] [files]`.
  */
object ZOrderAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
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

    val base = java.nio.file.Files.createTempDirectory("zorder_ab").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice")

    // the three layouts, same file count each
    li.repartition(nFiles).write.mode("overwrite").parquet(s"$base/natural")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    graft.operators.ZOrder.layout(
      li, Seq("l_partkey", "l_suppkey"), s"$base/zorder",
      bits = 16, partitions = nFiles)

    // predicate boxes: the middle [25%, 50%) of each key range
    val st = li.agg(
      min("l_partkey").as("plo"), max("l_partkey").as("phi"),
      min("l_suppkey").as("slo"), max("l_suppkey").as("shi")).head()
    def q(lo: Long, hi: Long, f: Double): Long = lo + ((hi - lo) * f).toLong
    val (pLo, pHi) = (st.getAs[Long]("plo"), st.getAs[Long]("phi"))
    val (sLo, sHi) = (st.getAs[Long]("slo"), st.getAs[Long]("shi"))
    val box = Map(
      "p" -> (q(pLo, pHi, 0.25), q(pLo, pHi, 0.5)),
      "s" -> (q(sLo, sHi, 0.25), q(sLo, sHi, 0.5)))

    // per-file stat boxes, as a footer reader sees them
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"),
        count(lit(1)).as("rows"))
      .collect()

    def touched(bs: Array[org.apache.spark.sql.Row],
                p: Option[(Long, Long)], s: Option[(Long, Long)]) = {
      val t = bs.filter { b =>
        p.forall { case (lo, hi) =>
          b.getAs[Long]("plo") <= hi && b.getAs[Long]("phi") >= lo } &&
        s.forall { case (lo, hi) =>
          b.getAs[Long]("slo") <= hi && b.getAs[Long]("shi") >= lo }
      }
      (t.length, t.map(_.getAs[Long]("rows")).sum)
    }

    val layouts = Seq("natural", "linear", "zorder")
    val preds = Seq(
      ("box2d", Some(box("p")), Some(box("s"))),
      ("p_band", Some(box("p")), None),
      ("s_band", None, Some(box("s"))))
    val parts = for (l <- layouts) yield {
      val bs = boxes(s"$base/$l")
      val inner = preds.map { case (name, p, s) =>
        val (f, r) = touched(bs, p, s)
        s""""$name":{"files":$f,"rows":$r}"""
      }.mkString(",")
      s""""$l":{"total_files":${bs.length},"total_rows":${bs.map(_.getAs[Long]("rows")).sum},$inner}"""
    }
    println(s"""{"zorder_ab":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
