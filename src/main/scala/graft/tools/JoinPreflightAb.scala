package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the join pre-flight against the join it prices: the report
  * only earns its keep if it costs a small fraction of the shuffle it
  * can save. Three arms over the sf tables, min of `reps` each, every
  * construction inside the timer:
  *
  *   - `report_1pct` — [[graft.operators.JoinPreflight.report]] on
  *     lineitem × orders (orderkey) at the default 1% sample, the
  *     production posture;
  *   - `report_exact` — the same report at sampleFraction = 1 (what
  *     the oracle gate runs): the worst-case pre-flight;
  *   - `join_count` — the shuffle join + count. Catalyst prunes every
  *     payload column under a count, so this is the CHEAPEST possible
  *     consumer — the report's worst matchup;
  *   - `join_full` — the same join forced to carry EVERY column
  *     (xxhash64 over the full row, then one sum), the width a real
  *     consumer shuffles. The report's cost is key-column-scan-bound,
  *     the join's is full-row-shuffle-bound — this arm is the shape
  *     the ratio actually meets in production.
  *
  * Also sanity-prints the estimate vs the true output count at each
  * sample fraction — accuracy receipts next to cost receipts.
  *
  * Measured verdict (lineitem × orders on orderkey, min of 3, warm
  * local NVMe): sf0.1 — report_1pct 3.1s vs join_full 0.94s (ratio
  * 3.3); sf1 — report_1pct 3.0s vs join_full 2.7s (ratio 1.09).
  * Accuracy 0.2–3.3% at both scales. Reading: the report's cost is
  * FLAT across 10× data (driver-action fixed overhead dominates its
  * ~0.5s of actual scan work) while the join grows with shuffled
  * bytes — the crossover sits right at sf1 on this box, and every
  * factor a real cluster adds (payload width, network shuffle,
  * repeated runs against the same inputs, the OOM retry the verdict
  * prevents) moves it further in the report's favor. The honest scope
  * statement mirrors ScanAb's: below ~10M rows on warm local disk,
  * just run the join.
  *
  * Usage: `runMain graft.tools.JoinPreflightAb [sfDir] [reps]`.
  */
object JoinPreflightAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.constraintPropagation.enabled", "false")
      // the join being priced must actually shuffle: orders at sf0.1
      // broadcasts under the default threshold, hiding the cost the
      // pre-flight exists to predict
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeMin(reps: Int)(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min

    val left = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val right = spark.read.parquet(s"$sfDir/orders.parquet")

    var est1 = 0L; var estX = 0L; var actual = 0L
    val t1 = timeMin(reps) {
      est1 = graft.operators.JoinPreflight.report(
        left, Seq("l_orderkey"), right, Seq("o_orderkey"),
        sampleFraction = 0.01).estOutputRows
    }
    val tX = timeMin(reps) {
      estX = graft.operators.JoinPreflight.report(
        left, Seq("l_orderkey"), right, Seq("o_orderkey"),
        sampleFraction = 1.0, topK = 4096).estOutputRows
    }
    val tJ = timeMin(reps) {
      actual = left.join(right,
        col("l_orderkey") === col("o_orderkey")).count()
    }
    val tF = timeMin(reps) {
      left.join(right, col("l_orderkey") === col("o_orderkey"))
        .select(xxhash64(struct(col("*"))).as("h"))
        .agg(expr("bit_xor(h)")).head() // overflow-free full-row fold
    }
    println(f"[preflight-ab] report_1pct  ${t1}%.2fs  est=$est1  " +
      f"err=${math.abs(est1 - actual) * 100.0 / actual}%.1f%%")
    println(f"[preflight-ab] report_exact ${tX}%.2fs  est=$estX  " +
      f"err=${math.abs(estX - actual) * 100.0 / actual}%.1f%%")
    println(f"[preflight-ab] join_count   ${tJ}%.2fs  actual=$actual")
    println(f"[preflight-ab] join_full    ${tF}%.2fs")
    println(f"[preflight-ab] ratio report_1pct/join_count = ${t1 / tJ}%.2f" +
      f", report_1pct/join_full = ${t1 / tF}%.2f")
    spark.stop()
  }
}
