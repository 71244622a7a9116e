package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB shuffle-elimination technique
  * the library's docs lean on, pinned as an executable regression: when
  * both fact tables are bucketed AND sorted on the join key, the join
  * plans with ZERO exchanges (and zero sorts), because bucket layout IS
  * the hash partitioning a shuffle would have produced. At scale this is
  * the difference between re-shuffling 100 TB per join and reading
  * pre-organized data; the write-side cost amortizes over every
  * downstream join on the same key.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed+sorted tables join with zero exchanges and zero sorts") {
    val wh = tmpDir("bucketing-spec")
    val sf = SparkSuite.sf0001
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    // disable broadcast so the planner must pick a partitioned join —
    // the case bucketing exists for (both sides too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scans must use the bucket layout:\n$plan")
      // NEITHER join input shuffles: everything below the SortMergeJoin
      // is bucket-scan (+ a per-bucket sort when buckets span multiple
      // files); the ONLY exchange in the whole plan is the final 5-row
      // re-aggregation on the unrelated priority key.
      val joinIdx = plan.linesIterator.indexWhere(_.contains("SortMergeJoin"))
      val below = plan.linesIterator.drop(joinIdx + 1).toSeq
      assert(!below.exists(_.contains("Exchange")),
        s"bucketed join inputs must not shuffle:\n$plan")
      val totalExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(totalExchanges == 1,
        s"only the tiny final aggregate may shuffle:\n$plan")
      // and the result is still correct
      val viaShuffle = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      assert(j.orderBy("o_orderpriority").collect().toSeq ==
        viaShuffle.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
