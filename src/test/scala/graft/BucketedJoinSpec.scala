package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the Spark-native answer to "this join
  * runs every night on the same keys; stop shuffling the fact table":
  * write both sides `bucketBy(N, key)` once, and every later
  * equi-join on that key reads bucket-aligned files with NO exchange
  * on either side. At 100 TB this converts the recurring join's
  * dominant cost (shuffling the fact table each run) into a one-time
  * layout decision — the same trade the hive-partitioned IVF index
  * makes for probes, applied to joins.
  *
  * These specs pin the contract end to end: zero exchanges in the
  * bucketed join's plan, result equality with the shuffled join, and
  * aggregation reuse of the bucket layout (groupBy on the bucket key
  * also plans without an exchange).
  */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  private val sf = SparkSuite.sf0001

  private def withMinimalBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  test("bucketed fact-dim join: zero exchanges, equal to the shuffled join") {
    val wh = tmpDir("bucketed-wh")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    li.write.option("path", s"$wh/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.option("path", s"$wh/ord")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    try withMinimalBroadcast {
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
      // the whole plan — join AND the orderkey aggregate on top — rides
      // the bucket layout: no Exchange anywhere
      assert(exchanges(bucketed) == 0,
        s"bucketed join must not shuffle:\n${bucketed.queryExecution.executedPlan}")
      val shuffled = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
      assert(exchanges(shuffled) > 0, "control: the plain join does shuffle")
      val a = bucketed.collect().map(_.toSeq).toSet
      val b = shuffled.collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty, "bucketed and shuffled joins must agree")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucket-key aggregation reuses the layout: no exchange before the final agg") {
    val wh = tmpDir("bucketed-agg-wh")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.option("path", s"$wh/li")
      .bucketBy(8, "l_orderkey")
      .mode("overwrite").saveAsTable("li_agg_bucketed")
    try {
      val agg = spark.table("li_agg_bucketed")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(exchanges(agg) == 0,
        s"bucket-key aggregate must not shuffle:\n${agg.queryExecution.executedPlan}")
      // sanity: grand total unchanged by the layout
      val n = agg.agg(sum("n")).as[Long].head()
      assert(n == spark.read.parquet(s"$sf/lineitem.parquet").count())
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")
  }
}
