package graft

import org.apache.spark.sql.functions._

/** Output-layout regressions — the storage-side half of the 100 TB
  * story: a pipeline's WRITE layout decides every downstream read's
  * cost. Partitioned directories give scan-time partition pruning
  * (skip whole directories, visible as PartitionFilters); range
  * partitioning + in-file sort gives parquet row groups tight min/max
  * stats for row-group skipping; maxRecordsPerFile bounds file size so
  * one hot partition cannot produce an unsplittable monster file.
  */
class LayoutSpec extends SparkSuite {

  test("partitioned write -> partition-pruned read (directories skipped)") {
    val out = tmpDir("layout-part") + "/events"
    val sf = SparkSuite.sf0001
    graft.model.Tables.pq(spark, sf, "events")
      .withColumn("day", expr("(ts div 1000000) div 86400000"))
      .repartitionByRange(4, col("day"), col("user_id"))
      .sortWithinPartitions("day", "user_id")
      .write.partitionBy("event_type").option("maxRecordsPerFile", 500)
      .parquet(out)
    // partition filter prunes directories at planning time
    val read = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("event_type"),
      s"event_type filter must prune partition directories:\n$plan")
    // only the purchase directory's files are scanned
    val scanned = read.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("event_type=purchase")),
      s"scan must touch only the pruned directory, got:\n${scanned.mkString("\n")}")
    // maxRecordsPerFile actually bounds file size
    val counts = spark.read.parquet(out)
      .groupBy(input_file_name()).agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0))
    assert(counts.forall(_ <= 500), s"files must respect maxRecordsPerFile: ${counts.toSeq}")
    // layout round-trips losslessly
    val n0 = spark.read.parquet(s"$sf/events.parquet").count()
    assert(spark.read.parquet(out).count() == n0)
  }
}
