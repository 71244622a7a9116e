package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum over (key, value) pairs in
  * ascending key order — the scan primitive behind byte-budget shard
  * packing (and the two-phase form [[graft.queries.TextQueries.packSequences]]'s
  * scaladoc defers to for a single pathologically large partition key).
  *
  * A naive global prefix sum is a window over an unpartitioned ORDER BY
  * — every row through one task. This is the classic two-phase scan
  * instead (Blelloch 1990's work-efficient scan, re-expressed on
  * Spark): deterministic key-range bins (`pid = key / width`, no
  * sampled range partitioner — the bin of a key never depends on which
  * rows a sampler saw), ONE metadata-scale aggregate for per-bin
  * subtotals (map-side partials; `parts` rows cross the exchange), the
  * exclusive bin offsets broadcast, then one partition-local pass adds
  * `offset(bin) + local running sum`. The only data-scale movement is
  * the single hash repartition by bin; everything else is metadata.
  * Keys must be non-negative (a document/record id); values are exact
  * longs, so the prefix is exact in any partial order.
  */
object PrefixSum {

  /** (key, value) → (key, value, exclusive prefix of value in key
    * order). `parts` bounds both the bin count and the broadcast offset
    * table — keep it at the shuffle-partition scale, never corpus
    * scale.
    */
  def exclusivePrefix(
      pairs: Dataset[(Long, Long)], parts: Int): Dataset[(Long, Long, Long)] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    require(parts > 0, s"parts must be positive, got $parts")
    // column-pruned bounds pass (parquet min/max statistics answer this
    // from footers on a real lake); empty input short-circuits
    val bounds = pairs.toDF("k", "v").agg(min("k"), max("k"))
      .as[(Option[Long], Option[Long])].head()
    bounds match {
      case (Some(lo), Some(hi)) =>
        require(lo >= 0, s"prefix-sum keys must be non-negative, saw $lo")
        val width = math.max(1L, hi / parts + 1)
        // persist the NARROW (k, v, pid) projection: phase 1 and phase 2
        // would otherwise each re-derive it from the source — for a
        // byte-length input that means scanning the payload column
        // twice. The cache holds three longs per row; the subtotal pass
        // below materializes it, the co-location pass reads it back, and
        // the listener releases it after the consumer's first action.
        val binned = pairs.toDF("k", "v")
          .withColumn("pid", expr(s"k DIV $width"))
          .persist()
        // phase 1: per-bin subtotals — partial-aggregated, ≤ parts rows
        // cross the exchange; exclusive offsets stay driver-side
        val totals = binned.groupBy("pid").agg(sum("v").as("t"))
          .as[(Long, Long)].collect().sortBy(_._1)
        CacheRelease.afterConsumer(binned)
        val offsets = {
          var acc = 0L
          totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }.toMap
        }
        val bc = spark.sparkContext.broadcast(offsets)
        // phase 2: co-locate each bin, sort (bin, key) locally, add the
        // bin's broadcast offset to a per-bin running sum — several bins
        // may share a physical partition; the running sum resets at each
        // bin boundary, so the bin→partition mapping is irrelevant
        binned.repartition(parts, col("pid"))
          .sortWithinPartitions("pid", "k")
          .select("k", "v", "pid").as[(Long, Long, Long)]
          .mapPartitions { it =>
            val off = bc.value
            var curPid = -1L
            var running = 0L
            var started = false
            it.map { case (k, v, pid) =>
              if (!started || pid != curPid) {
                curPid = pid; running = off(pid); started = true
              }
              val p = running
              running += v
              (k, v, p)
            }
          }
      case _ => spark.emptyDataset[(Long, Long, Long)]
    }
  }

}
