package graft.streaming

import graft.operators.{BloomSkipping, DataSkipping, FileCompaction}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Parquet ingest stream that keeps a minmax skipping index LIVE at
  * every commit, instead of letting it go stale until a nightly
  * `update-index --kind minmax` run.
  *
  * At 100 TB the skipping index is only worth its keep if queries can
  * trust it against TODAY's data: an index refreshed nightly forces
  * every intra-day reader through the full file listing (or worse,
  * [[DataSkipping.MinMaxIndex.scan]]'s loud staleness refusal). The
  * stream closes that gap by folding each micro-batch's files into the
  * artifact inside the same foreachBatch hook that commits the data —
  * the index is current the moment the checkpoint advances, and a
  * reader between batches sees a serveable index for exactly the files
  * on disk.
  *
  * Write idempotence follows the join-asof sink's precedent: each
  * epoch OWNS its `batch_id=<id>` partition dir and overwrites it, so
  * an at-least-once foreachBatch replay rewrites the same batch
  * instead of appending duplicates. The index side of a replay is
  * handled by [[DataSkipping.MinMaxIndex.reconciled]]: files the
  * overwrite replaced leave the stats, their replacements fold in, and
  * the result equals a rebuild over the current file set — a property
  * the spec pins batch-by-batch. The tree this writes is
  * hive-partitioned by construction, which is exactly the layout the
  * index now serves (per-leaf listing, `basePath`-pinned subset
  * reads).
  *
  * `compactEvery`: the sink's own shape — one leaf per micro-batch —
  * is the small-file problem in the making, so the stream can carry
  * its maintenance with it: whenever the tree holds more than
  * `compactEvery` batch leaves, the hook collapses the committed ones
  * ([[FileCompaction]] `--collapse batch_id` semantics) BEFORE
  * refreshing the index, so one reconcile covers both the new batch
  * and the rewrite. The leaf being written this batch is the newest
  * and is excluded by the collapse's replay-safety rule, and every
  * older leaf is checkpoint-committed — the rewrite can never race a
  * replay. A crash between collapse and reconcile replays the batch:
  * the overwrite and the reconcile are both idempotent against the
  * already-collapsed tree.
  *
  * Cost per batch: the data write itself, one recursive file listing
  * (metadata-scale), and a stats pass over ONLY the new files — never
  * a re-scan of the standing corpus. A compacting batch adds one
  * read-once-write-once pass over the sub-target committed leaves.
  */
object StreamingIngest {

  /** Start the parquet ingest with minmax maintenance over `cols`.
    * `records` is any streaming frame; rows land under
    * `dataDir/batch_id=<epoch>` and the index artifact at `indexDir`
    * stays non-stale (scan-serveable) after every commit. With
    * `compactEvery > 0`, committed batch leaves collapse whenever more
    * than that many accumulate (see object scaladoc). */
  def startWithMinMaxIndex(
      records: DataFrame,
      dataDir: String,
      indexDir: String,
      cols: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      compactEvery: Int = 0,
      compactTargetBytes: Long = 128L * 1024 * 1024,
      bloomIndexDir: Option[String] = None,
      bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = graft.functions.BloomFilterAgg.ExpectedItems,
      layoutCols: Seq[String] = Nil,
      layoutBits: Int = 16)
    : StreamingQuery = {
    require(cols.nonEmpty, "minmax maintenance needs at least one indexed column")
    (cols ++ bloomCols ++ layoutCols).foreach(c =>
      require(records.columns.contains(c),
        s"indexed column '$c' not in stream (has: ${records.columns.mkString(", ")})"))
    require(compactEvery >= 0,
      s"compactEvery must be >= 0 (0 disables), got $compactEvery")
    require(bloomIndexDir.isEmpty == bloomCols.isEmpty,
      "bloom maintenance needs BOTH an index dir and key columns " +
        "(got one without the other)")
    require(layoutCols.isEmpty || layoutBits * layoutCols.size <= 63,
      s"layoutBits=$layoutBits x ${layoutCols.size} cols overflows the z long")
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // tight boxes AT INGEST: z-sort the batch before it lands, so
          // each file's footer (and the minmax stats row built from it)
          // covers a narrow cell on every layout column. Batch-scale
          // sort, no standing-corpus work — the streaming complement of
          // the offline `layout` verb (whose global range partition a
          // micro-batch neither needs nor can afford)
          val shaped =
            if (layoutCols.isEmpty) batch.toDF()
            else {
              // keep the batch's own file count (repartitionByRange
              // with the default parallelism would shatter a small
              // batch into shuffle.partitions files — the small-file
              // disease again); ranges are disjoint per file, so the
              // boxes do not overlap
              val k = math.max(1, batch.rdd.getNumPartitions)
              graft.operators.ZOrder
                .withZValue(batch.toDF(), layoutCols, layoutBits)
                .repartitionByRange(k, org.apache.spark.sql.functions.col("_z"))
                .sortWithinPartitions("_z").drop("_z")
            }
          shaped.write.mode("overwrite").parquet(s"$dataDir/batch_id=$id")
          if (compactEvery > 0 && leafCount(spark, dataDir) > compactEvery)
            FileCompaction.compactTree(spark, dataDir,
              targetBytes = compactTargetBytes,
              collapse = Some("batch_id"))
          val statsPath = new Path(s"$indexDir/stats")
          val fs = statsPath
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(statsPath)) {
            val idx = DataSkipping.MinMaxIndex.load(spark, indexDir)
            val next = idx.reconciled(spark, dataDir)
            // same instance back = file set already matches (a replay
            // that reproduced identical files) — skip the no-op save
            if (!(next eq idx)) next.save(indexDir)
          } else
            DataSkipping.buildMinMaxIndex(spark, dataDir, cols).save(indexDir)
          bloomIndexDir.foreach { bDir =>
            if (fs.exists(new Path(s"$bDir/stats"))) {
              val idx = BloomSkipping.BloomIndex.load(spark, bDir)
              val next = idx.reconciled(spark, dataDir)
              if (!(next eq idx)) next.save(bDir)
            } else
              BloomSkipping.buildBloomIndex(spark, dataDir, bloomCols,
                expectedItems = bloomExpectedItems).save(bDir)
          }
        }
        ()
      }
      .start()
  }

  private def leafCount(spark: org.apache.spark.sql.SparkSession,
                        dataDir: String): Int = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isDirectory &&
      s.getPath.getName.startsWith("batch_id="))
  }
}
