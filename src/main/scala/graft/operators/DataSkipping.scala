package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.IndexArtifact

/** File-stats skipping index over a plain parquet directory: one scan
  * computes each FILE's (rows, min, max) box over the indexed numeric
  * columns; a later range query consults the stats frame (files-scale
  * metadata), reads ONLY the files whose box intersects the predicate,
  * and applies the exact predicate as a residual. This is the external
  * form of the footer-stats pruning lakehouse formats keep in their
  * transaction log — for plain directories Spark must otherwise LIST
  * and OPEN every file even when the predicate excludes it, and at
  * 100 TB the open/footer round-trips are the scan bill. Pairs with
  * [[ZOrder.layout]]: z-ordering makes the per-file boxes tight on
  * every interleaved dimension, the index makes the skipping happen
  * without a table format.
  *
  * Staleness is the classic trap of external stats, so [[MinMaxIndex.scan]]
  * REFUSES to serve a directory whose file set drifted from the
  * indexed one (new files would be silently skipped — a wrong answer,
  * not a slow one; deleted files mean a rewrite the stats no longer
  * describe). Fold new files in with [[MinMaxIndex.updated]] (the
  * `update-index --kind minmax` path); rewrites rebuild.
  *
  * Layouts: flat directories (the [[ZOrder.layout]] / plain
  * `write.parquet` shape) AND hive-partitioned trees. Partitioned
  * reads keep their partition columns by pinning `basePath` when a
  * pruned FILE SUBSET is read — without it Spark derives no partition
  * values from explicit leaf paths and the subset would silently drop
  * those columns. Numeric partition columns are indexable like any
  * other (their per-file box is a point: min == max == the leaf's
  * value), so a range on a partition column prunes files exactly as
  * hive partition pruning would — and COMPOSES with boxes on interior
  * columns: each leaf's surviving files are the strict subset whose
  * data-column stats intersect, which plain partition pruning cannot
  * do.
  */
object DataSkipping {

  /** `stats`: one row per data file — `file`, `rows`, and `lo_<c>` /
    * `hi_<c>` (double) per indexed column.
    */
  final case class MinMaxIndex(stats: DataFrame) {
    /** Indexed column names, recovered from the stats schema. */
    def cols: Seq[String] =
      stats.columns.filter(_.startsWith("lo_")).map(_.stripPrefix("lo_")).toSeq

    def save(path: String): Unit =
      IndexArtifact.save(path, Map("stats" -> stats))

    /** Stats for files present in `dataPath` but not yet indexed,
      * unioned in — the nightly-append refresh. Touches only the new
      * files' rows; rewrites/deletions need a rebuild (and [[scan]]
      * refuses to serve them either way).
      */
    def updated(spark: SparkSession, dataPath: String): MinMaxIndex = {
      val have = indexedFiles(stats).map(normalize)
      val fresh = listDataFiles(spark, dataPath).filterNot(f => have(normalize(f)))
      if (fresh.isEmpty) this
      else MinMaxIndex(stats.unionByName(
        // basePath keeps partition-column values derivable from the
        // explicit leaf paths (indexed partition columns need them)
        statsOf(spark.read.option("basePath", dataPath).parquet(fresh: _*),
          cols, fresh))
        .localCheckpoint(true))
    }

    /** Streaming-sink maintenance: drop stats rows for files no longer
      * on disk, fold stats for unindexed files — the result equals a
      * rebuild over the CURRENT file set. This exists for
      * [[graft.streaming.StreamingIngest]], whose foreachBatch replay
      * OVERWRITES its own `batch_id=<id>` partition dir (the
      * idempotence contract): the replaced files leave, their
      * replacements fold in, and the index stays serveable at every
      * commit. Batch jobs should keep using [[updated]] — it only
      * adds, so [[scan]]'s staleness refusal still catches rewrites
      * the index does NOT control. Returns `this` (same instance)
      * when the file set already matches, so callers can skip a
      * no-op save.
      */
    def reconciled(spark: SparkSession, dataPath: String): MinMaxIndex = {
      val onDisk = listDataFiles(spark, dataPath)
      val disk = onDisk.map(normalize).toSet
      val have = indexedFiles(stats).map(normalize)
      val fresh = onDisk.filterNot(f => have(normalize(f)))
      val gone = have -- disk
      if (fresh.isEmpty && gone.isEmpty) this
      else {
        // files-scale: one collected name per DEPARTED file, matched
        // against the stats' own spelling of it
        val kept =
          if (gone.isEmpty) stats
          else {
            val goneSpellings = stats.select("file").collect()
              .map(_.getString(0)).filter(f => gone(normalize(f)))
            stats.filter(!col("file").isin(goneSpellings.toSeq: _*))
          }
        val folded =
          if (fresh.isEmpty) kept
          else kept.unionByName(statsOf(
            spark.read.option("basePath", dataPath).parquet(fresh: _*),
            cols, fresh))
        MinMaxIndex(folded.localCheckpoint(true))
      }
    }

    /** Files whose stats box intersects every `(col, lo, hi)` range
      * (inclusive bounds). Metadata-scale: the collect is one row per
      * file, never data rows.
      */
    def prunedFiles(ranges: Seq[(String, Double, Double)]): Seq[String] = {
      val known = cols.toSet
      ranges.foreach { case (c, lo, hi) =>
        require(known(c),
          s"column '$c' is not indexed (has: ${known.mkString(", ")}) — " +
            "a range on an unindexed column cannot prune and would scan everything")
        require(lo <= hi,
          s"range on '$c' is inverted ($lo > $hi) — it matches nothing; " +
            "swap the bounds if a window was meant")
      }
      val kept = ranges.foldLeft(stats) { case (df, (c, lo, hi)) =>
        df.where(col(s"lo_$c") <= hi && col(s"hi_$c") >= lo)
      }
      kept.select("file").collect().map(_.getString(0)).toSeq
    }

    /** Staleness-checked pruned file list — the consult half of
      * [[scan]], exposed so a composed scan can intersect this
      * index's survivors with another index's before ONE read. */
    def scanFiles(spark: SparkSession, dataPath: String,
                  ranges: Seq[(String, Double, Double)]): Seq[String] = {
      val onDisk = listDataFiles(spark, dataPath).map(normalize).toSet
      val indexed = indexedFiles(stats).map(normalize)
      val missing = onDisk -- indexed
      val gone = indexed -- onDisk
      require(missing.isEmpty && gone.isEmpty,
        s"minmax index is stale for $dataPath: ${missing.size} unindexed " +
          s"file(s), ${gone.size} indexed file(s) no longer present — " +
          "fold appends in with update-index --kind minmax, rebuild after rewrites")
      prunedFiles(ranges)
    }

    /** Pruned exact range scan of `dataPath`: read only intersecting
      * files, apply the exact predicate as the residual. Refuses a
      * stale index loudly (see object scaladoc). Returns the data
      * schema even when every file prunes away.
      */
    def scan(spark: SparkSession, dataPath: String,
             ranges: Seq[(String, Double, Double)]): DataFrame = {
      val files = scanFiles(spark, dataPath, ranges)
      val base =
        if (files.isEmpty) // keep the schema without reading data rows
          spark.read.parquet(dataPath).where(lit(false))
        else
          // basePath: a pruned file SUBSET of a hive-partitioned tree
          // must still derive its partition columns from the paths —
          // without it the subset read silently drops those columns
          spark.read.option("basePath", dataPath).parquet(files: _*)
      ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
        df.where(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
      }
    }
  }

  object MinMaxIndex {
    def load(spark: SparkSession, path: String): MinMaxIndex =
      MinMaxIndex(IndexArtifact.frame(spark, path, "stats"))
  }

  /** Build the index in one distributed scan of `dataPath`. */
  def buildMinMaxIndex(spark: SparkSession, dataPath: String,
                       cols: Seq[String]): MinMaxIndex = {
    require(cols.nonEmpty, "--cols: minmax needs at least one column")
    val df = spark.read.parquet(dataPath)
    cols.foreach { c =>
      require(df.columns.contains(c),
        s"column '$c' not in $dataPath (has: ${df.columns.mkString(", ")})")
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"minmax column '$c' must be numeric, got ${df.schema(c).dataType}")
    }
    // eager: a lazy stats plan would re-list the directory on every
    // action, silently absorbing files appended AFTER the build — the
    // stats must describe the file set as of build time (that is what
    // the staleness check verifies against), so pin them now
    MinMaxIndex(statsOf(df, cols, listDataFiles(spark, dataPath))
      .localCheckpoint(true))
  }

  /** Per-file stats for `df`, covering EVERY file in `files` — a
    * zero-row parquet file (a writer task that got no rows) yields no
    * data row to group, but the index must still describe it or the
    * staleness check would read it as forever-unindexed. Such files
    * carry `rows = 0` and NULL boxes: a null box intersects no range,
    * so pruning never reads them. */
  private[operators] def statsOf(df: DataFrame, cols: Seq[String],
                      files: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"lo_$c"),
        max(col(c)).cast("double").as(s"hi_$c")))
    // input_file_name() spells local files `file:///x` when the dir was
    // read whole but `file:/x` when files were listed explicitly (the
    // updated() fold path) — same URI, different text. Store ONE
    // spelling so an incremental fold is byte-equal to a rebuild.
    val computed = df
      .groupBy(regexp_replace(input_file_name(), "^file:///", "file:/").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val expected = files.map(f =>
      f.replaceFirst("^file:///", "file:/")).toDF("file")
    expected.join(computed, Seq("file"), "left")
      .withColumn("rows", coalesce(col("rows"), lit(0L)))
  }

  private[operators] def indexedFiles(stats: DataFrame): Set[String] =
    stats.select("file").collect().map(_.getString(0)).toSet

  /** `input_file_name()` emits `file:///x` where the Hadoop listing
    * gives `file:/x` — equivalent URIs, different text. Compare on the
    * scheme-normalized path component.
    */
  private[operators] def normalize(uri: String): String =
    new org.apache.hadoop.fs.Path(uri).toUri.getPath

  /** Data files under `dataPath` in `input_file_name()` form (URI),
    * resolved through the Hadoop FS API so any supported filesystem
    * works — not just local paths. RECURSIVE, so hive-partitioned
    * trees list their leaves; any path segment below the base that
    * starts with `_` or `.` is hidden by Spark's source convention
    * (e.g. `_spark_metadata/`, `_tmp.*`) and is skipped here the same
    * way.
    */
  private[operators] def listDataFiles(spark: SparkSession, dataPath: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val basePath = fs.makeQualified(p).toUri.getPath
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getLen > 0) {
        val rel = s.getPath.toUri.getPath.stripPrefix(basePath).stripPrefix("/")
        if (!rel.split('/').exists(seg =>
          seg.startsWith("_") || seg.startsWith(".")))
          out += s.getPath.toUri.toString
      }
    }
    out.result()
  }
}
