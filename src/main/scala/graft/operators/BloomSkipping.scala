package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.functions.BloomFilterAgg
import graft.queries.IndexArtifact

/** Per-file BLOOM skipping index: the equality twin of
  * [[DataSkipping]]. Minmax boxes prune RANGE predicates, but on a
  * high-cardinality key in arrival order every file's (min, max) spans
  * the whole domain — the box test passes everywhere and a point
  * lookup (`doc_id = X`, `user_id = U`) still opens every file. A
  * bloom filter per (file, column) answers exactly that case: no false
  * negatives (a pruned file DEFINITELY lacks the key — correctness
  * never rides on probability), a sized false-positive rate (an extra
  * file read, a cost not a wrong answer). This is the same trick table
  * formats bolt on next to their min/max stats (Parquet's own optional
  * bloom pages, Delta/Iceberg column filters), externalized for plain
  * directories on the shared [[IndexArtifact]] layout.
  *
  * The build is ONE distributed pass: group by `input_file_name`, one
  * [[graft.functions.BloomAgg]] per indexed column — ~120 KiB per
  * (file, column) at the defaults. The probe is a distributed filter
  * over the files-scale stats frame (only surviving file NAMES are
  * collected, never the filters), so driver memory stays bounded at
  * any file count.
  *
  * Same staleness contract as minmax: [[BloomIndex.scan]] REFUSES a
  * drifted file set (an unindexed file might hold the key — skipping
  * it silently would LOSE rows), [[BloomIndex.updated]] folds appended
  * files without re-scanning the corpus, rewrites rebuild.
  */
object BloomSkipping {

  /** `stats`: one row per data file — `file`, `rows`, and `bf_<c>`
    * (serialized bloom) per indexed column. Zero-row files carry NULL
    * filters, which match nothing — pruning never reads them. */
  final case class BloomIndex(stats: DataFrame,
                              expectedItems: Long, fpp: Double) {
    def cols: Seq[String] =
      stats.columns.filter(_.startsWith("bf_")).map(_.stripPrefix("bf_")).toSeq

    def save(path: String): Unit =
      IndexArtifact.save(path, Map("stats" -> stats),
        meta = Map("expected_items" -> expectedItems,
          "fpp_ppm" -> math.round(fpp * 1e6)))

    /** Fold stats for files present in `dataPath` but not yet indexed —
      * the nightly-append refresh; touches only the new files. */
    def updated(spark: SparkSession, dataPath: String): BloomIndex = {
      val have = DataSkipping.indexedFiles(stats).map(DataSkipping.normalize)
      val fresh = DataSkipping.listDataFiles(spark, dataPath)
        .filterNot(f => have(DataSkipping.normalize(f)))
      if (fresh.isEmpty) this
      else copy(stats = stats.unionByName(bloomStats(
        spark.read.option("basePath", dataPath).parquet(fresh: _*),
        cols, fresh, expectedItems, fpp)).localCheckpoint(true))
    }

    /** Streaming-sink / compaction maintenance: drop stats rows for
      * files no longer on disk, fold stats for unindexed files — the
      * result equals a rebuild over the CURRENT file set. The bloom
      * sibling of [[DataSkipping.MinMaxIndex.reconciled]], for sinks
      * that OWN their rewrites (foreachBatch replay overwrites,
      * [[FileCompaction]] swaps); batch jobs keep add-only [[updated]]
      * so [[scan]]'s staleness refusal still catches rewrites the
      * index does not control. Returns `this` on a no-op. */
    def reconciled(spark: SparkSession, dataPath: String): BloomIndex = {
      val onDisk = DataSkipping.listDataFiles(spark, dataPath)
      val disk = onDisk.map(DataSkipping.normalize).toSet
      val have = DataSkipping.indexedFiles(stats).map(DataSkipping.normalize)
      val fresh = onDisk.filterNot(f => have(DataSkipping.normalize(f)))
      val gone = have -- disk
      if (fresh.isEmpty && gone.isEmpty) this
      else {
        val kept =
          if (gone.isEmpty) stats
          else {
            val goneSpellings = stats.select("file").collect()
              .map(_.getString(0)).filter(f => gone(DataSkipping.normalize(f)))
            stats.filter(!col("file").isin(goneSpellings.toSeq: _*))
          }
        val folded =
          if (fresh.isEmpty) kept
          else kept.unionByName(bloomStats(
            spark.read.option("basePath", dataPath).parquet(fresh: _*),
            cols, fresh, expectedItems, fpp))
        copy(stats = folded.localCheckpoint(true))
      }
    }

    /** Files that MIGHT hold every `(col, value)` — the distributed
      * membership probe; only names come back to the driver. */
    def prunedFiles(eqs: Seq[(String, Any)]): Seq[String] = {
      val known = cols.toSet
      eqs.foreach { case (c, _) =>
        require(known(c),
          s"column '$c' is not bloom-indexed (has: ${known.mkString(", ")}) — " +
            "an equality on an unindexed column cannot prune and would scan everything")
      }
      val kept = eqs.foldLeft(stats) { case (df, (c, v)) =>
        df.where(BloomFilterAgg.mightContain(col(s"bf_$c"), lit(v)))
      }
      kept.select("file").collect().map(_.getString(0)).toSeq
    }

    /** Staleness-checked pruned file list — the consult half of
      * [[scan]], exposed so a composed scan can intersect this
      * index's survivors with another index's before ONE read. */
    def scanFiles(spark: SparkSession, dataPath: String,
                  eqs: Seq[(String, Any)]): Seq[String] = {
      val onDisk = DataSkipping.listDataFiles(spark, dataPath)
        .map(DataSkipping.normalize).toSet
      val indexed = DataSkipping.indexedFiles(stats).map(DataSkipping.normalize)
      val missing = onDisk -- indexed
      val gone = indexed -- onDisk
      require(missing.isEmpty && gone.isEmpty,
        s"bloom index is stale for $dataPath: ${missing.size} unindexed " +
          s"file(s), ${gone.size} indexed file(s) no longer present — " +
          "fold appends in with update-index --kind bloom, rebuild after rewrites")
      prunedFiles(eqs)
    }

    /** Pruned exact point scan: read only files whose filters admit
      * every key, apply the exact equality as the residual (this is
      * where false positives die). Refuses a stale index loudly. */
    def scan(spark: SparkSession, dataPath: String,
             eqs: Seq[(String, Any)]): DataFrame = {
      val files = scanFiles(spark, dataPath, eqs)
      val base =
        if (files.isEmpty) spark.read.parquet(dataPath).where(lit(false))
        else spark.read.option("basePath", dataPath).parquet(files: _*)
      eqs.foldLeft(base) { case (df, (c, v)) => df.where(col(c) === lit(v)) }
    }
  }

  object BloomIndex {
    def load(spark: SparkSession, path: String): BloomIndex = {
      val meta = IndexArtifact.meta(spark, path)
      BloomIndex(IndexArtifact.frame(spark, path, "stats"),
        meta("expected_items"), meta("fpp_ppm") / 1e6)
    }
  }

  /** Build the index in one distributed pass over `dataPath`.
    * `expectedItems` sizes each per-file filter — size it to the
    * DISTINCT keys a file can hold (rows per file is a safe upper
    * bound); overflowing it degrades fpp (extra reads), never
    * correctness. */
  def buildBloomIndex(spark: SparkSession, dataPath: String, cols: Seq[String],
                      expectedItems: Long = BloomFilterAgg.ExpectedItems,
                      fpp: Double = BloomFilterAgg.Fpp): BloomIndex = {
    require(cols.nonEmpty, "--cols: bloom needs at least one column")
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bloom parameters out of range: expectedItems=$expectedItems fpp=$fpp")
    val df = spark.read.parquet(dataPath)
    cols.foreach { c =>
      require(df.columns.contains(c),
        s"column '$c' not in $dataPath (has: ${df.columns.mkString(", ")})")
      require(Seq(LongType, IntegerType, StringType).contains(df.schema(c).dataType),
        s"bloom column '$c' must be bigint/int/string, got ${df.schema(c).dataType}")
    }
    BloomIndex(
      bloomStats(df, cols, DataSkipping.listDataFiles(spark, dataPath),
        expectedItems, fpp).localCheckpoint(true),
      expectedItems, fpp)
  }

  /** Per-file bloom rows covering EVERY file in `files` (zero-row
    * files get NULL filters) — the bloom sibling of
    * [[DataSkipping.statsOf]], same spelling normalization so
    * incremental folds compare equal to rebuilds. */
  private def bloomStats(df: DataFrame, cols: Seq[String], files: Seq[String],
                         expectedItems: Long, fpp: Double): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      cols.map(c => BloomFilterAgg.bloomAgg(col(c), expectedItems, fpp)
        .as(s"bf_$c"))
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
}
