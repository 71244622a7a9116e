package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for plain parquet trees: bin-pack the small
  * files of each partition leaf into ~target-size files, touching
  * nothing else. This is the maintenance half of the
  * [[graft.streaming.StreamingIngest]] story — a file-stream sink
  * lands one file per micro-batch per task, and at 100 TB that debt
  * compounds into the classic small-file problem: every query pays a
  * LIST + OPEN + footer round-trip per file, the scan bill grows with
  * file COUNT while data volume stands still. Table formats solve it
  * with OPTIMIZE over their transaction log; this is the same
  * bin-packing contract for plain directories.
  *
  * The packing itself is Spark's own: the rewrite read runs with
  * `spark.sql.files.maxPartitionBytes` pinned to the target size and
  * `openCostInBytes` at zero, so the FileSourceScan's first-fit
  * partition packing assembles each task's input as one ~target-size
  * bin and the task writes exactly one output file — NO shuffle, no
  * repartition, read-once-write-once per byte. Only files under the
  * `smallBytes` threshold are rewritten (and only when a leaf has at
  * least two), so the cost of a run is proportional to the standing
  * small-file DEBT, never to table size — the incremental contract
  * that makes nightly compaction affordable at scale. Leaves rewrite
  * concurrently on a bounded pool (separate Spark jobs; leaf count
  * needing work is debt-scale, not table-scale).
  *
  * Not atomic, honestly: plain parquet has no commit log, so new files
  * APPEND first and the replaced ones delete after — a reader racing
  * the swap can see duplicate rows (never missing ones). Run it when
  * the tree is quiet; readers that go through
  * [[DataSkipping.MinMaxIndex.scan]] are protected loudly rather than
  * silently — the index's staleness refusal rejects the drifted file
  * set mid-swap, and `reconciled` (run after compaction, the
  * `compact-files --index` path) makes it serveable again.
  *
  * `collapse`: a tree partitioned ONLY by a bookkeeping column (the
  * ingest sink's `batch_id=<epoch>` level) never benefits from per-leaf
  * packing — each micro-batch leaf holds one small file, and the column
  * exists for replay idempotence, not for queries. Collapsing declares
  * that column bookkeeping: every sub-target leaf EXCEPT the newest
  * merges into the newest collapsed leaf's dir (their rows take its
  * partition value — collapse does not preserve the column's values,
  * which is the point). The newest leaf overall is always left alone:
  * an at-least-once foreachBatch replay may overwrite exactly that
  * leaf, and compacting it would race the replay into duplicates;
  * every older leaf is checkpoint-committed and safe to rewrite.
  */
object FileCompaction {

  /** One rewritten leaf: `leaf` is the tree-relative dir ("" for a
    * flat dir), `filesBefore` the small files consumed, `filesAfter`
    * the packed files written, `bytes` the on-disk bytes rewritten. */
  final case class LeafReport(leaf: String, filesBefore: Int,
                              filesAfter: Int, bytes: Long)

  final case class Report(leaves: Seq[LeafReport],
                          untouchedLeaves: Int,
                          newestLeafKept: Option[String]) {
    def filesBefore: Int = leaves.map(_.filesBefore).sum
    def filesAfter: Int = leaves.map(_.filesAfter).sum
    def bytes: Long = leaves.map(_.bytes).sum
  }

  private[graft] final case class DataFile(path: Path, leaf: String, len: Long)

  /** Bin-pack the tree at `dataPath`. `smallBytes` defaults to half
    * the target (a file past half-target merges into something BIGGER
    * than target — rewriting it buys little and churns much).
    * `collapse` merges a single-level bookkeeping partition column's
    * sub-target leaves (see object scaladoc). */
  def compactTree(spark: SparkSession, dataPath: String,
                  targetBytes: Long = 128L * 1024 * 1024,
                  smallBytes: Long = -1L,
                  collapse: Option[String] = None,
                  parallelism: Int = 4): Report = {
    require(targetBytes > 0, s"--target-bytes must be positive, got $targetBytes")
    val small = if (smallBytes > 0) smallBytes else targetBytes / 2
    require(small <= targetBytes,
      s"--small-bytes ($small) above --target-bytes ($targetBytes): " +
        "every output file would immediately count as small again")
    val base = new Path(dataPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(base), s"$dataPath does not exist")

    val files = listWithSizes(spark, dataPath)
    val byLeaf = files.groupBy(_.leaf)

    val conf = spark.conf
    val savedMax = conf.getOption("spark.sql.files.maxPartitionBytes")
    val savedOpen = conf.getOption("spark.sql.files.openCostInBytes")
    val savedMin = conf.getOption("spark.sql.files.minPartitionNum")
    conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    // zero open cost: the default 4 MB would count a 10 KB file as
    // 4 MB toward the bin and close packs early — output files would
    // land far under target
    conf.set("spark.sql.files.openCostInBytes", "0")
    // without this the effective bin is min(target, totalBytes /
    // defaultParallelism): Spark splits a small rewrite across every
    // core and each task writes a FRAGMENT — the exact disease this
    // job cures
    conf.set("spark.sql.files.minPartitionNum", "1")
    try {
      val (collapsedReport, keptNewest, remaining) = collapse match {
        case Some(col) => collapseLeaves(spark, fs, base, byLeaf, col, targetBytes)
        case None      => (None, None, byLeaf)
      }
      val work = remaining.toSeq.sortBy(_._1).flatMap { case (leaf, fsIn) =>
        val smalls = fsIn.filter(_.len < small)
        if (smalls.size < 2) None else Some((leaf, smalls))
      }
      val untouched = remaining.size - work.size
      val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val reports =
        try Await.result(
          Future.sequence(work.map { case (leaf, smalls) =>
            Future(rewrite(spark, fs, base, leaf, leafDir(base, leaf), smalls))
          }), Duration.Inf)
        finally pool.shutdown()
      Report(collapsedReport.toSeq ++ reports, untouched, keptNewest)
    } finally {
      savedMax.fold(conf.unset("spark.sql.files.maxPartitionBytes"))(
        conf.set("spark.sql.files.maxPartitionBytes", _))
      savedOpen.fold(conf.unset("spark.sql.files.openCostInBytes"))(
        conf.set("spark.sql.files.openCostInBytes", _))
      savedMin.fold(conf.unset("spark.sql.files.minPartitionNum"))(
        conf.set("spark.sql.files.minPartitionNum", _))
    }
  }

  /** Merge every sub-target leaf of the single-level `col` partition —
    * except the newest overall (replay safety) — into the newest
    * COLLAPSED leaf's dir. Returns (report, newest-kept leaf,
    * leaves remaining for the per-leaf pass). */
  private def collapseLeaves(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem, base: Path,
      byLeaf: Map[String, Seq[DataFile]], col: String, targetBytes: Long)
    : (Option[LeafReport], Option[String], Map[String, Seq[DataFile]]) = {
    val prefix = s"$col="
    val bad = byLeaf.keys.filter(l => !l.startsWith(prefix) || l.contains('/'))
    require(bad.isEmpty,
      s"--collapse $col needs a tree partitioned by EXACTLY that one " +
        s"level; found leaf dir(s): ${bad.toSeq.sorted.take(3).mkString(", ")}")
    def idOf(leaf: String): Long =
      try leaf.stripPrefix(prefix).toLong
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"--collapse $col: leaf '$leaf' has a non-numeric value — collapse " +
          "orders leaves by numeric id to protect the replayable newest one") }
    val newest = byLeaf.keys.maxBy(idOf)
    val candidates = (byLeaf - newest).filter {
      case (_, fsIn) => fsIn.map(_.len).sum < targetBytes
    }
    if (candidates.size < 2)
      return (None, Some(newest), byLeaf - newest)
    val target = candidates.keys.maxBy(idOf)
    val smalls = candidates.values.flatten.toSeq
    val report = rewrite(spark, fs, base, target, leafDir(base, target), smalls)
    // departed leaves hold only hidden bookkeeping now (_SUCCESS and
    // kin) — drop them whole so a reader of the tree never lists a
    // valueless partition dir
    (candidates.keys.toSeq.sorted.filter(_ != target)).foreach { leaf =>
      val d = leafDir(base, leaf)
      val it = if (fs.exists(d)) fs.listFiles(d, true) else null
      var visible = false
      while (it != null && it.hasNext && !visible) {
        val n = it.next().getPath.getName
        visible = !(n.startsWith("_") || n.startsWith("."))
      }
      if (it != null && !visible) fs.delete(d, true)
    }
    (Some(report), Some(newest),
      (byLeaf -- candidates.keys - newest))
  }

  /** Read `smalls` packed, append the packed files into `dir`, delete
    * the originals. Append-then-delete order: a racing reader can see
    * duplicates, never a hole. */
  private def rewrite(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                      base: Path, leaf: String, dir: Path,
                      smalls: Seq[DataFile]): LeafReport = {
    val before = existingNames(fs, dir)
    // explicit file list WITHOUT basePath: partition values live in
    // the dir name, not in the files — the rewrite must write exactly
    // the in-file schema back
    spark.read.parquet(smalls.map(_.path.toString): _*)
      .write.mode("append").parquet(dir.toString)
    smalls.foreach { f =>
      require(fs.delete(f.path, false), s"could not delete ${f.path}")
    }
    val after = existingNames(fs, dir) -- (before -- smalls.map(_.path.getName))
    LeafReport(leaf, smalls.size, after.size, smalls.map(_.len).sum)
  }

  private def existingNames(fs: org.apache.hadoop.fs.FileSystem,
                            dir: Path): Set[String] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet

  private def leafDir(base: Path, leaf: String): Path =
    if (leaf.isEmpty) base else new Path(base, leaf)

  /** Every visible data file with its size and tree-relative leaf dir
    * — the same visibility rule as [[DataSkipping]]'s lister (`_`/`.`
    * segments hidden, zero-length files skipped). */
  private[graft] def listWithSizes(spark: SparkSession, dataPath: String): Seq[DataFile] = {
    val p = new Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val basePath = fs.makeQualified(p).toUri.getPath
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[DataFile]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getLen > 0) {
        val rel = s.getPath.toUri.getPath.stripPrefix(basePath).stripPrefix("/")
        val segs = rel.split('/')
        if (!segs.exists(seg => seg.startsWith("_") || seg.startsWith(".")))
          out += DataFile(s.getPath, segs.dropRight(1).mkString("/"), s.getLen)
      }
    }
    out.result()
  }
}
