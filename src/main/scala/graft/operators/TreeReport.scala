package graft.operators

import org.apache.spark.sql.SparkSession

/** One-listing health report for a parquet tree: the sizing questions
  * an operator asks BEFORE paying for maintenance — how many files,
  * how much of the byte volume sits in sub-target files, how many
  * leaves carry the debt, what would compaction buy — answered from
  * file METADATA only (one recursive listing, zero data rows read).
  * The report that prices the machinery must be cheaper than the
  * machinery: this is the `tree-report` sibling of the index quality
  * reports, for the file-layout axis.
  *
  * The recommendation lines are measured, not vibes: `compact-files`
  * is suggested only when the packing arithmetic (ceil of per-leaf
  * small bytes over the target) actually removes files, and the
  * small-file COUNT share — not the byte share — is quoted as the
  * scan-bill driver, because at 100 TB the per-file open/footer
  * round-trip is what the debt costs (a thousand 1 MB files bill like
  * a thousand files, not like 1 GB).
  */
object TreeReport {

  final case class LeafStat(leaf: String, files: Int, bytes: Long,
                            smallFiles: Int, smallBytes: Long,
                            packedFiles: Int)

  final case class Report(
      dataPath: String,
      targetBytes: Long,
      smallBytes: Long,
      files: Int,
      bytes: Long,
      leaves: Seq[LeafStat],
      sizeDeciles: Seq[Long]) {
    def smallFiles: Int = leaves.map(_.smallFiles).sum
    def smallByteSum: Long = leaves.map(_.smallBytes).sum
    /** Files after a `compact-files` run at these thresholds. */
    def packedFiles: Int =
      files - smallFiles + leaves.map(_.packedFiles).sum
    /** Leaves that a compaction run would actually rewrite. */
    def debtLeaves: Int = leaves.count(l => l.smallFiles >= 2)

    def lines: Seq[String] = {
      val base = Seq(
        f"$files%,d files, $bytes%,d bytes across ${leaves.size} leaf dir(s)",
        f"small-file debt (< $smallBytes%,d bytes): $smallFiles%,d files " +
          f"(${if (files == 0) 0 else smallFiles * 100 / files}%% of the " +
          f"file count — the scan-bill share) holding $smallByteSum%,d bytes",
        s"file-size deciles: ${sizeDeciles.map(b => f"$b%,d").mkString(", ")}")
      val rec =
        if (files == 0) Seq("empty tree: nothing to maintain")
        else if (packedFiles >= files)
          Seq(f"layout is healthy at target $targetBytes%,d: " +
            "compaction would not reduce the file count")
        else Seq(
          f"compact-files would rewrite $smallFiles%,d files across " +
            f"$debtLeaves leaf dir(s) into ~${leaves.map(_.packedFiles).sum} " +
            f"packed file(s): $files%,d -> ~$packedFiles%,d files " +
            "(append-then-delete swap; reconcile any skipping index with " +
            "--index/--bloom-index)")
      base ++ rec
    }
  }

  /** Metadata-only: one recursive listing, grouped per leaf. */
  def report(spark: SparkSession, dataPath: String,
             targetBytes: Long = 128L * 1024 * 1024,
             smallBytes: Long = -1L): Report = {
    require(targetBytes > 0, s"--target-bytes must be positive, got $targetBytes")
    val small = if (smallBytes > 0) smallBytes else targetBytes / 2
    val files = FileCompaction.listWithSizes(spark, dataPath)
    val leaves = files.groupBy(_.leaf).toSeq.sortBy(_._1).map {
      case (leaf, fs) =>
        val smalls = fs.filter(_.len < small)
        val smallSum = smalls.map(_.len).sum
        LeafStat(leaf, fs.size, fs.map(_.len).sum, smalls.size, smallSum,
          // what the packer would produce from this leaf's debt: bins
          // of at most targetBytes (zero when there is no debt to pack
          // or a single file that would only be renamed)
          if (smalls.size < 2) smalls.size
          else math.ceil(smallSum.toDouble / targetBytes).toInt)
    }
    val sorted = files.map(_.len).sorted
    val deciles =
      if (sorted.isEmpty) Seq.empty
      else (0 to 10).map(i =>
        sorted(math.min(sorted.size - 1, i * sorted.size / 10)))
    Report(dataPath, targetBytes, small, files.size, sorted.sum,
      leaves, deciles)
  }
}
