package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // ISO backup keys contain ':'; local ChecksumFileSystem builds .crc
      // sibling Paths that misparse them (HADOOP-14829). Raw local FS has
      // no checksum siblings; object stores (s3a/gs) are unaffected.
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // events.parquet stores TIMESTAMP(NANOS) which Spark otherwise rejects
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide flat-column expressions (64-dim embeddings) make Catalyst
      // constraint propagation quadratic-to-exponential; plans carry
      // explicit filters, so inferred constraints are expendable
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** Driver-side reference for the Morton bit mapping (z-bit `k * n + i`
  * carries bit `k` of rank `i`) — the single oracle both ZOrderSpec and
  * PropertySpec assert [[graft.operators.ZOrder.interleave]] against.
  */
object MortonRef {
  def interleave(ranks: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- ranks.indices; k <- 0 until bits)
      z |= ((ranks(i) >> k) & 1L) << (k * ranks.size + i)
    z
  }
}
