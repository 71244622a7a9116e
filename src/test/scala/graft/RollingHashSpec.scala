package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSuite {
  import spark.implicits._

  private val P = (BigInt(1) << 61) - 1
  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) mod P).toLong

  test("native expression matches BigInt reference, interpreted and codegen") {
    val inputs = Seq("", "a", "hello world", "key agg row scan", "éè€ unicode",
      "x" * 5000)
    val df = inputs.toDF("s")
    val got = df.select(RollingHash.rolling_hash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(reference))
    // codegen path: force through a whole-stage-codegen projection chain
    val got2 = df.select((RollingHash.rolling_hash(col("s")) + lit(0L)).as("h"))
      .as[Long].collect()
    assert(got2.toSeq == inputs.map(reference))
  }

  test("non-string input is rejected at analysis") {
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(RollingHash.rolling_hash(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE"))
  }

  test("storage probe: existing vs missing dir") {
    assert(graft.restore.RestoreEngine.storageAccessible(spark, "/root/testdata"))
    assert(!graft.restore.RestoreEngine.storageAccessible(spark, "/tmp/definitely-missing-xyz"))
  }
}
