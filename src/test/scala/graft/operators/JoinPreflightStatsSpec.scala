package graft.operators

import graft.SparkSuite

/** Durable keystats pricing: in exact mode the artifact-based report
  * must EQUAL the live report field-for-field, and the scope guards
  * (mixed types, mismatched samples) refuse loudly. */
class JoinPreflightStatsSpec extends SparkSuite {
  import spark.implicits._

  test("exact mode: reportFromStats equals the live report field-for-field") {
    val left = (0L until 4000L).map(i => (i % 97L, i)).toDF("k", "lv")
    val right = (0L until 1500L).map(i => (i % 53L, i * 2)).toDF("k", "rv")
    // same frames through both paths, full sample, hist wide open
    val live = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 1.0, topK = 128,
      broadcastBytes = JoinPreflight.defaultBroadcastBytes)
    val ls = JoinPreflight.buildKeyStats(left, Seq("k"),
      sampleFraction = 1.0, histK = 4096)
    val rs = JoinPreflight.buildKeyStats(right, Seq("k"),
      sampleFraction = 1.0, histK = 4096)
    val fromStats = JoinPreflight.reportFromStats(spark, ls, rs,
      topK = 128, broadcastBytes = JoinPreflight.defaultBroadcastBytes)
    assert(fromStats.left == live.left, s"${fromStats.left} vs ${live.left}")
    assert(fromStats.right == live.right)
    assert(fromStats.estMatchedKeys == live.estMatchedKeys)
    assert(fromStats.estOutputRows == live.estOutputRows)
    assert(fromStats.recommendation == live.recommendation)
    assert(fromStats.hotPairShare == live.hotPairShare)
    // and exact mode is the truth: est == the actual inner join count
    val truth = left.join(right, "k").count()
    assert(fromStats.estOutputRows == truth,
      s"${fromStats.estOutputRows} vs true $truth")
  }

  test("artifact round-trips through save/load and still prices identically") {
    val base = tmpDir("keystats-roundtrip")
    val t = (0L until 2000L).map(i => (i % 31L, s"s${i % 7}", i))
      .toDF("a", "b", "v")
    val built = JoinPreflight.buildKeyStats(t, Seq("a", "b"),
      sampleFraction = 1.0, histK = 1024)
    built.save(s"$base/ks")
    val loaded = JoinPreflight.KeyStats.load(spark, s"$base/ks")
    assert(loaded.keys == Seq("a", "b") &&
      loaded.keyTypes == Seq("bigint", "string"))
    assert(loaded.rows == built.rows && loaded.sampledRows == built.sampledRows)
    val a = JoinPreflight.reportFromStats(spark, built, built,
      broadcastBytes = 1L)
    val b = JoinPreflight.reportFromStats(spark, loaded, loaded,
      broadcastBytes = 1L)
    assert(a.estOutputRows == b.estOutputRows &&
      a.recommendation == b.recommendation)
  }

  test("scope guards: mixed key types and mismatched samples refuse loudly") {
    val longs = (0L until 500L).map(i => Tuple1(i)).toDF("k")
    val strs = (0L until 500L).map(i => Tuple1(i.toString)).toDF("k")
    val ls = JoinPreflight.buildKeyStats(longs, Seq("k"), sampleFraction = 1.0)
    val ss = JoinPreflight.buildKeyStats(strs, Seq("k"), sampleFraction = 1.0)
    val e = intercept[IllegalArgumentException] {
      JoinPreflight.reportFromStats(spark, ls, ss)
    }
    assert(e.getMessage.contains("mixed-type"))
    val half = JoinPreflight.buildKeyStats(longs, Seq("k"), sampleFraction = 0.5)
    val e2 = intercept[IllegalArgumentException] {
      JoinPreflight.reportFromStats(spark, ls, half)
    }
    assert(e2.getMessage.contains("sample fractions differ"))
  }

  test("truncated histogram degrades to tail pricing, never crashes") {
    // histK = 2 keeps only the two hottest keys; the verdict still
    // forms (tail average covers the rest) and matched keys hold
    val t = (0L until 3000L).map(i => (i % 11L, i)).toDF("k", "v")
    val tiny = JoinPreflight.buildKeyStats(t, Seq("k"),
      sampleFraction = 1.0, histK = 2)
    assert(tiny.hist.count() == 2)
    val rep = JoinPreflight.reportFromStats(spark, tiny, tiny,
      broadcastBytes = 1L)
    assert(rep.estMatchedKeys >= 10 && rep.estMatchedKeys <= 12)
    assert(rep.estOutputRows > 0)
  }
}
