package graft

import graft.queries.AnalyticsQueries
import java.math.{BigDecimal => JBD, RoundingMode}

/** Semantics specs for the analytics operators that carry non-trivial
  * numeric contracts (the plan shapes are pinned in PlanSpec; the
  * cross-engine values in the oracle gate — this checks the math against
  * an in-memory reference).
  */
class AnalyticsOpsSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  test("half-life decay matches an exact in-memory DECIMAL reference") {
    val ev = graft.model.Tables.pq(spark, sf, "events")
      .selectExpr("event_type", "ts div 1000000 as ts_ms", "value")
      .as[(String, Long, Double)].collect()
    val tmax = ev.map(_._2).max
    val expect = ev.groupBy(_._1).map { case (tpe, rows) =>
      var decayed = JBD.ZERO
      var raw = JBD.ZERO
      rows.foreach { case (_, ts, v) =>
        // mirror the query's arithmetic exactly: DECIMAL(18,4) value
        // times an exact 2^-k weight, k = whole half-lives capped at 10
        val k = math.min((tmax - ts) / 604800000L, 10L).toInt
        val dv = JBD.valueOf(v).setScale(4, RoundingMode.HALF_UP)
        decayed = decayed.add(dv.multiply(new JBD(0.5).pow(k)))
        raw = raw.add(dv)
      }
      (tpe, rows.size.toLong, decayed.doubleValue, raw.doubleValue)
    }.toSeq.sortBy(_._1)
    val got = AnalyticsQueries.decayedValueSums(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == expect.map(r => (r._1, r._2)))
    got.zip(expect).foreach { case ((tpe, _, d, r), (_, _, ed, er)) =>
      assert(math.abs(d - ed) < 1e-9, s"$tpe decayed: $d vs $ed")
      assert(math.abs(r - er) < 1e-9, s"$tpe raw: $r vs $er")
      // decay strictly discounts anything older than one half-life
      assert(math.abs(d) <= math.abs(r) + 1e-9)
    }
  }

  test("interval-overlap join: day-bucketed exactly-once equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    val got = AnalyticsQueries.intervalOverlapJoin(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // naive reference computed in memory: sessionize, then the plain
    // O(sessions x windows) overlap count per user — the form the
    // distributed query must reproduce without its bucket replication
    // ever double-counting a pair (a session spanning multiple days
    // co-occurs with a window in every shared bucket; only the
    // overlap-start bucket may count it)
    val ev = graft.model.Tables.pq(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000000").as("ts_ms"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val gap = 30L * 60 * 1000
    val sessions = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val ids = sorted.tail.scanLeft((sorted.head, 1L)) { case ((prev, sid), r) =>
        (r, if (r._2 - prev._2 > gap) sid + 1 else sid)
      }
      ids.groupBy(_._2).map { case (sid, g) =>
        (u, sid, g.map(_._1._2).min, g.map(_._1._2).max + 1)
      }
    }.toSeq
    val wins = ev.filter(_._4 == "error").map(r => (r._1, r._2, r._2 + 3600000L))
    val expect = sessions.map { case (u, sid, s0, s1) =>
      (u, sid, s0, s1,
        wins.count(w => w._1 == u && s0 < w._3 && w._2 < s1).toLong)
    }.sortBy(r => (r._1, r._2))
    assert(got == expect, s"interval overlap diverged (first 5): " +
      s"${got.take(5)} vs ${expect.take(5)}")
    assert(expect.exists(_._5 > 0), "fixture lacks any overlap")
    // the 60-min window exceeds the 30-min gap precisely so windows CROSS
    // session boundaries — verify the join is load-bearing here: some
    // session must overlap more windows than the errors it contains
    val errorsIn = sessions.map { case (u, sid, s0, s1) =>
      (u, sid) -> wins.count(w => w._1 == u && w._2 >= s0 && w._2 < s1).toLong
    }.toMap
    assert(expect.exists { case (u, sid, _, _, n) => n > errorsIn((u, sid)) },
      "no cross-session overlap in the fixture: a per-session error count " +
        "would be indistinguishable from the interval join")
    // sf0.001 sessions rarely cross midnight, so drive the exactly-once
    // bucket condition with a crafted fixture: ONE session spanning two
    // days overlapping ONE error window that ALSO spans both days — the
    // pair co-occurs in two buckets and must still count once
    val dir = tmpDir("interval-overlap")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (0L, ts("2024-01-01 23:50:00"), 1L, "click", 1.0, "{}"),
      (1L, ts("2024-01-01 23:55:00"), 1L, "error", 1.0, "{}"), // window 23:55-00:55
      (2L, ts("2024-01-02 00:10:00"), 1L, "click", 1.0, "{}"), // same session (20m gap)
      (3L, ts("2024-01-05 12:00:00"), 2L, "click", 1.0, "{}"), // no error: 0 overlaps
      // cross-session alert: the error's 60-min window outlives the
      // 40-min gap and overlaps user 3's SECOND session, which itself
      // contains no error
      (4L, ts("2024-01-07 12:00:00"), 3L, "error", 1.0, "{}"), // window 12:00-13:00
      (5L, ts("2024-01-07 12:40:00"), 3L, "click", 1.0, "{}")  // new session (40m gap)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val crafted = AnalyticsQueries.intervalOverlapJoin(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(crafted.map(r => (r._1, r._2, r._5)) ==
      Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L), (3L, 2L, 1L)),
      s"double-bucket dedup or cross-session overlap wrong: $crafted")
  }
}
