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
}
