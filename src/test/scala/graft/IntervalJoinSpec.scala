package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions.col

/** The generic interval-overlap join: brute-force equivalence on
  * randomized keyed intervals (bucket-width INDEPENDENCE — any width,
  * including the adaptive choice, gives the identical answer),
  * left-total counts, empty-interval edge cases, clash prefixing,
  * keyless joins, adaptive width selection, and the plan shape (hash
  * join + residual, never a nested-loop cross product).
  */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  // randomized keyed intervals, negative times and EMPTY intervals
  // (len 0) included — the half-open overlap predicate is only valid
  // for nonempty intervals, and div truncates toward zero below zero,
  // both of which the operator must absorb
  private val rnd = new scala.util.Random(7)
  private val leftRows = (0 until 160).map { i =>
    val s = rnd.nextInt(1000) - 500L
    (rnd.nextInt(4) + 1L, s, s + rnd.nextInt(51).toLong, i.toLong)
  }
  private val rightRows = (0 until 160).map { i =>
    val s = rnd.nextInt(1000) - 500L
    (rnd.nextInt(4) + 1L, s, s + rnd.nextInt(51).toLong, i.toLong)
  }
  private def lDF = leftRows.toDF("k", "ls", "le", "lid")
  private def rDF = rightRows.toDF("rk", "rs", "re", "rid")

  private def brutePairs(keyed: Boolean): Set[(Long, Long)] =
    (for {
      (lk, ls, le, lid) <- leftRows
      (rk, rs, re, rid) <- rightRows
      if (!keyed || lk == rk) && ls < re && rs < le && ls < le && rs < re
    } yield (lid, rid)).toSet

  test("pairs equal brute force for ANY bucket width, including adaptive") {
    val want = brutePairs(keyed = true)
    assert(want.size > 300, s"fixture too sparse: ${want.size} pairs")
    for (bucket <- Seq(Some(1L), Some(7L), Some(64L), Some(100000L), None)) {
      val got = IntervalJoin.overlap(lDF, rDF, Seq("k" -> "rk"),
          "ls", "le", "rs", "re", bucket)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"bucket=$bucket emitted a pair more than once")
      assert(got.toSet == want, s"bucket=$bucket diverged from brute force")
    }
  }

  test("keyless join matches on overlap alone") {
    val got = IntervalJoin.overlap(lDF, rDF, Nil, "ls", "le", "rs", "re",
        bucketMs = Some(32L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == brutePairs(keyed = false))
  }

  test("overlapCount is left-total: zero rows kept, empty intervals never match") {
    val bruteCounts = brutePairs(keyed = true)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = IntervalJoin.overlapCount(lDF, rDF, Seq("k" -> "rk"),
        "ls", "le", "rs", "re", bucketMs = Some(16L))
      .select("lid", "n_overlaps").as[(Long, Long)].collect()
    assert(got.length == leftRows.size, "one census row per left row")
    got.foreach { case (lid, n) =>
      assert(n == bruteCounts.getOrElse(lid, 0L), s"lid $lid count diverged")
    }
    // the fixture's empty left intervals all report zero
    val emptyIds = leftRows.filter(r => r._3 <= r._2).map(_._4).toSet
    assert(emptyIds.nonEmpty, "fixture should include empty intervals")
    assert(got.filter(r => emptyIds(r._1)).forall(_._2 == 0L),
      "an empty [s, s) interval overlaps nothing")
  }

  test("TIMESTAMP endpoints are rejected loudly, not silently cast to seconds") {
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 0L))
      .toDF("k", "s", "e", "lid")
    val err = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(ts, rDF, Seq("k" -> "rk"), "s", "e", "rs", "re",
        bucketMs = Some(1000L))
    }
    assert(err.getMessage.contains("unix_millis"), err.getMessage)
    val err2 = intercept[IllegalArgumentException] {
      IntervalJoin.containsCount(ts, pDF, Seq("k" -> "pk"), "s", "e", "p")
    }
    assert(err2.getMessage.contains("unix_millis"), err2.getMessage)
  }

  test("fractional endpoints are rejected loudly, not silently truncated") {
    // with DOUBLE endpoints the bucket CAST(... AS LONG) truncates:
    // left [5.5, 6.5) replicates bucket {5}, right [6.2, 7.0) lands in
    // {6}, and a genuinely overlapping pair would be silently dropped —
    // so the operator must refuse the column type outright
    val dl = Seq((1L, 5.5, 6.5, 0L)).toDF("k", "s", "e", "lid")
    val err = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(dl, rDF, Seq("k" -> "rk"), "s", "e", "rs", "re",
        bucketMs = Some(1L))
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
    // fractional POINT column on the contains shape: same refusal
    val dp = Seq((1L, 6.1)).toDF("pk", "p")
    val err2 = intercept[IllegalArgumentException] {
      IntervalJoin.containsCount(lDF.withColumnRenamed("ls", "s")
        .withColumnRenamed("le", "e"), dp, Seq("k" -> "pk"), "s", "e", "p")
    }
    assert(err2.getMessage.contains("integral"), err2.getMessage)
    // integral widths other than LONG still work (no over-rejection)
    val il = Seq((1, 0, 10, 0)).toDF("k", "s", "e", "lid")
    val ir = Seq((1, 5, 20, 0)).toDF("rk", "rs", "re", "rid")
    assert(IntervalJoin.overlap(il, ir, Seq("k" -> "rk"), "s", "e", "rs", "re",
      bucketMs = Some(8L)).count() == 1L)
  }

  test("right columns clashing with left names come out right_-prefixed") {
    val l = Seq((1L, 0L, 10L)).toDF("k", "start", "end")
    val r = Seq((1L, 5L, 20L)).toDF("k", "start", "end")
    val out = IntervalJoin.overlap(l, r, Seq("k" -> "k"),
      "start", "end", "start", "end", bucketMs = Some(8L))
    assert(out.columns.toSeq ==
      Seq("k", "start", "end", "right_k", "right_start", "right_end"))
    assert(out.count() == 1L)
  }

  test("adaptive bucket tracks interval length: sub-day intervals choose a sub-day power of two") {
    // minute-scale intervals (1-8 min): a pinned day bucket would put
    // every interval of a key in one candidate block; the adaptive
    // width lands on the power of two covering the p95 length instead
    val minuteL = (0 until 200).map { i =>
      val s = i * 60000L
      (1L + i % 3, s, s + (60000L * (1 + rnd.nextInt(8))), i.toLong)
    }
    val l = minuteL.toDF("k", "ls", "le", "lid")
    val r = minuteL.map { case (k, s, e, id) => (k, s + 30000L, e + 30000L, id) }
      .toDF("rk", "rs", "re", "rid")
    val b = IntervalJoin.adaptiveBucketMs(l, "ls", "le", r, "rs", "re")
    assert((b & (b - 1)) == 0L, s"bucket must be a power of two: $b")
    assert(b >= 420000L && b <= 1048576L,
      s"bucket must cover the ~7-min p95 without day-scale slack: $b")
    // and the adaptive run equals a pinned run — width never changes
    // the answer
    val a = IntervalJoin.overlap(l, r, Seq("k" -> "rk"), "ls", "le", "rs", "re")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val p = IntervalJoin.overlap(l, r, Seq("k" -> "rk"), "ls", "le", "rs", "re",
        bucketMs = Some(86400000L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(a == p && a.nonEmpty)
  }

  test("bucketReport prices a width: day-pinned on minute data fires, adaptive stays quiet") {
    val minuteL = (0 until 200).map { i =>
      val s = i * 60000L
      (1L + i % 3, s, s + (60000L * (1 + rnd.nextInt(8))), i.toLong)
    }
    val l = minuteL.toDF("k", "ls", "le", "lid")
    val r = minuteL.map { case (k, s, e, id) => (k, s + 30000L, e + 30000L, id) }
      .toDF("rk", "rs", "re", "rid")
    // the degenerate width: a day bucket holds every interval of a key,
    // so candidates collapse toward the per-key cartesian (~200²/3)
    val day = IntervalJoin.bucketReport(l, r, Seq("k" -> "rk"),
      "ls", "le", "rs", "re", bucketMs = Some(86400000L))
    assert(day.recommendAdaptive, s"day-pinned on minute data must fire: $day")
    assert(day.leftReplication >= 1.0 && day.leftReplication < 1.05,
      s"huge buckets mean ~1 slot per interval: $day")
    // exact cartesian check: all of a key's intervals share bucket 0
    val perKey = minuteL.groupBy(_._1).view.mapValues(_.size.toLong)
    val wantCand = perKey.values.map(n => n * n).sum
    assert(day.candidatePairs == wantCand, s"got ${day.candidatePairs}, want $wantCand")
    // the adaptive width: candidates collapse, replication stays small,
    // and no recommendation fires (the choice IS the adaptive one)
    val auto = IntervalJoin.bucketReport(l, r, Seq("k" -> "rk"),
      "ls", "le", "rs", "re", bucketMs = None)
    assert(!auto.recommendAdaptive && auto.bucketMs == auto.adaptiveMs)
    assert(auto.candidatePairs < day.candidatePairs / 4,
      s"adaptive width must slash candidate pressure: $auto vs $day")
    assert(auto.leftReplication < 3.0, s"replication stays bounded: $auto")
    // a pinned width equal to the adaptive one is also quiet
    val pinnedOk = IntervalJoin.bucketReport(l, r, Seq("k" -> "rk"),
      "ls", "le", "rs", "re", bucketMs = Some(auto.adaptiveMs))
    assert(!pinnedOk.recommendAdaptive)
    // too-SMALL widths fire the other side of the tradeoff
    val tiny = IntervalJoin.bucketReport(l, r, Seq("k" -> "rk"),
      "ls", "le", "rs", "re", bucketMs = Some(1000L))
    assert(tiny.recommendAdaptive && tiny.leftReplication > 50.0,
      s"1s buckets on minute intervals replicate heavily: $tiny")
  }

  // point-in-interval fixture: random points against the left intervals
  private val pointRows = (0 until 200).map { i =>
    (rnd.nextInt(4) + 1L, rnd.nextInt(1100) - 550L, i.toLong)
  }
  private def pDF = pointRows.toDF("pk", "p", "pid")

  private def bruteContains: Set[(Long, Long)] =
    (for {
      (lk, ls, le, lid) <- leftRows
      (pk, p, pid) <- pointRows
      if lk == pk && p >= ls && p < le
    } yield (lid, pid)).toSet

  test("contains equals brute force for any bucket width; empty intervals contain nothing") {
    val want = bruteContains
    assert(want.size > 100, s"fixture too sparse: ${want.size}")
    for (bucket <- Seq(Some(1L), Some(13L), Some(100000L), None)) {
      val got = IntervalJoin.contains(lDF, pDF, Seq("k" -> "pk"),
          "ls", "le", "p", bucket)
        .select("lid", "pid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bucket=$bucket duplicated a pair")
      assert(got.toSet == want, s"bucket=$bucket diverged from brute force")
    }
    // left-total census with zero-count (and empty) intervals kept
    val counts = IntervalJoin.containsCount(lDF, pDF, Seq("k" -> "pk"),
        "ls", "le", "p", bucketMs = Some(16L))
      .select("lid", "n_matches").as[(Long, Long)].collect()
    assert(counts.length == leftRows.size)
    val bruteCounts = want.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    counts.foreach { case (lid, n) =>
      assert(n == bruteCounts.getOrElse(lid, 0L), s"lid $lid census diverged")
    }
  }

  test("containsCount census has NO join-back: one hash exchange end-to-end under broadcast") {
    // the q_range_join shape: zero-count intervals come from the LEFT
    // OUTER itself + a group over the interval columns — never a
    // second join against the intervals frame (which would re-shuffle
    // it and recompute its subtree)
    val plan = IntervalJoin.containsCount(lDF, pDF, Seq("k" -> "pk"),
        "ls", "le", "p", bucketMs = Some(16L))
      .queryExecution.executedPlan.toString
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins == 1, s"census must contain exactly ONE join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("DECIMAL(p,0) epochs are integral (accepted); fractional decimals stay rejected") {
    // CAST(decimal(p,0) AS LONG) is exact, so the bucket-grid argument
    // against fractional endpoints does not apply at scale 0 — DB/Hive
    // ingest commonly lands epoch columns as DECIMAL(18,0)
    val lDec = lDF.select(col("k"),
      col("ls").cast("decimal(18,0)").as("ls"),
      col("le").cast("decimal(18,0)").as("le"), col("lid"))
    val got = IntervalJoin.overlap(lDec, rDF, Seq("k" -> "rk"),
        "ls", "le", "rs", "re", bucketMs = Some(16L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == brutePairs(keyed = true),
      "decimal(18,0) endpoints must join identically to longs")
    val lFrac = lDF.select(col("k"),
      col("ls").cast("decimal(18,2)").as("ls"), col("le"), col("lid"))
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(lFrac, rDF, Seq("k" -> "rk"),
        "ls", "le", "rs", "re", bucketMs = Some(16L))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("bucketReport guards its reserved names like the operator does") {
    val lN = lDF.withColumnRenamed("k", "__ij_n")
    val rN = rDF.withColumnRenamed("rk", "__ij_n")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.bucketReport(lN, rN, Seq("__ij_n" -> "__ij_n"),
        "ls", "le", "rs", "re", bucketMs = Some(16L))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("plan shape: equi-join with residual — a hash/merge join, never a cross product") {
    val plan = IntervalJoin.overlap(lDF, rDF, Seq("k" -> "rk"),
      "ls", "le", "rs", "re", bucketMs = Some(16L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"interval join must never plan a cross product:\n$plan")
    // at most one shuffle per side (zero when a side broadcasts)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <= 1 exchange per side:\n$plan")
  }
}
