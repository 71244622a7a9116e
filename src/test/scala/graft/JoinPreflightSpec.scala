package graft

import graft.operators.JoinPreflight
import org.apache.spark.sql.functions._

/** The join pre-flight's contract: in exact mode (sampleFraction = 1,
  * topK ≥ distinct keys, counts below theta's 2^12 retained keys) the
  * output estimate must EQUAL the join's true row count — every term
  * of the estimator is exact there, so any drift is a defect, not
  * noise. Sampled mode gets a band. Routing (broadcast / salted /
  * shuffle / insufficient) is pinned on planted fixtures, including
  * the one-sided-hot-key case that must NOT trigger salting.
  */
class JoinPreflightSpec extends SparkSuite {
  import spark.implicits._

  private def exact(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      broadcastBytes: Long = 1L) =
    JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 1.0, topK = 4000, broadcastBytes = broadcastBytes)

  test("exact mode prices a uniform join exactly; plain shuffle verdict") {
    val left = (0 until 2000).map(i => (s"key${i % 200}", i)).toDF("k", "v")
    val right = (0 until 600).map(i => (s"key${i % 300}", i)).toDF("k", "w")
    val rep = exact(left, right)
    val actual = left.join(right, "k").count()
    assert(rep.estOutputRows == actual,
      s"exact-mode estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.estMatchedKeys == 200L, s"matched keys ${rep.estMatchedKeys}")
    assert(rep.left.rows == 2000L && rep.right.rows == 600L)
    assert(rep.left.estDistinctKeys == 200L && rep.right.estDistinctKeys == 300L)
    assert(rep.recommendation == "shuffle", rep.recommendation)
    assert(rep.hotPairShare < JoinPreflight.defaultHotShareThreshold)
  }

  test("hot key on BOTH sides: salted verdict, hot pair dominates, estimate exact") {
    val left = (0 until 10000).map { i =>
      (if (i < 9000) "hot" else s"k${i % 500}", i)
    }.toDF("k", "v")
    val right = (0 until 2000).map { i =>
      (if (i < 1000) "hot" else s"k${i % 500}", i)
    }.toDF("k", "w")
    val rep = exact(left, right)
    val actual = left.join(right, "k").count()
    assert(rep.estOutputRows == actual,
      s"exact-mode estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.recommendation == "salted-shuffle", rep.recommendation)
    assert(rep.hotPairShare > 0.5, s"hot pair share ${rep.hotPairShare}")
  }

  test("hot key on ONE side only inflates nothing: plain shuffle verdict") {
    // "hot" owns 90% of the left but is ABSENT from the right — the
    // output has no hot pair, and the report must see through it
    val left = (0 until 10000).map { i =>
      (if (i < 9000) "hot" else s"k${i % 500}", i)
    }.toDF("k", "v")
    val right = (0 until 1500).map(i => (s"k${i % 500}", i)).toDF("k", "w")
    val rep = exact(left, right)
    val actual = left.join(right, "k").count()
    assert(rep.estOutputRows == actual,
      s"exact-mode estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.recommendation == "shuffle", rep.recommendation)
    assert(rep.hotPairShare < JoinPreflight.defaultHotShareThreshold,
      s"one-sided hot key must not read as a hot pair: ${rep.hotPairShare}")
  }

  test("a hitter on one side priced from the other side's tail still counts in full") {
    // 'hot' owns half the left but sits BELOW the right's top-K (5 rows
    // vs the uniform keys' 20): a two-list estimator that only prices
    // keys on BOTH top-K lists would charge it two tail averages and
    // miss the skew entirely. The union-priced set reads its true
    // sampled count from the right histogram, so the estimate stays
    // exact and the hot pair crosses the salting threshold.
    val left = (0 until 10000).map { i =>
      (if (i < 5000) "hot" else s"k${i % 100}", i)
    }.toDF("k", "v")
    val right = ((0 until 2000).map(i => (s"k${i % 100}", i)) ++
      (0 until 5).map(i => ("hot", i))).toDF("k", "w")
    val rep = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 1.0, topK = 8, broadcastBytes = 1L)
    val actual = left.join(right, "k").count() // 5000*5 + 100*50*20 = 125000
    assert(rep.estOutputRows == actual,
      s"one-sided-hitter estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.recommendation == "salted-shuffle", rep.recommendation)
    assert(rep.hotPairShare >= 0.2, s"hot pair share ${rep.hotPairShare}")
  }

  test("cross-width and cross-type numeric keys coerce like the join does") {
    // INT vs BIGINT keys: the join coerces and matches; the pre-flight
    // must too (exact mode → exact count)
    val left = (0 until 1000).map(i => (i % 200, i)).toDF("k", "v")
    val right = (0 until 400).map(i => (i.toLong % 200, i)).toDF("k", "w")
    val rep = exact(left, right)
    val actual = left.join(right, "k").count()
    assert(rep.estOutputRows == actual,
      s"int-vs-long estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.estMatchedKeys == 200L)
    // BIGINT vs DOUBLE: SQL compares as double — so does the pre-flight
    val dRight = (0 until 400).map(i => ((i % 200).toDouble, i)).toDF("k", "w")
    val rep2 = exact(left, dRight)
    val actual2 = left.join(dRight, "k").count()
    assert(rep2.estOutputRows == actual2,
      s"long-vs-double estimate ${rep2.estOutputRows} != true count $actual2")
    assert(rep2.estMatchedKeys == 200L)
  }

  test("small dimension side: broadcast verdict at the default threshold") {
    val left = (0 until 5000).map(i => (s"k${i % 100}", i)).toDF("k", "v")
    val right = (0 until 100).map(i => (s"k$i", i)).toDF("k", "w")
    val rep = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 1.0, topK = 4000)
    assert(rep.recommendation == "broadcast-right", rep.recommendation)
    val flipped = JoinPreflight.report(right, Seq("k"), left, Seq("k"),
      sampleFraction = 1.0, topK = 4000,
      broadcastBytes = 10000L) // right(=big) over, left(=small) under
    assert(flipped.recommendation == "broadcast-left", flipped.recommendation)
  }

  test("the verdict follows the session's own broadcast threshold, including disabled") {
    val left = (0 until 5000).map(i => (s"k${i % 100}", i)).toDF("k", "v")
    val right = (0 until 100).map(i => (s"k$i", i)).toDF("k", "w")
    // default threshold (10 MB): the 100-row side broadcasts
    val withDefault = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 1.0, topK = 4000)
    assert(withDefault.recommendation == "broadcast-right")
    // a session that DISABLED broadcasting must never be advised to
    // broadcast — advice the planner cannot take
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val disabled = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
        sampleFraction = 1.0, topK = 4000)
      assert(disabled.recommendation == "shuffle", disabled.recommendation)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("disjoint key domains read ~zero matches, not an NDV worst case") {
    val left = (0 until 3000).map(i => (s"L$i", i)).toDF("k", "v")
    val right = (0 until 3000).map(i => (s"R$i", i)).toDF("k", "w")
    val rep = exact(left, right)
    assert(rep.estMatchedKeys == 0L, s"matched ${rep.estMatchedKeys}")
    assert(rep.estOutputRows == 0L, s"output ${rep.estOutputRows}")
  }

  test("sampled mode: uniform-join estimate lands within a 2x band") {
    val left = (0 until 40000).map(i => (s"key${i % 400}", i)).toDF("k", "v")
      .repartition(8)
    val right = (0 until 12000).map(i => (s"key${i % 400}", i)).toDF("k", "w")
      .repartition(8)
    val rep = JoinPreflight.report(left, Seq("k"), right, Seq("k"),
      sampleFraction = 0.2, topK = 64, broadcastBytes = 1L)
    val actual = left.join(right, "k").count()
    assert(rep.estOutputRows >= actual / 2 && rep.estOutputRows <= actual * 2,
      s"sampled estimate ${rep.estOutputRows} outside 2x of $actual")
    assert(rep.recommendation == "shuffle", rep.recommendation)
  }

  test("null keys are excluded everywhere, matching SQL join semantics") {
    val left = Seq(("a", 1), (null, 2), ("b", 3), (null, 4)).toDF("k", "v")
    val n = (0 until 200).map(i => (s"x$i", i)) // bulk to clear the floor
    val right = (Seq(("a", 10), (null, 20)) ++ n).toDF("k", "w")
    val bulkyLeft = left.unionByName(n.toDF("k", "v"))
    val rep = exact(bulkyLeft, right)
    val actual = bulkyLeft.join(right, "k").count()
    assert(rep.estOutputRows == actual,
      s"null-key estimate ${rep.estOutputRows} != true count $actual")
    assert(rep.left.rows == 202L, s"null left rows counted: ${rep.left.rows}")
  }

  test("composite keys keep their component boundary") {
    val left = (0 until 300).map(i => (s"a$i", "bc", i)).toDF("k1", "k2", "v")
    val right = (0 until 300).map(i => (s"a${i}b", "c", i)).toDF("k1", "k2", "w")
    val rep = JoinPreflight.report(left, Seq("k1", "k2"),
      right, Seq("k1", "k2"), sampleFraction = 1.0, topK = 4000,
      broadcastBytes = 1L)
    assert(rep.estMatchedKeys == 0L,
      s"(a$$i, bc) collided with (a$${i}b, c): ${rep.estMatchedKeys}")
    assert(rep.estOutputRows == 0L)
  }

  test("below the evidence floor a SAMPLED verdict abstains; exact mode never does") {
    val left = (0 until 50).map(i => (s"k$i", i)).toDF("k", "v")
    val right = (0 until 50).map(i => (s"k$i", i)).toDF("k", "w")
    // sampleFraction = 1.0 IS the full population: a 50-row side is
    // complete evidence, not a thin sample — the verdict must not
    // abstain on a table that trivially reads broadcast/shuffle
    val rep = exact(left, right)
    assert(rep.recommendation == "shuffle", rep.recommendation)
    assert(rep.estOutputRows == 50L)
    // a genuine sample that lands under the floor still abstains
    val bigL = (0 until 3000).map(i => (s"k${i % 500}", i)).toDF("k", "v")
    val bigR = (0 until 3000).map(i => (s"k${i % 500}", i)).toDF("k", "w")
    val thin = JoinPreflight.report(bigL, Seq("k"), bigR, Seq("k"),
      sampleFraction = 0.01, topK = 64, broadcastBytes = 1L)
    assert(thin.recommendation == "insufficient-sample",
      s"~30 sampled rows must abstain: ${thin.recommendation}")
  }

  test("decimal keys compare on the widened decimal, not a 2^53-lossy double") {
    import org.apache.spark.sql.types.DecimalType
    // ids beyond 2^53: doubles collide adjacent values, exact decimal
    // compare keeps them distinct — matched-keys must NOT over-count
    val base = BigDecimal("9007199254740992") // 2^53
    val lVals = (0 until 300).map(i => base + i)          // 2^53 .. 2^53+299
    val rVals = (0 until 300).map(i => base + 2 * i)      // every other
    val left = lVals.map(v => (v, 1)).toDF("k", "v")
      .select(col("k").cast(DecimalType(38, 0)).as("k"), col("v"))
    val right = rVals.map(v => (v, 1)).toDF("k", "w")
      .select(col("k").cast("long").as("k"), col("w"))  // DECIMAL(38,0) vs BIGINT
    val rep = exact(left, right)
    val actual = left.join(right, "k").count() // 150: the even offsets
    assert(actual == 150L, s"fixture drift: $actual")
    assert(rep.estMatchedKeys == actual,
      s"decimal-vs-bigint matched keys ${rep.estMatchedKeys} != $actual " +
        "(double rendering would collide the odd offsets into matches)")
    assert(rep.estOutputRows == actual, s"output ${rep.estOutputRows}")
    // two decimal scales: trailing zeros must not split equal values
    val l2 = (0 until 200).map(i => (BigDecimal(i), 1)).toDF("k", "v")
      .select(col("k").cast(DecimalType(12, 2)).as("k"), col("v"))
    val r2 = (0 until 400).map(i => (BigDecimal(i % 200), 1)).toDF("k", "w")
      .select(col("k").cast(DecimalType(20, 0)).as("k"), col("w"))
    val rep2 = exact(l2, r2)
    assert(rep2.estMatchedKeys == 200L, s"cross-scale: ${rep2.estMatchedKeys}")
    assert(rep2.estOutputRows == l2.join(r2, "k").count())
  }

  test("the report frame round-trips the verdict for the CLI") {
    val left = (0 until 2000).map(i => (s"key${i % 200}", i)).toDF("k", "v")
    val right = (0 until 600).map(i => (s"key${i % 300}", i)).toDF("k", "w")
    val row = exact(left, right).frame(spark).head()
    assert(row.getAs[String]("recommendation") == "shuffle")
    assert(row.getAs[Long]("est_matched_keys") == 200L)
    assert(row.getAs[Long]("left_rows") == 2000L)
  }

  // --- joinAdvised: each verdict class must change the physical plan
  // accordingly AND the answer must equal the plain inner join ---

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("joinAdvised broadcast verdict: hint lands in the plan, answer unchanged") {
    val left = (0 until 5000).map(i => (s"k${i % 100}", i)).toDF("k", "v")
    val right = (0 until 100).map(i => (s"k$i", i)).toDF("rk", "w")
    val (joined, rep) = JoinPreflight.joinAdvised(
      left, Seq("k"), right, Seq("rk"), sampleFraction = 1.0, topK = 4000)
    assert(rep.recommendation == "broadcast-right", rep.recommendation)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"broadcast-right verdict must plan a broadcast join:\n$plan")
    val plain = left.join(right, left("k") === right("rk"), "inner")
    assert(sortedRows(joined) == sortedRows(plain))
    assert(joined.columns.toSeq == plain.columns.toSeq)
  }

  test("joinAdvised salted verdict: salt keys in the exchange, answer unchanged") {
    // hot on BOTH sides, broadcasting disabled -> salted-shuffle
    val left = (0 until 10000).map { i =>
      (if (i < 9000) "hot" else s"k${i % 500}", i)
    }.toDF("k", "v")
    val right = (0 until 2000).map { i =>
      (if (i < 1000) "hot" else s"k${i % 500}", i)
    }.toDF("rk", "w")
    val (joined, rep) = JoinPreflight.joinAdvised(
      left, Seq("k"), right, Seq("rk"),
      sampleFraction = 1.0, topK = 4000, broadcastBytes = -1L,
      saltBuckets = 8)
    assert(rep.recommendation == "salted-shuffle", rep.recommendation)
    assert(rep.hotKeys == Seq("hot"), rep.hotKeys)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__jp_salt"),
      s"salted verdict must carry the salt key into the exchange:\n$plan")
    assert(!joined.columns.contains("__jp_salt"),
      "the salt is plumbing — it must not leak into the output schema")
    val plain = left.join(right, left("k") === right("rk"), "inner")
    assert(joined.count() == plain.count())
    assert(sortedRows(joined) == sortedRows(plain))
    assert(joined.columns.toSeq == plain.columns.toSeq)
  }

  test("joinAdvised shuffle verdict: plain join, no salt, no broadcast hint") {
    val left = (0 until 2000).map(i => (s"key${i % 200}", i)).toDF("k", "v")
    val right = (0 until 600).map(i => (s"key${i % 300}", i)).toDF("rk", "w")
    val (joined, rep) = JoinPreflight.joinAdvised(
      left, Seq("k"), right, Seq("rk"),
      sampleFraction = 1.0, topK = 4000, broadcastBytes = 1L)
    assert(rep.recommendation == "shuffle", rep.recommendation)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("__jp_salt"), "shuffle verdict must not salt")
    val plain = left.join(right, left("k") === right("rk"), "inner")
    assert(sortedRows(joined) == sortedRows(plain))
  }

}
