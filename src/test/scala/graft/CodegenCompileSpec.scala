package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator

/** Board-wide codegen net: every WholeStageCodegen stage of every
  * registered query must actually COMPILE. Janino failure at runtime
  * is silent — Spark logs one ERROR and falls back to interpreted
  * evaluation, so answers stay right while throughput drops ~10x; no
  * plan-string assertion can catch it because the plan looks identical.
  * This spec generates each stage's Java source exactly the way
  * execution does (`WholeStageCodegenExec.doCodeGen`) and compiles it
  * through the same `CodeGenerator.compile` entry, WITHOUT executing
  * the queries — a few ms per distinct stage. The z-order prune gate is
  * the live precedent: alias inlining by CollapseProject/pushdown blew
  * a Morton expression tree past janino's method limit and only the
  * runtime log betrayed it (ZOrderSpec keeps the targeted
  * runtime-appender guard for that gate; this net covers the board).
  *
  * AQE wraps plans in AdaptiveSparkPlanExec and only collapses codegen
  * stages at execution, so stages are collected with AQE off — the
  * same generated code, visible statically.
  */
class CodegenCompileSpec extends SparkSuite {

  /** Collect and compile every WholeStageCodegen stage of `df`'s plan
    * (AQE must already be off); returns the stage count for this plan. */
  private def compileStages(
      name: String, df: org.apache.spark.sql.DataFrame,
      seen: scala.collection.mutable.Set[Int],
      failures: scala.collection.mutable.ArrayBuffer[String]): Int = {
    val plan = df.queryExecution.executedPlan
    var stages = 0
    plan.collectWithSubqueries { case w: WholeStageCodegenExec => w }
      .foreach { w =>
        val (_, code) = w.doCodeGen()
        stages += 1
        // identical stages recur across the board (same scan/agg
        // shapes); compile each distinct source once
        if (seen.add(code.body.hashCode)) {
          try CodeGenerator.compile(code)
          catch { case e: Throwable =>
            failures += s"$name: ${e.getMessage.linesIterator.next().take(160)}"
          }
        }
      }
    stages
  }

  private def withAqeOff[T](body: => T): T = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("every WholeStageCodegen stage of every registered query compiles") {
    val sf = SparkSuite.sf0001
    val seen = scala.collection.mutable.Set[Int]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var stages = 0
    withAqeOff {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        stages += compileStages(name, fn(spark, sf), seen, failures)
      }
    }
    assert(stages > 200, s"collected only $stages codegen stages — collection broke")
    assert(failures.isEmpty,
      s"${failures.size} stage(s) fail to compile (silent interpreted fallback):\n" +
        failures.mkString("\n"))
  }

  test("CLI-core plans outside the gate registry compile too") {
    // The z-order incident's failure mode — janino overflow, silent
    // interpreted fallback — is invisible to the gate net for plans
    // only the CLI verbs build. Compile a representative plan behind
    // each CLI-only operator: the minmax `scan` (flat AND partitioned
    // subset reads), the `layout` verb's z-value frame, the advised
    // join's salted and broadcast shapes, and the `export --by-bytes`
    // distributed prefix sum. Streaming twins are excluded: their
    // per-micro-batch plans only exist inside a running query, and
    // their batch-shaped cores (as-of, interval, sessionize, minmax
    // fold) are all covered above or here.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = s"${SparkSuite.sf0001}/lineitem.parquet"
    val base = tmpDir("codegen-cli")

    // minmax scan over a two-level partitioned tree (subset + residual)
    val data = s"$base/part"
    spark.read.parquet(li)
      .withColumn("pk", pmod(col("l_orderkey"), lit(2)).cast("int"))
      .repartition(2)
      .write.partitionBy("pk").parquet(data)
    val idx = graft.operators.DataSkipping
      .buildMinMaxIndex(spark, data, Seq("pk", "l_suppkey"))
    val scanPlan = idx.scan(spark, data,
      Seq(("pk", 0.0, 0.0), ("l_suppkey", 1.0, 3.0)))

    // layout verb's core: rank + interleave frame (the Morton tree that
    // originally overflowed janino)
    val zPlan = graft.operators.ZOrder.withZValue(
      spark.read.parquet(li), Seq("l_partkey", "l_suppkey"), bits = 16)

    // advised join, salted and broadcast shapes
    val skewL = (0 until 4000).map { i =>
      (if (i < 3000) "hot" else s"k${i % 200}", i)
    }.toDF("k", "v")
    val skewR = (0 until 800).map { i =>
      (if (i < 400) "hot" else s"k${i % 200}", i)
    }.toDF("rk", "w")
    val (salted, repS) = graft.operators.JoinPreflight.joinAdvised(
      skewL, Seq("k"), skewR, Seq("rk"),
      sampleFraction = 1.0, topK = 1000, broadcastBytes = -1L, saltBuckets = 4)
    assert(repS.recommendation == "salted-shuffle", repS.recommendation)
    val (bcast, repB) = graft.operators.JoinPreflight.joinAdvised(
      skewL, Seq("k"), skewR.limit(50), Seq("rk"),
      sampleFraction = 1.0, topK = 1000)
    assert(repB.recommendation == "broadcast-right", repB.recommendation)

    // export --by-bytes core: the two-phase distributed prefix sum
    val prefix = graft.operators.PrefixSum.exclusivePrefix(
      spark.range(1000).map(i => (i, i % 7)), parts = 8)

    val plans = Seq(
      "scan-partitioned" -> scanPlan,
      "layout-zvalue" -> zPlan,
      "join-advised-salted" -> salted,
      "join-advised-broadcast" -> bcast,
      "export-prefix-sum" -> prefix.toDF())
    val seen = scala.collection.mutable.Set[Int]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var stages = 0
    withAqeOff {
      plans.foreach { case (name, df) =>
        stages += compileStages(name, df, seen, failures)
      }
    }
    assert(stages >= plans.size,
      s"collected only $stages codegen stages across ${plans.size} CLI plans")
    assert(failures.isEmpty,
      s"${failures.size} CLI-core stage(s) fail to compile:\n" +
        failures.mkString("\n"))
  }
}
