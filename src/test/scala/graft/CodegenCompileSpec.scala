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

  test("every WholeStageCodegen stage of every registered query compiles") {
    val sf = SparkSuite.sf0001
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val seen = scala.collection.mutable.Set[Int]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var stages = 0
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
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
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(stages > 200, s"collected only $stages codegen stages — collection broke")
    assert(failures.isEmpty,
      s"${failures.size} stage(s) fail to compile (silent interpreted fallback):\n" +
        failures.mkString("\n"))
  }
}
