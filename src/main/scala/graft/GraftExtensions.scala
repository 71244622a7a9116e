package graft

import graft.functions.{CosineSimilarity, CountTokensInSet, IntersectSize, RollingHash, WordNGrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, ExpressionInfo, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rule: fuse `size(array_intersect(a, b))` into the native
  * [[IntersectSize]] count — same value, no per-row intersection array.
  * Guarded to string arrays (the expression's domain) and to the
  * default non-legacy `size` (legacy `size(null) = -1` would diverge
  * from the fused form's null-out). Runs in the operatorOptimization
  * batch, so it sees the composition wherever it appears — DataFrame
  * code, views, or raw SQL.
  */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def strArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), false) if strArr(l) && strArr(r) =>
      IntersectSize(l, r)
  }
}

/** SparkSessionExtensions entry point: makes the graft-native Catalyst
  * expressions callable from SQL. Deploy-time wiring is the standard
  * one — `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), so a
  * pure-SQL user gets `rolling_hash(text)` and `word_ngrams(text, n)`
  * with whole-stage codegen, no Scala API needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => RollingHash(text)
        case _ => throw new IllegalArgumentException(
          s"rolling_hash(text) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("tokens_in_set"),
      new ExpressionInfo(classOf[CountTokensInSet].getName, "tokens_in_set"),
      (children: Seq[Expression]) => children match {
        case Seq(tokens, set) => CountTokensInSet(tokens, set)
        case _ => throw new IllegalArgumentException(
          "tokens_in_set(tokens, set) takes exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_similarity(a, b) takes exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "intersect_size"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => IntersectSize(a, b)
        case _ => throw new IllegalArgumentException(
          "intersect_size(a, b) takes exactly 2 arguments")
      }))
    ext.injectOptimizerRule(_ => RewriteIntersectSize)
    // whole-operator extension (custom-operator ladder step c): the
    // backward as-of join's logical node plans through this strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(n: Int, IntegerType)) => WordNGrams(text, n)
        case _ => throw new IllegalArgumentException(
          "word_ngrams(text, n) requires a string column and an integer literal n")
      }))
    // theta-sketch family: set-operation sketches (direct intersection
    // estimates — the operation HLL inclusion–exclusion cannot do
    // without union-scale error)
    ext.injectFunction((
      FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaSketchAgg].getName,
        "theta_sketch_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.ThetaSketchAgg(c)
        case Seq(c, Literal(lgK: Int, IntegerType)) =>
          graft.functions.ThetaSketchAgg(c, lgK)
        case _ => throw new IllegalArgumentException(
          "theta_sketch_agg(col[, lgK]) takes a column and an optional integer literal lgK")
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_merge_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaMergeAgg].getName,
        "theta_merge_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.ThetaMergeAgg(c)
        case _ => throw new IllegalArgumentException(
          "theta_merge_agg(sketch) takes exactly 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[graft.functions.ThetaEstimate].getName,
        "theta_estimate"),
      (children: Seq[Expression]) => children match {
        case Seq(sk) => graft.functions.ThetaEstimate(sk)
        case _ => throw new IllegalArgumentException(
          "theta_estimate(sketch) takes exactly 1 argument")
      }))
    // KLL quantile-sketch family: mergeable distribution summaries
    ext.injectFunction((
      FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.KllSketchAgg].getName,
        "kll_sketch_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.KllSketchAgg(c)
        case Seq(c, Literal(k: Int, IntegerType)) =>
          graft.functions.KllSketchAgg(c, k)
        case _ => throw new IllegalArgumentException(
          "kll_sketch_agg(col[, k]) takes a column and an optional integer literal k")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[graft.functions.KllMergeAgg].getName,
        "kll_merge_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.KllMergeAgg(c)
        case _ => throw new IllegalArgumentException(
          "kll_merge_agg(sketch) takes exactly 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[graft.functions.KllQuantile].getName,
        "kll_quantile"),
      (children: Seq[Expression]) => children match {
        case Seq(sk, p) => graft.functions.KllQuantile(sk, p)
        case _ => throw new IllegalArgumentException(
          "kll_quantile(sketch, p) takes exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_rank"),
      new ExpressionInfo(classOf[graft.functions.KllRank].getName, "kll_rank"),
      (children: Seq[Expression]) => children match {
        case Seq(sk, v) => graft.functions.KllRank(sk, v)
        case _ => throw new IllegalArgumentException(
          "kll_rank(sketch, v) takes exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_intersect_estimate"),
      new ExpressionInfo(classOf[graft.functions.ThetaIntersectEstimate].getName,
        "theta_intersect_estimate"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => graft.functions.ThetaIntersectEstimate(a, b)
        case _ => throw new IllegalArgumentException(
          "theta_intersect_estimate(a, b) takes exactly 2 arguments")
      }))
  }
}
