package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** KLL quantile sketches (Karnin–Lang–Liberty 2016) as native Catalyst
  * aggregates/expressions — the DISTRIBUTION member of the sketch triad
  * (HLL = cardinality, theta = set algebra, KLL = quantiles/ranks).
  *
  * What it adds over `approx_percentile`: Spark's percentile sketch
  * lives and dies inside one aggregation — its buffer is not a value a
  * job can persist, ship, or merge later. A KLL sketch is a first-class
  * BINARY value: build per-grain sketches once (per source, per day,
  * per shard), store kilobytes, then answer any quantile/rank question
  * later — including questions that need MERGING grains (a week's p99
  * from 7 daily sketches, corpus length distribution from per-source
  * rows) — without re-touching data. Deterministic by construction:
  * unlike sampling-based summaries, KLL compaction here is the
  * DataSketches deterministic-offset variant, and SketchSpec pins
  * rank-error bounds on planted distributions.
  *
  * At k = 200 the normalized rank error is ≈ 1.65% worst-case
  * (single-sided ~0.8% typical) and a sketch tops out near 5 KiB —
  * small enough that a year of daily per-source sketches broadcasts.
  */
object KllSketch {
  /** Default k: DataSketches' own default, ~1.65% worst-case rank
    * error, ≤ ~5 KiB serialized. */
  val K = 200

  import org.apache.spark.sql.{Column, GraftExprBridge}

  /** `kll_sketch_agg(values)` as a Column aggregate (numeric input). */
  def sketchAgg(c: Column): Column = GraftExprBridge.toColumn(
    KllSketchAgg(GraftExprBridge.toExpression(c)).toAggregateExpression())

  /** `kll_merge_agg(sk)` as a Column aggregate: fold a column of
    * serialized sketches into one (the rollup/artifact-merge path). */
  def mergeAgg(c: Column): Column = GraftExprBridge.toColumn(
    KllMergeAgg(GraftExprBridge.toExpression(c)).toAggregateExpression())

  /** `kll_quantile(sk, p)` as a Column. */
  def quantile(sk: Column, p: Column): Column = GraftExprBridge.toColumn(
    KllQuantile(GraftExprBridge.toExpression(sk), GraftExprBridge.toExpression(p)))

  /** `kll_rank(sk, v)` as a Column: fraction of values ≤ v. */
  def rank(sk: Column, v: Column): Column = GraftExprBridge.toColumn(
    KllRank(GraftExprBridge.toExpression(sk), GraftExprBridge.toExpression(v)))

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Shared TypedImperativeAggregate plumbing for the two KLL aggregates
  * (value-updating and sketch-merging) — one buffer type, one
  * serialization. */
sealed trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)
}

/** Aggregate numeric values into one KLL sketch (binary). Null inputs
  * skip (SQL aggregate convention); int/long/float inputs widen to
  * double — the sketch is a double sketch, callers needing exact
  * integer quantiles at the extremes should note the 2^53 envelope. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketch.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg supports double/float/bigint/int input, got ${other.catalogString}")
  }

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType => buf.update(v.asInstanceOf[Double])
      case FloatType => buf.update(v.asInstanceOf[Float].toDouble)
      case LongType => buf.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buf.update(v.asInstanceOf[Int].toDouble)
      case _ => ()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Fold a column of serialized KLL sketches into one — the rollup and
  * artifact-merge aggregate (mergeability is the reason to store
  * sketches at all). `k` of the RESULT follows the smallest input k
  * per DataSketches merge semantics; this library builds everything at
  * [[KllSketch.K]]. */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllSketch.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires binary sketches, got ${other.catalogString}")
  }

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sk, p)`: the value at normalized rank p ∈ [0, 1]
  * (INCLUSIVE search — the value whose rank is ≥ p, DataSketches'
  * default convention). Null on an EMPTY sketch (a quantile of nothing
  * is not a number, and raising would poison artifact scans over
  * freshly-initialized rows). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary sketch, double rank), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(sk: Any, p: Any): Any = {
    val s = KllSketch.heapify(sk.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sk, v)`: normalized rank of v — the fraction of the
  * sketched values ≤ v (INCLUSIVE). Null on an empty sketch. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_rank"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_rank requires (binary sketch, double value), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(sk: Any, v: Any): Any = {
    val s = KllSketch.heapify(sk.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getRank(v.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}
