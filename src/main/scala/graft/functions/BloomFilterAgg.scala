package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filters as first-class BINARY values, via Spark's own public
  * sketch library (`org.apache.spark.util.sketch.BloomFilter` — the
  * same filter `DataFrameStatFunctions.bloomFilter` builds, but that
  * API materializes ONE filter on the driver; this aggregate builds
  * them distributed, one per GROUP, so a files-scale or source-scale
  * frame of filters comes out of a single pass).
  *
  * The membership twin of the sketch triad (HLL = cardinality, theta =
  * set algebra, KLL = quantiles): a bloom answers "might this value be
  * in that set?" with NO false negatives and a sized false-positive
  * rate — which is exactly the contract file skipping needs (a false
  * positive reads one extra file; a false negative would LOSE rows).
  * All buffers are created with the same (expectedItems, fpp) so
  * partial-aggregate merges are structurally compatible by
  * construction; a group holding more distinct values than
  * expectedItems degrades fpp (more files read), never correctness.
  */
object BloomFilterAgg {
  /** Defaults sized for per-parquet-file groups: 100k expected keys at
    * 1% fpp is ~120 KiB per filter. */
  val ExpectedItems = 100000L
  val Fpp = 0.01

  import org.apache.spark.sql.{Column, GraftExprBridge}

  /** `bloom_agg(keys)` as a Column aggregate (long/int/string input). */
  def bloomAgg(c: Column, expectedItems: Long = ExpectedItems,
               fpp: Double = Fpp): Column = GraftExprBridge.toColumn(
    BloomAgg(GraftExprBridge.toExpression(c), expectedItems, fpp)
      .toAggregateExpression())

  /** `bloom_might_contain(bf, v)` as a Column: false only when v is
    * definitely absent from the aggregated set. */
  def mightContain(bf: Column, v: Column): Column = GraftExprBridge.toColumn(
    BloomMightContain(GraftExprBridge.toExpression(bf),
      GraftExprBridge.toExpression(v)))

  private[functions] def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private[functions] def write(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}

/** Aggregate long/int/string keys into one serialized bloom filter.
  * Nulls skip (SQL aggregate convention); int widens to long so a
  * probe with a long literal matches int-typed data. */
case class BloomAgg(
    child: Expression,
    expectedItems: Long = BloomFilterAgg.ExpectedItems,
    fpp: Double = BloomFilterAgg.Fpp,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg supports bigint/int/string input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.putLong(v.asInstanceOf[Long])
      case IntegerType => buf.putLong(v.asInstanceOf[Int].toLong)
      case StringType => buf.putString(v.asInstanceOf[UTF8String].toString)
      case _ => ()
    }
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def eval(buf: BloomFilter): Any = BloomFilterAgg.write(buf)
  override def serialize(buf: BloomFilter): Array[Byte] = BloomFilterAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilterAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(bf, v)`: true when v MIGHT be in the set the
  * filter summarizes, false only when it definitely is not. Null bloom
  * (a group that never aggregated — e.g. a zero-row file's stats row)
  * yields null, which filters drop — the no-data set matches nothing.
  * Probes must use the type the filter was built on (long-keyed
  * filters hash the long's bytes, string-keyed the UTF-8 bytes — the
  * two never collide by design of the underlying sketch). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary filter, bigint/int/string " +
          s"value), got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(bf: Any, v: Any): Any = {
    val f = BloomFilterAgg.read(bf.asInstanceOf[Array[Byte]])
    right.dataType match {
      case LongType => f.mightContainLong(v.asInstanceOf[Long])
      case IntegerType => f.mightContainLong(v.asInstanceOf[Int].toLong)
      case StringType =>
        f.mightContainString(v.asInstanceOf[UTF8String].toString)
      case _ => false
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
