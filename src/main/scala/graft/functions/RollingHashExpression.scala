package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin-Karp) of a string column — a native
  * Catalyst `Expression` with whole-stage codegen, the preferred shape
  * for a scalar function Spark lacks (faster than any UDF: no
  * serialization, stays inside the generated loop).
  *
  * hash = sum(byte_i * B^(n-1-i)) mod P with B=257, P=2^61-1, computed
  * over UTF-8 bytes. Used for document fingerprinting / content-defined
  * chunking in the dedup pipeline.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val P: Long = (1L << 61) - 1 // Mersenne prime 2^61-1
  final val B: Long = 257L

  /** mulmod/addmod over the Mersenne prime via 128-bit arithmetic. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = addMod(mulMod(h, B), (bytes(i) & 0xffL))
      i += 1
    }
    h
  }

  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (x mod 2^61) + (x >> 61)
    val part = (lo & P) + ((lo >>> 61) | (hi << 3))
    val r = (part & P) + (part >>> 61)
    if (r >= P) r - P else r
  }

  private def addMod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= P) s - P else s
  }

  /** Column API: rolling_hash(text). */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.toColumn(
      RollingHash(org.apache.spark.sql.GraftExprBridge.toExpression(c)))
}
