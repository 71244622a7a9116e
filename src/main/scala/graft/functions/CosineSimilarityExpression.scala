package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two vector columns (`array<float>` or
  * `array<double>`) — a native Catalyst `Expression` with whole-stage
  * codegen: no UDF serialization boundary, the dot product runs as one
  * tight loop inside the generated stage. The fold is SEQUENTIAL in
  * double (index order), the same order as DuckDB's list_dot_product
  * and this library's mapPartitions scorers, so results are bit-stable
  * across all three surfaces.
  *
  * Degenerate inputs (length mismatch, zero-norm side) return NaN —
  * NaN compares false against any threshold, so such pairs simply never
  * match a filter (the same deliberate policy as the all-pairs scan;
  * see SimilarityQueries.embedNearDup).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def elemIsFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cos(
      a.asInstanceOf[ArrayData], elemIsFloat(left.dataType),
      b.asInstanceOf[ArrayData], elemIsFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = elemIsFloat(left.dataType)
    val rf = elemIsFloat(right.dataType)
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.functions.CosineSimilarity.cos($c1, $lf, $c2, $rf)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {

  /** Sequential-order cosine over ArrayData; NaN on length mismatch or
    * zero norm (division by zero yields NaN naturally). */
  def cos(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column API: cosine_similarity(a, b). */
  def cosine_similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.toColumn(
      CosineSimilarity(
        org.apache.spark.sql.GraftExprBridge.toExpression(a),
        org.apache.spark.sql.GraftExprBridge.toExpression(b)))
}
