package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a constant string set, as a
  * native codegen'd expression — the membership-counting primitive
  * behind stopword ratios and language-marker scoring.
  *
  * Replaces `size(filter(tokens, t -> array_contains(set, t)))`: Spark
  * evaluates higher-order-function lambdas INTERPRETED (README pitfall
  * #3), allocating a filtered array per row just to take its size. Here
  * the constant side becomes one hashed set per operator instance
  * (driver-built, serialized with the expression, O(1) probes), the hot
  * loop is a countIn over the unsafe array, and the expression stays
  * inside whole-stage codegen.
  *
  * The set argument must be a foldable array<string> (a literal), which
  * also makes the expression SQL-registrable:
  * `tokens_in_set(arr, array('the','a'))` via [[graft.GraftExtensions]].
  */
case class CountTokensInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckFailure("tokens_in_set requires a LITERAL set argument")
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"tokens_in_set requires (array<string>, array<string>), got (${l.catalogString}, ${r.catalogString})")
  }

  /** Constant membership set, built once per expression instance from
    * the foldable argument (cloned out of any unsafe backing buffer). */
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        val e = arr.getUTF8String(i)
        if (e != null) s.add(e.clone())
        i += 1
      }
    }
    s
  }

  override def nullSafeEval(tokens: Any, setArr: Any): Any =
    CountTokensInSet.countIn(tokens.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (l, _) =>
      s"${ev.value} = graft.functions.CountTokensInSet.countIn($l, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountTokensInSet =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "tokens_in_set"
}

object CountTokensInSet {

  /** Hot loop: membership count over the (possibly unsafe) array. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column API: count of `tokens` elements that are in `set`. */
  def tokens_in_set(tokens: Column, set: Seq[String]): Column = {
    import org.apache.spark.sql.GraftExprBridge.{toColumn, toExpression}
    val setLit = org.apache.spark.sql.functions.array(
      set.map(org.apache.spark.sql.functions.lit): _*)
    toColumn(CountTokensInSet(toExpression(tokens), toExpression(setLit)))
  }
}
