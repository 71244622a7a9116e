package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column as a native Catalyst
  * `Expression` (codegen'd, no UDF SerDe): tokenize on single spaces
  * (after trim — same result as `split(trim(text), " ")`, empty tokens
  * kept on doubled spaces), emit each run of `n` consecutive tokens
  * space-joined, de-duplicated per document.
  *
  * Replaces a posexplode + window-`lead` + global `distinct()`
  * formulation: that shape costs a shuffle+sort for the window and a
  * second shuffle for the distinct; this one is a per-row scalar —
  * (doc, gram) pairs come out already distinct-per-doc, so the dedup
  * pipelines (n-gram Jaccard, MinHash/LSH) need no gram-table shuffle at
  * all. At 100 TB that removes the two widest shuffles of the pipeline.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordNGrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {

  /** Distinct space-joined n-grams, first-occurrence order. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.trim.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API: word_ngrams(text, n) — distinct per-row n-grams. */
  def word_ngrams(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftExprBridge.toColumn(
      WordNGrams(org.apache.spark.sql.GraftExprBridge.toExpression(c), n))
}
