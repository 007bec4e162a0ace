package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct w-gram word shingles as ONE single-pass Catalyst expression.
  *
  * The composed built-in form (`array_distinct(transform(sequence(...),
  * i -> concat_ws(element_at(split(text)...))))`) re-tokenizes the
  * document for every lambda element because subexpression elimination
  * does not reach inside higher-order functions — and whenever the
  * optimizer inlines the projection into a Filter predicate or a
  * Generate input, the cost multiplies again (measured ~300× on the
  * documents table). This expression tokenizes once per evaluation, so
  * it stays cheap wherever CollapseProject/pushdown decides to inline it.
  *
  * Semantics match `TextFns.shinglesOf`: split on single spaces keeping
  * empties, shingles joined with one space, first-occurrence distinct
  * order, `[]` when fewer than `width` tokens, null in → null out.
  */
case class WordShingles(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.WordShingles.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Column API entry. */
  def apply(text: Column, width: Int): Column =
    ExpressionShims.column(WordShingles(ExpressionShims.expression(text), width))

  /** Single pass: tokenize, slide, dedup (first occurrence), emit. */
  def compute(text: UTF8String, width: Int): GenericArrayData = {
    val parts = text.toString.split(" ", -1)
    val n = parts.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
