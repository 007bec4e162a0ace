package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._

/** Cosine similarity over two numeric array columns as ONE codegen'd
  * expression (tight primitive loop, double accumulation).
  *
  * The composed form `dot/(norm·norm)` via `zip_with`/`aggregate` is
  * three higher-order folds, and higher-order functions are
  * CodegenFallback — evaluated interpretively per row. Harmless in a
  * projection over thousands of rows; catastrophic when the optimizer
  * pushes the similarity predicate into a nested-loop join condition
  * (millions of interpreted evals on the join's hot path — observed
  * ~200µs/pair vs ~0.1µs here).
  *
  * Float inputs are widened element-wise to double, matching
  * `CAST(x AS DOUBLE[])` semantics so DuckDB's
  * `list_cosine_similarity` oracle agrees bit-for-bit.
  * Null array / element or length mismatch → null.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val box = ctx.freshName("cos")
      s"""
         |java.lang.Double $box = graft.catalyst.CosineSimilarity.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($box == null) { ${ev.isNull} = true; } else { ${ev.value} = $box.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {

  def apply(a: Column, b: Column): Column =
    ExpressionShims.column(
      CosineSimilarity(ExpressionShims.expression(a), ExpressionShims.expression(b)))

  /** Sequential double accumulation, identical order to the previous
    * aggregate-fold formulation (and to DuckDB's loop). Returns null
    * (boxed) on length mismatch or null elements.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
