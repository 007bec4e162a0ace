package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._

/** Hilbert curve index xy→d of two clamped integer coordinates as ONE
  * codegen'd expression (tight primitive loop over bit planes).
  *
  * Why an Expression and not composed columns: the published iterative
  * algorithm threads (x, y, d) state through `bits` reflection/swap
  * steps, and each step's outputs reference the previous step's x AND
  * y several times — unrolled into column expressions the tree
  * TRIPLES per step (≈3^bits nodes; bits=8 hangs analysis before a
  * single row is processed — measured). A loop in generated Java is
  * ~30 instructions per row. This is the same justification ladder as
  * `CosineSimilarity` (compose → blows up → native expression).
  *
  * Algorithm: the standard xy2d iteration (Hamilton's form, as
  * published on the Hilbert-curve literature/Wikipedia): for each bit
  * plane s from high to low, `d += s²·((3·rx) xor ry)`, then the
  * (rx, ry) case reflects (`s−1−v`) and swaps the frame. Inputs are
  * clamped to [0, 2^bits) like `Layout.zOrderValue`; nulls propagate.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private def ok(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs integral inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(asLong(a), asLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.catalyst.HilbertIndex.compute((long) $a, (long) $b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {

  def apply(x: Column, y: Column, bits: Int): Column =
    ExpressionShims.column(
      HilbertIndex(ExpressionShims.expression(x), ExpressionShims.expression(y), bits))

  /** The scalar xy2d loop — also the reference both the column API and
    * the DuckDB oracle CTE chain replay. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = math.min(math.max(x0, 0L), mask)
    var y = math.min(math.max(y0, 0L), mask)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate: reflect then swap when ry == 0
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
