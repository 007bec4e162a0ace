package graft.catalyst

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._

/** Random-hyperplane (sign) LSH band keys for an embedding column as ONE
  * codegen'd expression: `numBands · rowsPerBand` seeded Gaussian
  * hyperplanes; bit r of band b is `sign(⟨x, h_{b·R+r}⟩) ≥ 0`; the output
  * is one packed long key per band. Two vectors agree on a single bit
  * with probability `1 − θ/π` (θ = their angle) — the SimHash/random-
  * projection family — so banding trades recall against bucket
  * selectivity exactly like MinHash-LSH does for Jaccard.
  *
  * One pass per row, zero shuffle (a narrow projection, like
  * [[MinHashSignature]]): the signature stage of an embedding near-dup
  * join costs `numPlanes · dim` fused multiply-adds per row inside
  * whole-stage codegen. The hyperplanes are derived deterministically
  * from (seed, numPlanes, dim) with one `java.util.Random` Gaussian
  * stream and memoized per JVM, so executors regenerate identical planes
  * with no broadcast.
  */
case class HyperplaneBands(child: Expression, numBands: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression {
  require(numBands >= 1, s"numBands must be >= 1, got $numBands")
  require(rowsPerBand >= 1 && rowsPerBand <= 62,
    s"rowsPerBand must be in [1,62] to pack into a long key, got $rowsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands needs array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], numBands, rowsPerBand, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("bands")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $out =
         |  graft.catalyst.HyperplaneBands.compute($c, $numBands, $rowsPerBand, ${seed}L, $isFloat);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"
}

object HyperplaneBands {

  def apply(embedding: Column, numBands: Int, rowsPerBand: Int, seed: Long): Column =
    ExpressionShims.column(
      HyperplaneBands(ExpressionShims.expression(embedding), numBands, rowsPerBand, seed))

  /** planes(p*dim + i) = i-th component of hyperplane p; memoized per
    * (seed, numPlanes, dim) so every task reuses one flat array. */
  private val planeCache = new ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planes(seed: Long, numPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, numPlanes, dim), { key =>
      val rnd = new java.util.Random(key._1)
      Array.fill(numPlanes * dim)(rnd.nextGaussian())
    })

  /** null for empty / null-element vectors (no signature). */
  def compute(vec: ArrayData, numBands: Int, rowsPerBand: Int, seed: Long,
              isFloat: Boolean): GenericArrayData = {
    val dim = vec.numElements()
    if (dim == 0) return null
    val numPlanes = numBands * rowsPerBand
    val hp = planes(seed, numPlanes, dim)
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val base = (b * rowsPerBand + r) * dim
        var dotp = 0.0
        var i = 0
        while (i < dim) {
          if (vec.isNullAt(i)) return null
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dotp += x * hp(base + i)
          i += 1
        }
        if (dotp >= 0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
}
