package graft.catalyst

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Whole MinHash signature as ONE scalar expression over a shingle
  * array: for perm i < numPerms, sig_i = min over shingles of
  * (a_i·hLo + b_i·hHi + c_i) mod (2^31−1), h = first 60 bits of md5.
  *
  * A MinHash signature is a per-document SCALAR, not an aggregate — the
  * explode + numPerms·min-aggregate formulation pays a full shuffle of
  * every (doc, shingle) posting just to group what was already grouped.
  * This expression computes the signature in one pass per row: the
  * signature stage becomes a narrow projection with NO shuffle.
  *
  * Hash semantics are bit-identical to `TextFns.hash60`/`minhashPerm`
  * (md5 hex prefix read as integer = first 8 digest bytes big-endian
  * >>> 4), so the DuckDB oracle needs no change.
  */
case class MinHashSignature(child: Expression, numPerms: Int) extends UnaryExpression {
  require(numPerms >= 1, s"numPerms must be >= 1, got $numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $out =
         |  graft.catalyst.MinHashSignature.compute($c, $numPerms);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  def apply(shingles: Column, numPerms: Int): Column =
    ExpressionShims.column(
      MinHashSignature(ExpressionShims.expression(shingles), numPerms))

  /** null for empty sets (no shingles → no signature). */
  def compute(shingles: ArrayData, numPerms: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val h = hash60(md, shingles.getUTF8String(i).toString)
      val lo = h & 1073741823L
      val hi = (h >> 30) & 1073741823L
      var p = 0
      while (p < numPerms) {
        val v = (TextFns.permA(p) * lo + TextFns.permB(p) * hi + TextFns.permC(p)) % TextFns.PermMod
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** First 60 bits of md5 = first 8 digest bytes big-endian >>> 4 —
    * identical to `conv(substring(md5(s),1,15),16,10)`. */
  private def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
