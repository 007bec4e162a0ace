package graft.catalyst

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch point query as a codegen'd Catalyst expression:
  * `estimateCount(key)` over a sketch built once (driver-side via
  * `DataFrameStatFunctions.countMinSketch` — itself one distributed
  * pass) and shipped to executors inside the expression — the
  * frequency analogue of [[BloomMightContain]]: answer "how often did
  * this key occur in the 100 TB corpus?" from kilobytes of state,
  * without a per-key counts table anywhere.
  *
  * Same transport discipline as the bloom probe: bytes travel as an
  * immutable `ArraySeq` (array equality would defeat plan
  * canonicalization), deserialized once per JVM into a
  * `@transient lazy val`, generated code calls `estimateCount` on the
  * shared reference — no per-row deserialization.
  *
  * CMS guarantees (Cormode & Muthukrishnan 2005): the estimate NEVER
  * undercounts, and overcounts by more than ε·N with probability
  * < 1−δ. Null in → null out.
  */
case class CmsEstimate(child: Expression,
                       cmsBytes: scala.collection.immutable.ArraySeq[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs a long key input, got ${child.dataType.catalogString}")

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes.toArray))

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {

  /** Column API entry: `key` must be the SAME long key family the
    * sketch was populated with. */
  def estimate(key: Column, cms: CountMinSketch): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    ExpressionShims.column(
      CmsEstimate(ExpressionShims.expression(key),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bos.toByteArray)))
  }
}
