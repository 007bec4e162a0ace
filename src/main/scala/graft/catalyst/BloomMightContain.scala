package graft.catalyst

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd Catalyst expression:
  * `might_contain(hash)` over a sketch built once (driver or
  * distributed via `DataFrameStatFunctions.bloomFilter`) and shipped to
  * executors inside the expression — the runtime row-pruning primitive
  * behind [[graft.operators.Dedup.bloomNewDocs]] (prefilter a huge
  * probe side to the tiny maybe-duplicate fraction before any join).
  *
  * The sketch travels as its serialized bytes (the case-class field, so
  * the expression tree stays serializable) and is deserialized once per
  * JVM into a `@transient lazy val`; generated code references that
  * object directly (`ctx.addReferenceObj`), so the probe is one
  * `mightContainLong` call per row with no per-row deserialization.
  * False positives possible (callers must verify positives), false
  * negatives impossible — a NOT-might-contain row is definitely absent.
  *
  * Input is the 64-bit hash of the probed value (pair it with the SAME
  * hash used to populate the sketch — `xxhash64` here); null in → null
  * out.
  *
  * The bytes travel as an immutable `ArraySeq`, not a raw array: case-
  * class equality on `Array[Byte]` is reference equality, which would
  * make semantically identical probes compare unequal and silently
  * defeat subexpression elimination / plan canonicalization.
  */
case class BloomMightContain(child: Expression,
                             bloomBytes: scala.collection.immutable.ArraySeq[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a long (64-bit hash) input, got ${child.dataType.catalogString}")

  // toArray copies once per JVM at first deserialization — negligible
  // next to shipping the sketch, and avoids unsafeArray's erased type
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes.toArray))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Column API entry: `hash64` must be the same 64-bit hash family the
    * sketch was populated with. */
  def contains(hash64: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionShims.column(
      BloomMightContain(ExpressionShims.expression(hash64),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bos.toByteArray)))
  }
}
