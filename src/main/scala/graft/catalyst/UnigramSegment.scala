package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM SERVING segmentation against the trained model's
  * memoized word→pieces table — the inference expression behind
  * `Tokenizer.UnigramLm`. The training-side Viterbi already segmented
  * every vocabulary word ONCE (`Tokenizer.learnUnigramLm`; the
  * vocabulary is Zipf-bounded while the corpus is not), so serving is
  * a hash lookup per word: the table ships to executors through the
  * codegen reference array (`ctx.addReferenceObj`, the
  * [[TrieTokenize]] model-state shape) and each word costs O(1)
  * regardless of vocabulary size — no per-row Viterbi, no broadcast
  * join, stays inside whole-stage codegen.
  *
  * Semantics are EXACTLY the q311 broadcast-join serving contract
  * (spec-pinned equivalence): whitespace pre-split keeping empties;
  * a vocabulary word yields its memoized pieces; a word longer than
  * `maxWordChars` CODE POINTS passes through as one piece (the
  * training cap — the model carries it so the two can't fork); an
  * out-of-vocabulary word within the cap falls back to one piece per
  * code point (totality — reassembly stays exact; under a complete
  * collected vocabulary the branch is unreachable, it exists for the
  * documented `maxVocabWords`-capped table); empty words contribute
  * no pieces; null in → null out.
  */
case class UnigramSegment(child: Expression,
                          wordPieces: Seq[(String, Seq[String])],
                          maxWordChars: Int)
    extends UnaryExpression {
  require(maxWordChars >= 1, s"maxWordChars must be >= 1, got $maxWordChars")

  @transient private lazy val table: UnigramSegment.Table =
    UnigramSegment.build(wordPieces)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_segment needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.compute(input.asInstanceOf[UTF8String], table, maxWordChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("table", table,
      classOf[UnigramSegment.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.UnigramSegment.compute($c, $tableRef, $maxWordChars)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {

  /** Column API entry. */
  def apply(text: Column, wordPieces: Seq[(String, Seq[String])],
            maxWordChars: Int): Column =
    ExpressionShims.column(
      UnigramSegment(ExpressionShims.expression(text), wordPieces, maxWordChars))

  /** The memoized word→pieces lookup, pieces pre-encoded as
    * UTF8String so serving never re-encodes. Built once per plan,
    * read-only afterwards. */
  final class Table(val map: java.util.HashMap[String, Array[UTF8String]])
    extends Serializable

  def build(wordPieces: Seq[(String, Seq[String])]): Table = {
    val m = new java.util.HashMap[String, Array[UTF8String]](
      math.max(16, wordPieces.size * 2))
    wordPieces.foreach { case (w, ps) =>
      m.put(w, ps.iterator.map(UTF8String.fromString).toArray)
    }
    new Table(m)
  }

  def compute(text: UTF8String, table: Table, maxWordChars: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        if (w.codePointCount(0, w.length) > maxWordChars) {
          out.add(UTF8String.fromString(w)) // over-cap pass-through
        } else {
          val hit = table.map.get(w)
          if (hit != null) {
            var i = 0
            while (i < hit.length) { out.add(hit(i)); i += 1 }
          } else {
            // OOV fallback: one piece per CODE POINT (surrogate-safe)
            var i = 0
            while (i < w.length) {
              val n = Character.charCount(w.codePointAt(i))
              out.add(UTF8String.fromString(w.substring(i, i + n)))
              i += n
            }
          }
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
