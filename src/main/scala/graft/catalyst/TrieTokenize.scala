package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{shims => ExpressionShims}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization against a TRIE — the
  * production-vocab path behind the `Tokenizer` seam. The HOF form
  * (`Tokenizer.LongestMatch`) scans the whole piece list per character
  * position (O(|word|·|vocab|) — fine at spec-sized vocabs, hopeless at
  * 32k pieces); this expression walks a prefix trie built ONCE per
  * plan, so each position costs O(longest piece) regardless of
  * vocabulary size. The trie ships to executors through the codegen
  * reference array (`ctx.addReferenceObj`), the standard broadcast
  * shape for model-like expression state, and the generated code stays
  * inside whole-stage codegen.
  *
  * Semantics are EXACTLY `Tokenizer.LongestMatch` (spec-pinned
  * equivalence): whitespace pre-split keeping empties, per word the
  * longest vocabulary piece prefixing the remaining chars (single-char
  * fallback keeps segmentation total and reassembly exact), words
  * longer than `maxWordChars` pass through as one piece, empty words
  * contribute no pieces, null in → null out.
  */
case class TrieTokenize(child: Expression, vocab: Seq[String], maxWordChars: Int)
    extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
  require(maxWordChars >= 1, s"maxWordChars must be >= 1, got $maxWordChars")

  @transient private lazy val trie: TrieTokenize.Trie = TrieTokenize.build(vocab)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"trie_tokenize needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TrieTokenize.compute(input.asInstanceOf[UTF8String], trie, maxWordChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("trie", trie, classOf[TrieTokenize.Trie].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.TrieTokenize.compute($c, $trieRef, $maxWordChars)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrieTokenize =
    copy(child = newChild)

  override def prettyName: String = "trie_tokenize"
}

object TrieTokenize {

  /** Column API entry. */
  def apply(text: Column, vocab: Seq[String], maxWordChars: Int = 100): Column =
    ExpressionShims.column(
      TrieTokenize(ExpressionShims.expression(text), vocab, maxWordChars))

  /** Prefix-trie node: terminal marks a vocabulary piece ending here.
    * Keys are Unicode CODE POINTS, not UTF-16 chars — the HOF form it is
    * spec-pinned against (`Tokenizer.LongestMatch`) counts in Spark's
    * code-point semantics, and a char-keyed walk would split surrogate
    * pairs on non-BMP text (emitting invalid half-surrogate pieces).
    * HashMap children keep construction simple and lookups O(1); the
    * trie is built once per plan and read-only afterwards. */
  final class Node extends Serializable {
    var terminal: Boolean = false
    val children = new java.util.HashMap[Integer, Node]()
  }

  final class Trie(val root: Node) extends Serializable

  def build(vocab: Seq[String]): Trie = {
    val root = new Node
    vocab.foreach { piece =>
      var node = root
      var i = 0
      while (i < piece.length) {
        val cp = piece.codePointAt(i)
        var next = node.children.get(cp)
        if (next == null) { next = new Node; node.children.put(cp, next) }
        node = next
        i += Character.charCount(cp)
      }
      node.terminal = true
    }
    new Trie(root)
  }

  /** One pass per word: walk the trie from each position, remember the
    * deepest terminal, emit that piece (or one code point), advance.
    * Positions are char indices (for cheap substring) but every step
    * advances by one CODE POINT, so surrogate pairs never split and
    * maxWordChars counts code points exactly like the HOF form. */
  def compute(text: UTF8String, trie: Trie, maxWordChars: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.codePointCount(0, w.length) > maxWordChars) out.add(UTF8String.fromString(w))
      else {
        var pos = 0
        while (pos < w.length) {
          var node = trie.root
          var best = 0 // char length of the deepest terminal match from pos
          var i = pos
          var walking = true
          while (walking && i < w.length) {
            val cp = w.codePointAt(i)
            val next = node.children.get(cp)
            if (next == null) walking = false
            else {
              node = next
              i += Character.charCount(cp)
              if (node.terminal) best = i - pos
            }
          }
          val len = if (best > 0) best else Character.charCount(w.codePointAt(pos))
          out.add(UTF8String.fromString(w.substring(pos, pos + len)))
          pos += len
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
