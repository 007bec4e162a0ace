package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Document chunking — context-length preparation for training and
  * retrieval: split each document into fixed-size token windows with a
  * configurable stride (stride < window ⇒ overlapping windows, the
  * retrieval-embedding shape; stride == window ⇒ disjoint blocks).
  *
  * Scale shape: pure per-row codegen — one materialized token-array
  * projection, one bounded explode (≤ 1 + n_tok/stride rows per doc),
  * no shuffle. Filters on doc columns still push down past the explode's
  * parent projection at the scan.
  */
object Chunking {

  /** One row per (doc, window): `doc_id, chunk_idx, start_tok, n_tok,
    * chunk` (the window's text). Windows start at 0, stride, 2·stride, …
    * while the start lies inside the document, so every doc yields at
    * least one chunk and the final window may be shorter than `window`.
    *
    * `tokenizer` is the budget unit (default: whitespace words, the
    * oracle default). Under a subword tokenizer the window/stride count
    * PIECES, and `chunk` is the space-joined piece stream (a training
    * exporter emits token ids; the text form here is the debuggable
    * view).
    */
  def slidingWindows(df: DataFrame, id: Column, text: Column,
                     window: Int, stride: Int,
                     tokenizer: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive, got $window/$stride")
    // null text behaves like "" (one empty token → one empty chunk):
    // an unguarded null would make the sequence() bounds null and the
    // doc silently vanish from the explode — a totality break
    df.select(id.as("doc_id"), tokenizer.tokenize(coalesce(text, lit(""))).as("toks"))
      .select(col("doc_id"), col("toks"),
        // greatest(…, 0): a subword tokenizer yields ZERO pieces for
        // empty text (whitespace yields [""], size 1) — the clamp keeps
        // the one-empty-chunk totality contract instead of handing
        // sequence() an inverted range
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(window), size(col("toks")) - col("start_tok")).cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(window)), " ").as("chunk"))
  }
}
