package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, Tokenizer}

/** Model-based quality scoring — the learned companion to the heuristic
  * quality gate (TextFns token/repetition/OOV stats): a fastText-shaped
  * LINEAR classifier over hashed token features. Each token hashes into
  * one of `dim` buckets (`hash60(token) % dim` — the same driver-
  * replayable hash family the dedup operators use), the document's
  * feature sum is the sum of its tokens' bucket weights, and the score
  * is `sigmoid(bias + feat_sum / n_tok)`.
  *
  * Weights are FIXED-POINT integers (micros, 1e-6): scoring is then
  * pure integer arithmetic — associative, partitioning-invariant, and
  * exactly replayable by a SQL oracle — where a float sum would depend
  * on aggregation order. The keep/drop GATE is likewise exact:
  * `sigmoid(bias + feat_sum/n) >= p  <=>
  *  bias*n + feat_sum >= logit(p)*n` (n clamped to 1 so an empty doc is
  * scored by its bias alone), so the decision never touches a float.
  * The informational `score` column is a double for human consumption;
  * the gate must not be derived from it.
  *
  * At 100 TB the plan is one narrow projection: the weight table ships
  * as a literal array inside the expression (kilobytes at fastText's
  * typical 2^20 buckets it would move to a broadcast join — same seam),
  * no shuffle, no UDF, whole-stage codegen throughout.
  *
  * Training ([[train]]) is full-batch logistic-regression gradient
  * descent expressed as DataFrame aggregates — per epoch one pass
  * computes every bucket's gradient (an explode + key-partitioned sum,
  * collected at dim-bounded size like k-means' centroid update, which
  * is control flow, not data flow) — and is spec-pinned (the k-means
  * precedent for non-SQL-expressible training); the MODEL it emits is
  * fixed-point and thus oracle-scorable.
  */
object QualityClassifier {

  /** Fixed-point linear model: `weightsMicros(b)` is the weight of hash
    * bucket `b` in millionths; `biasMicros` likewise. */
  final case class Model(weightsMicros: IndexedSeq[Long], biasMicros: Long) {
    require(weightsMicros.nonEmpty, "model needs at least one bucket")
    def dim: Int = weightsMicros.length
  }

  /** Hash bucket of one token — exactly `hash60(tok) % dim` (hash60 is
    * non-negative, so % == pmod and the DuckDB mirror is literal). */
  def bucket(tok: Column, dim: Int): Column =
    (TextFns.hash60(tok) % dim).cast("int")

  /** Score `text` under `model`, appending `n_tok`, `feat_sum` (exact
    * integers), `score` (informational double) and `keep` (exact gate
    * at probability threshold `sigmoid(thresholdMicros/1e6)`).
    */
  def score(df: DataFrame, text: Column, model: Model,
            tokenizer: Tokenizer = Tokenizer.Whitespace,
            thresholdMicros: Long = 0L): DataFrame = {
    val weights = array(model.weightsMicros.map(lit): _*)
    // project the token array to an attribute BEFORE the higher-order
    // lookup: lambda bodies are not subexpression-eliminated
    val n = greatest(col("n_tok"), lit(1L))
    df.withColumn("__qc_toks", tokenizer.tokenize(text))
      .withColumn("n_tok", size(col("__qc_toks")).cast("long"))
      .withColumn("feat_sum", aggregate(
        transform(col("__qc_toks"), t => get(weights, bucket(t, model.dim))),
        lit(0L), (acc, x) => acc + x))
      .withColumn("score",
        lit(1.0) / (lit(1.0) + exp(-(lit(model.biasMicros) + col("feat_sum") / n) / 1e6)))
      .withColumn("keep",
        lit(model.biasMicros) * n + col("feat_sum") >= lit(thresholdMicros) * n)
      .drop("__qc_toks")
  }

  /** Full-batch logistic-regression training (spec-pinned; see object
    * doc). `label` must be 0.0/1.0. Returns a fixed-point [[Model]].
    */
  def train(df: DataFrame, text: Column, label: Column, dim: Int,
            epochs: Int = 10, lr: Double = 1.0,
            tokenizer: Tokenizer = Tokenizer.Whitespace): Model = {
    require(dim >= 1 && epochs >= 1)
    var weights = Array.fill(dim)(0.0)
    var bias = 0.0
    val base = df.select(text.as("__qc_text"), label.cast("double").as("__qc_y"))
      .withColumn("__qc_toks", tokenizer.tokenize(col("__qc_text")))
      .withColumn("__qc_n", greatest(size(col("__qc_toks")).cast("long"), lit(1L)))
      .withColumn("__qc_buckets",
        transform(col("__qc_toks"), t => bucket(t, dim)))
      .select(col("__qc_y"), col("__qc_n"), col("__qc_buckets"))
      .localCheckpoint(false) // tokenized once; every epoch re-reads it
    val total = math.max(1L, base.count())
    (1 to epochs).foreach { _ =>
      val w = array(weights.toIndexedSeq.map(lit): _*)
      val scored = base
        .withColumn("__qc_s", aggregate(
          transform(col("__qc_buckets"), b => get(w, b)),
          lit(0.0), (acc, x) => acc + x))
        .withColumn("__qc_p",
          lit(1.0) / (lit(1.0) + exp(-(lit(bias) + col("__qc_s") / col("__qc_n")))))
        .withColumn("__qc_err", col("__qc_p") - col("__qc_y"))
      // d(loss)/d(w_b) = sum over docs containing bucket b of err/n;
      // d(loss)/d(bias) = sum of err. A sentinel bucket (-1) appended
      // per doc rides the SAME explode + aggregation so each epoch is
      // ONE job, not two passes over the scored frame. The collect is
      // dim-bounded — the centroid-update shape.
      val grads = scored
        .select(col("__qc_err"), col("__qc_n"),
          explode(concat(col("__qc_buckets"), array(lit(-1)))).as("__qc_b"))
        .groupBy(col("__qc_b"))
        .agg(sum(when(col("__qc_b") === -1, col("__qc_err"))
          .otherwise(col("__qc_err") / col("__qc_n"))).as("__qc_g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      weights = weights.zipWithIndex.map { case (wv, b) =>
        wv - lr * grads.getOrElse(b, 0.0) / total
      }
      bias = bias - lr * grads.getOrElse(-1, 0.0) / total
    }
    Model(weights.toIndexedSeq.map(wv => math.round(wv * 1e6)), math.round(bias * 1e6))
  }
}
