package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, done
  * with `zip_with`/`aggregate` higher-order functions (codegen'd; no UDF,
  * no driver-side math). All arithmetic in double so results line up
  * with DuckDB's `list_cosine_similarity` to float-rounding levels.
  */
object VectorFns {

  private def asD(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Codegen'd single-pass cosine (see CosineSimilarity for why not the
    * higher-order-function composition). */
  def cosine(a: Column, b: Column): Column = graft.catalyst.CosineSimilarity(a, b)

  /** The composed higher-order-function form, kept for cross-checking
    * the custom expression in tests. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB counterpart used in oracles. */
  def cosineSql(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
}
