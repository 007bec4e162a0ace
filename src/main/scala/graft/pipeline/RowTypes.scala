package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-type derivation for self-describing JSON partitioning — the
  * reference's one non-trivial operator (Common.scala:60-71,
  * RowType.scala:16-33) as pure Catalyst column expressions, so schema
  * extraction runs codegen'd on executors with no UDF.
  *
  * Semantics matrix (reference CommonSpec.scala:29-108):
  *   - bad row (error present)                        → `reading-error`
  *   - invalid JSON / no `schema` field / bad Iglu URI → `unpartitioned`
  *   - `iglu:vendor/name/format/MODEL-rev-add`         → `vendor.name/format-MODEL`
  */
object RowTypes {

  /** Iglu schema-key URI, per the public iglu-core SchemaKey format:
    * `iglu:com.vendor/name/jsonschema/1-0-2` (model ≥ 1, rev/add ≥ 0).
    */
  val IgluUri: String =
    "^iglu:([a-zA-Z0-9-_.]+)/([a-zA-Z0-9-_]+)/([a-zA-Z0-9-_]+)/([1-9][0-9]*)-(0|[1-9][0-9]*)-(0|[1-9][0-9]*)$"

  val UnpartitionedName = "unpartitioned"
  val ReadingErrorName = "reading-error"

  /** The embedded Iglu schema URI, null when the record isn't a JSON
    * object with a string `schema` field. `get_json_object` returns null
    * for malformed JSON, matching the reference's parse-failure fold.
    */
  def schemaUri(value: Column): Column = get_json_object(value, "$.schema")

  def vendor(value: Column): Column = extractPart(value, 1)
  def name(value: Column): Column = extractPart(value, 2)
  def format(value: Column): Column = extractPart(value, 3)
  def model(value: Column): Column = extractPart(value, 4).cast("int")

  private def extractPart(value: Column, group: Int): Column = {
    val uri = schemaUri(value)
    val part = regexp_extract(uri, IgluUri, group)
    when(uri.isNotNull && part =!= "", part)
  }

  /** Partition string `vendor.name/format-model` (RowType.scala:28), with
    * the reference's fallback buckets. `error` marks the record as failed
    * upstream (its Result=Left counterpart).
    */
  def partition(value: Column, error: Column): Column =
    when(error.isNotNull, lit(ReadingErrorName))
      .when(vendor(value).isNotNull,
        concat_ws("", vendor(value), lit("."), name(value), lit("/"), format(value), lit("-"), model(value).cast("string")))
      .otherwise(lit(UnpartitionedName))

  /** Directory-safe form for writer `partitionBy` (one path segment):
    * `vendor.name/format-model` → `vendor.name.format-model`.
    */
  def partitionDir(value: Column, error: Column): Column =
    regexp_replace(partition(value, error), "/", ".")
}
