package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bad-row (dead-letter) structure, shape of the public snowplow-badrows
  * `GenericError` the reference emits (ISerializer.scala:55-63):
  *
  * {{{
  * { "processor": {"artifact": ..., "version": ...},
  *   "failure":   {"timestamp": ..., "errors": [...]},
  *   "payload":   "<base64 of the raw record>" }
  * }}}
  *
  * Built with `when/otherwise` + `struct` columns — no UDF, codegen'd.
  */
object BadRows {

  val Artifact = "graft"
  val Version = "0.1.0"

  /** The error struct for a failed record. `errors` is an array of
    * human-readable messages; `timestamp` defaults to the batch write
    * time (non-deterministic by nature — tests/oracles should compare
    * `payload`/`errors`, not `timestamp`).
    */
  def genericError(payload: Column, errors: Column, timestamp: Column): Column =
    struct(
      struct(lit(Artifact).as("artifact"), lit(Version).as("version")).as("processor"),
      struct(timestamp.as("timestamp"), errors.as("errors")).as("failure"),
      // Spark's base64 can emit MIME-chunked output (76-char CRLF lines,
      // legacy conf-dependent); the reference's commons-codec encoding is
      // unchunked (ISerializer.scala:60-62) — strip any chunking.
      regexp_replace(base64(payload.cast("binary")), "\r\n", "").as("payload"))

  def genericError(payload: Column, errors: Column): Column =
    genericError(payload, errors, current_timestamp())

  /** Serialized dead-letter line (reference KinesisS3Emitter.scala:104
    * `record.asJson.noSpaces`). */
  def asJson(badRow: Column): Column = to_json(badRow)
}
