package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands assignment behind every
  * "sessions per user" rollup: a new session starts at the first event
  * of a key and whenever the gap since the key's previous event is at
  * least `gap` (the same boundary rule as Spark's streaming
  * `session_window`, whose sessions ABSORB events closer than the gap —
  * q31/q82 are the streaming twins of this operator).
  *
  * Determinism: the intra-key order is `(ts, tie)` — the caller
  * supplies a unique tiebreak column so `lag` is well-defined under
  * equal timestamps on any partitioning.
  *
  * Scale shape: one shuffle on the key + per-partition sort, then two
  * window passes (lag flag, running sum) over the SAME sort — Spark
  * plans them in a single Window exec chain without re-exchanging.
  * Per-key state is one row; hot keys cost sort time, not memory.
  */
object Sessionize {

  /** Tag every event with its 1-based per-key session sequence number.
    * Output = input columns + `session_seq`. */
  def assign(df: DataFrame, key: Column, ts: Column, tie: Column,
             gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val prev = lag(ts, 1).over(w)
    val newSession = when(prev.isNull ||
      ts >= prev + expr(s"INTERVAL $gapSeconds SECOND"), 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per (key, session): start/end timestamps and event count. */
  def stats(df: DataFrame, key: Column, ts: Column, tie: Column,
            gapSeconds: Long): DataFrame =
    assign(df, key, ts, tie, gapSeconds)
      .groupBy(key.as("key"), col("session_seq"))
      .agg(min(ts).as("start_ts"), max(ts).as("end_ts"),
        count(lit(1)).as("n_events"))
}
