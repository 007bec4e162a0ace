package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel conversion — the product-analytics "did the user
  * view, then click, then purchase?" question, computed with the
  * strict-sequence semantic: stage i's timestamp is the EARLIEST
  * event of stage i's type STRICTLY AFTER the user's stage i−1
  * timestamp (stage 1 is the user's earliest stage-1 event). A user
  * who clicks before ever viewing has not "clicked" in funnel order.
  *
  * Scale shape: NO per-user event collection (a hot user with millions
  * of events costs nothing extra) — each stage is one filtered
  * map-side-combined min-aggregate keyed on user, joined to the
  * previous stage's (user, ts) table, which SHRINKS monotonically
  * down the funnel. k stages = k narrow shuffles of (user, ts) pairs;
  * the event payload is never shuffled.
  */
object Funnel {

  /** Per-user funnel timestamps and reached depth.
    *
    * @param steps event-type values in funnel order (≥ 1)
    * @return (user, t_<step1>, …, t_<stepK>, depth) — one row per
    *         distinct user in `df` (depth 0 = never entered the
    *         funnel), timestamps null from the first unreached stage.
    */
  def conversion(df: DataFrame, user: Column, ts: Column, step: Column,
                 steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct == steps, s"funnel steps must be distinct, got $steps")
    val ev = df.select(user.as("user_id"), ts.as("ts"), step.as("step"))
    val users = ev.select(col("user_id")).distinct()

    val stageCols = steps.map(s => s"t_$s")
    val first = ev.filter(col("step") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as(stageCols.head))
    val stages = steps.zip(stageCols).tail
      .foldLeft(List(first)) { case (acc, (s, tcol)) =>
        val prevCol = acc.head.columns.last
        val prev = acc.head.select(col("user_id"), col(prevCol))
        ev.filter(col("step") === s)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("ts")).as(tcol)) :: acc
      }
      .reverse

    val joined = stages.foldLeft(users)((u, st) => u.join(st, Seq("user_id"), "left"))
    joined.withColumn("depth",
      stageCols.map(c => col(c).isNotNull.cast("long")).reduce(_ + _))
  }
}
