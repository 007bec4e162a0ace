package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k through the typed `Aggregator[IN, BUF, OUT]`
  * extension surface (the engine's third extension tier next to
  * codegen `Expression`s and `transformWithState` processors; SURVEY
  * §2.2 names it, this is the component that exercises it).
  *
  * WHY an Aggregator and not the `row_number()` window: a window
  * top-k SHUFFLES EVERY ROW of every group to sort it; this
  * aggregator's buffer is a BOUNDED list that participates in partial
  * (map-side) aggregation, so each task forwards at most ~2k entries
  * per group — bytes over the wire scale with k·partitions·groups,
  * not with group sizes. At 100 TB that is the difference between
  * shuffling the corpus and shuffling kilobytes. (q184's salted
  * two-level top-k is the untyped twin; this one pins the TYPED
  * surface and its merge law.)
  *
  * Determinism: entries order by (value DESC, id ASC) — a total order,
  * so reduce/merge/finish are associative-commutative on sets and the
  * result is partitioning-invariant; ties cannot reorder across
  * engines.
  */
object TopK {

  case class Entry(v: Long, id: Long)

  class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k >= 1, s"k must be >= 1, got $k")
    private def better(a: Entry, b: Entry): Boolean =
      a.v > b.v || (a.v == b.v && a.id < b.id)
    private def trim(l: List[Entry]): List[Entry] = l.sortWith(better).take(k)
    override def zero: List[Entry] = Nil
    // amortized: exact trimming deferred until the buffer doubles, so
    // per-row cost stays O(1) amortized while the buffer stays ≤ 2k
    override def reduce(b: List[Entry], e: Entry): List[Entry] = {
      val l = e :: b
      if (l.lengthCompare(2 * k) > 0) trim(l) else l
    }
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] = trim(a ++ b)
    override def finish(r: List[Entry]): Seq[Entry] = trim(r)
    override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  /** Untyped door: top-k rows per group as (group…, rnk, id, v). */
  def perGroup(df: DataFrame, groups: Seq[Column], value: Column, id: Column,
               k: Int): DataFrame = {
    val tk = udaf(new TopKAgg(k))
    val gcols = groups.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val gnames = groups.indices.map(i => col(s"g$i"))
    df.select(gcols :+ value.as("v") :+ id.as("id"): _*)
      .groupBy(gnames: _*)
      .agg(tk(col("v"), col("id")).as("top"))
      .select(gnames :+ posexplode(col("top")): _*)
      .select(gnames :+ (col("pos") + 1).as("rnk") :+
        col("col.id").as("id") :+ col("col.v").as("v"): _*)
  }
}
