package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregates designed to hash-match a DuckDB oracle bit-for-bit — and,
  * more importantly, to be deterministic at cluster scale.
  *
  * Summing IEEE doubles is order-dependent; on a 1000-executor cluster the
  * partial-aggregation tree shape (and hence the result's low bits) varies
  * run to run. Casting to decimal before the sum makes the aggregation
  * exact and associative — deterministic under any partitioning — and the
  * final cast back to double is correctly rounded in both Spark and DuckDB.
  * The decimal sum still benefits from partial (map-side) aggregation.
  */
object ExactAgg {
  /** Exact sum of a money/quantity-like double with `scale` decimal digits.
    * DECIMAL(38,·) so large-magnitude inputs don't silently null out under
    * non-ANSI cast (values up to 10^36 stay exact).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Exact sum for derived expressions (e.g. price*(1-discount)) that need
    * more fractional digits before the cast rounds them.
    */
  def dsumWide(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then one IEEE division. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType) / count(c)
}
