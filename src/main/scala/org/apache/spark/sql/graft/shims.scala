package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-access shim: Spark 4's classic Column↔Expression conversions
  * are `private[sql]`; custom Catalyst expressions (SURVEY §7.4) need
  * this one doorway. No Spark internals are modified.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
