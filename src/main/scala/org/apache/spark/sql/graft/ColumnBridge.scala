package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions whose
  * constructor arguments are NOT SQL literals (e.g. [[graft.queries
  * .PqEncode]], which carries driver-side codebook arrays) — such
  * expressions can't go through the function registry, and the
  * Spark 4 `ExpressionUtils` conversions are `private[sql]`, so this
  * one-file subpackage of `org.apache.spark.sql` re-exports the two
  * calls. No Spark internals are copied or overridden. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
