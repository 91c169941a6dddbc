package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Expression ⇄ Column converters — the
  * supported extension seam for libraries shipping custom codegen'd
  * Catalyst expressions (same access pattern used by public Spark
  * connector/extension libraries). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
