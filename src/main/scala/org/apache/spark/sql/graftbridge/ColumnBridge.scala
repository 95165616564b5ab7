package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a ColumnNode wrapper and gated the Expression bridge
  * as private[sql]; custom Catalyst expressions still need to cross it.
  * This shim lives in the sql package namespace solely to re-export the two
  * conversions — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
