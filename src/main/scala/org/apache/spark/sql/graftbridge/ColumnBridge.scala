package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 moved the Column/Expression conversion behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so a
  * library registering native expressions needs a shim inside the sql
  * package tree — the standard pattern for Spark-extension libraries.
  * This is the only file outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
