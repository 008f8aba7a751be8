package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 keeps the Column ↔ Expression bridge (`classic.ExpressionUtils`)
  * `private[sql]`, so extension libraries that define native Catalyst
  * expressions conventionally place one small shim inside the sql
  * package. This is the only file outside the `graft` namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
