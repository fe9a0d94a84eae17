package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ catalyst Expression converters —
  * the supported extension seam for libraries that ship custom expressions
  * (Spark 4 moved `Column` to a backend-agnostic node tree; classic-backend
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object ColumnOps {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
