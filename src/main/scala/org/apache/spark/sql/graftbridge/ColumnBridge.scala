package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression↔Column seam `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives in
  * the `org.apache.spark.sql` namespace solely to re-export the two
  * conversions graft's native expressions need. No Spark internals are
  * modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
