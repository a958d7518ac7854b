package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * Column API: Spark 4 moved Expression↔Column conversion behind
  * `private[sql] classic.ExpressionUtils`, so the one place that needs
  * it (mounting a custom codegen'd expression as a Column) goes through
  * this sql-subpackage shim instead of reflection.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
