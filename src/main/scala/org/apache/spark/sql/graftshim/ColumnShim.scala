package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between user-space Columns and catalyst Expressions.
  *
  * Spark 4 made Column wrap a ColumnNode and hid the Expression
  * conversion behind `private[sql]` ExpressionUtils; a subpackage of
  * org.apache.spark.sql is the supported-by-convention access point for
  * libraries contributing native expressions (the same trick Spark
  * extension libraries use for Dataset factories).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
