package org.apache.spark.sql.graftshims

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column <-> Expression converters, which are
  * private[sql] in Spark 4. Lives under org.apache.spark.sql.* for
  * access; keep this the only file that does.
  */
object SparkShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
