package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Lives under org.apache.spark.sql because Spark 4's Column↔Expression
  * bridge (classic.ExpressionUtils) is private[sql]. Standard extension
  * pattern — same reason third-party connectors ship an
  * org.apache.spark.sql.* shim package. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
