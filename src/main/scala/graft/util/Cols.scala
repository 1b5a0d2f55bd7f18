package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Spark-4 bridge between the public Column API and Catalyst expressions
  * (Column no longer exposes `.expr` / `new Column(expr)`). */
object Cols {
  def column(e: Expression): Column = Bridge.column(e)
  def expression(c: Column): Expression = Bridge.expression(c)
}
