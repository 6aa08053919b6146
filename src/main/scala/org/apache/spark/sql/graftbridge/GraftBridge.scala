package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's sql-private Column ⇄ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 wraps
  * Columns around ColumnNodes and gates the Expression constructors
  * `private[sql]`; a subpackage of `org.apache.spark.sql` is the
  * supported-by-construction way for an extension library to build a
  * Column from a custom Catalyst Expression without registering it in a
  * session's FunctionRegistry. Only these two calls cross the boundary.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
