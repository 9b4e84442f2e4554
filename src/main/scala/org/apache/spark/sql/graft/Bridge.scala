package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compatibility shim: Column <-> catalyst Expression conversion is
  * private[sql] in Spark 4 (columnNodeSupport). Third-party expression
  * libraries conventionally expose it through a subpackage of
  * org.apache.spark.sql; this object is the only code in this repo living
  * outside the graft namespace, and only forwards two calls. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
