package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals: converting
  * between the public `Column` and Catalyst `Expression` for our native
  * expressions. Lives under `org.apache.spark.sql` for access scope —
  * the conventional extension-library technique (same jar, no Spark
  * source modified).
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
