package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Column is Connect-agnostic and no longer exposes its Expression;
  * the classic converter (`ExpressionUtils`) is `private[sql]`. Extension
  * libraries defining custom Catalyst expressions need exactly these two
  * calls, so this shim lives under the `org.apache.spark.sql` namespace to
  * reach them — it contains no Spark code, only forwarding.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
