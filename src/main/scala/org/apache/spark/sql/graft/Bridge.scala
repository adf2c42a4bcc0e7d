package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 split `Column` into a ColumnNode facade (shared with Spark
  * Connect) and made the catalyst bridges `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). A library shipping
  * custom Catalyst expressions still needs them, so this one-file shim
  * lives under `org.apache.spark.sql` to satisfy the access modifier —
  * the standard technique for Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
