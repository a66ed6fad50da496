package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark's `private[sql]` Column ↔ Expression
  * bridge (Spark 4 removed the public `new Column(expr)` constructor
  * when Column moved to sql-api). Lives in an `org.apache.spark.sql`
  * subpackage solely to satisfy the access modifier — standard interop
  * practice for libraries providing custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
