package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters,
  * needed to register Column-composition functions in the SQL function
  * registry. Lives in an `org.apache.spark.sql` subpackage for access —
  * the standard pattern for Spark extension libraries; the methods are
  * thin aliases, so a Spark upgrade that changes the internal API breaks
  * compilation here and nowhere else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly converts the Column's node tree to a concrete Catalyst
    * expression. (`ExpressionUtils.expression` would wrap it in a lazy
    * `ColumnNodeExpression`, which the analyzer never unwraps when the
    * tree comes from a function-registry builder instead of a Dataset
    * operation — it then reaches codegen unresolved and throws.) */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
