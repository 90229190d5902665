package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * libraries adding native Catalyst expressions host this one-liner
  * inside the `org.apache.spark.sql` package — the established pattern
  * for Column-API entry points to custom expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager node->Expression conversion. `ExpressionUtils.expression`
    * wraps the column in a LAZY `ColumnNodeExpression` that only the
    * DataFrame API's own analysis unwraps; an expression returned from a
    * registered SQL function builder must instead be a real Catalyst
    * tree (UnresolvedFunction leaves and all) for the analyzer to
    * resolve it — the eager converter produces exactly that. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
