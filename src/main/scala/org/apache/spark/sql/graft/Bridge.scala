package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Column ⇄ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql]` (the Column API is now connect/classic-agnostic), so the
  * library's custom Catalyst expressions hop through this package-located
  * shim — the conventional extension-point pattern.
  */
object Bridge {
  def toColumn(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def toExpression(c: Column): Expression = ColumnConversions.expression(c)

  /** `AbstractDataType` is `private[sql]`; expressions outside the spark
    * package need this alias to declare `inputTypes` for analyzer-side
    * implicit casting.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
