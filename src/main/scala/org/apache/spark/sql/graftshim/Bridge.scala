package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> Expression bridge.
  *
  * Spark 4 split Column from Expression (Spark Connect); the converters
  * live in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim sits inside the sql package namespace to
  * re-export exactly the two conversions the engine's custom expression
  * needs — the standard pattern for libraries shipping native Catalyst
  * expressions against classic Spark.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
