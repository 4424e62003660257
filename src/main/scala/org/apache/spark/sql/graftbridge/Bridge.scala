package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ⇄ Expression
  * converters (Spark 4 moved Column off Expression onto ColumnNode; the
  * supported conversion helpers live in `org.apache.spark.sql.classic`,
  * package-private). This is the standard extension-library technique for
  * shipping custom codegen Expressions without a SparkSessionExtensions
  * hook — construction is pure, no session registration required. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
