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

  /** TYPED check for an RDD-backed logical leaf (`LogicalRDD` — a
    * `localCheckpoint`ed frame, `createDataFrame` over an RDD, emptyRDD
    * stores; `ExternalRDD` — the typed Dataset form before analysis).
    * Both classes are `private[sql]`, hence bridged here rather than
    * string-matched on a class name a Spark upgrade could silently
    * rename (r13 verdict hygiene #2): a rename now fails COMPILATION
    * instead of re-opening the r12 "sentinel stats read as huge"
    * regression family. */
  def isRddLeaf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] ||
      plan.isInstanceOf[org.apache.spark.sql.execution.ExternalRDD[_]]
}
