package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters —
  * the standard pattern for libraries that add native Catalyst expressions
  * (Spark 4 removed the public `Column(expr)` constructor in favor of the
  * connect-compatible ColumnNode API). This is the only place the project
  * reaches into Spark's package-private surface. */
object shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom logical plan (Dataset.ofRows is
    * package-private in Spark 4). */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until the shared listener bus has delivered all queued events —
    * lets tests observe QueryExecutionListener callbacks deterministically
    * (they are delivered asynchronously). */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unset the context checkpoint directory (`setCheckpointDir` has no
    * inverse in the public API) — lets a spec exercise the
    * reliable-checkpoint branch of Tables.materialize and restore the
    * shared session afterwards so suite order stays irrelevant. */
  def clearCheckpointDir(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.checkpointDir = None
}
