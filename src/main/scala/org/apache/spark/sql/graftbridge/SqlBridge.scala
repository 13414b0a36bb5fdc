package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` Spark internals: converting
  * between the public `Column` and Catalyst `Expression` for our native
  * expressions, lifting a custom `LogicalPlan` into a `DataFrame`, and
  * registering extra planner strategies on a live session. Lives under
  * `org.apache.spark.sql` for access scope — the conventional
  * extension-library technique (same jar, no Spark source modified).
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over a custom logical plan (`Dataset.ofRows` is
    * `private[sql]`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Unload every registered streaming state-store provider on this
    * JVM (`StateStore.unloadAll` is `private[sql]`). A terminated
    * streaming query's providers otherwise stay loaded until the 60 s
    * maintenance pass notices they are inactive, and the accumulated
    * set measurably throttles the next stateful query — see
    * [[graft.streaming.StreamingOps]]'s caller-owned-state note. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Idempotently add a planner strategy to a live session (the
    * builder-time route is `SparkSessionExtensions.injectPlannerStrategy`
    * in [[graft.GraftExtensions]]). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
