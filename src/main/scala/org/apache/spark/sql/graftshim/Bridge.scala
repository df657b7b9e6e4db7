package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Column ⇄ Expression and LogicalPlan ⇄ DataFrame bridges.
  *
  * Spark 4's Column is Connect-agnostic and no longer exposes its Expression;
  * the classic converters (`ExpressionUtils`, `Dataset.ofRows`) are
  * `private[sql]`. Extension libraries defining custom Catalyst expressions
  * and analyzer rules need exactly these calls, so this shim lives under the
  * `org.apache.spark.sql` namespace to reach them — it contains no Spark
  * code, only forwarding.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Wrap an analyzed/analyzable logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Unload every loaded streaming state-store provider and stop the
    * maintenance task (`StateStore.stop()`, `private[sql]`). Hygiene for a
    * long single-JVM suite running hundreds of short-lived streaming
    * queries: each leaves its providers loaded until the next maintenance
    * tick (60 s default), so providers — and their HDFSBackedStateStore
    * in-memory version maps — accumulate between ticks. The store lazily
    * restarts on the next streaming query; calling this between queries is
    * safe and idle-cheap. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
