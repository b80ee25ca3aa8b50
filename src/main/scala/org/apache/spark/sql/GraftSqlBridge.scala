package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, SparkSession => CSparkSession}

/** Minimal `private[sql]` bridge: turn a hand-built logical plan into a
  * DataFrame. This is the standard extension-library shim (every Spark
  * connector that injects custom logical operators ships one) — the
  * constructor `Dataset.ofRows` is package-private, and the supported
  * alternative (parser extension + SQL syntax) would be far more
  * machinery for the same plan node.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** The analyzed logical plan of `df` (for building new plan nodes on
    * top of already-resolved children).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataFrame].queryExecution.analyzed

  /** Non-blocking read of an Observation's metrics (`getOrEmpty` is
    * `private[sql]`; the public `get` blocks with no timeout, and a
    * dropped listener event would hang the caller forever): empty
    * until the async listener bus delivers the query's metrics.
    */
  def observedOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty

  /** The planner strategies an extensions object would inject — lets a
    * test assert the `spark.sql.extensions` wiring without building a
    * second SparkSession (the builder reuses the active one).
    */
  def plannerStrategies(e: SparkSessionExtensions,
                        spark: SparkSession): Seq[execution.SparkStrategy] =
    e.buildPlannerStrategies(spark.asInstanceOf[CSparkSession])
}
