package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.Dataset

/** The one Spark-internal access this engine needs: inside a V1
  * streaming [[org.apache.spark.sql.execution.streaming.Sink]]'s
  * `addBatch`, the handed DataFrame is bound to the micro-batch's
  * IncrementalExecution and refuses batch actions ("queries with
  * streaming sources must be executed with writeStream"). The
  * supported V1-sink pattern (what Delta's own sink does) is to
  * re-wrap THAT execution's RDD as a plain batch frame —
  * `internalCreateDataFrame` is `private[sql]`, hence this shim lives
  * in the `org.apache.spark.sql` namespace. `toRdd` executes the
  * micro-batch plan exactly once; the wrapper adds no extra pass.
  */
object BatchDf {
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
