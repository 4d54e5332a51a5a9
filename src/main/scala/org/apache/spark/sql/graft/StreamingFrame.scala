package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** The one bridge a DataFrame-producing V1 streaming source needs:
  * re-wrap a batch-computed frame with `isStreaming = true`, because
  * `MicroBatchExecution` asserts the frame a `Source.getBatch` returns
  * carries the flag. `internalCreateDataFrame` is `private[sql]`, so
  * this single accessor lives under the `org.apache.spark.sql` package
  * tree — the same technique Delta Lake's streaming source uses (its
  * whole source sits under `org.apache.spark.sql.delta` for exactly
  * this call). The only other `private[sql]` reach is [[DmlBridge]]
  * (the SQL MERGE/UPDATE rewrite's Expression↔Column bridge); keep the
  * set that small.
  *
  * The wrap is lazy: `queryExecution.toRdd` is a plan handle, computed
  * only when the micro-batch executes.
  */
object StreamingFrame {
  def apply(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse rebind a V1 streaming SINK needs: the frame
    * `Sink.addBatch` receives is bound to the micro-batch's incremental
    * execution, so batch verbs (`df.write`) refuse it; re-wrapping its
    * physical rows as a plain batch frame is exactly what Spark's own
    * `ForeachBatchSink` does before handing user code the frame.
    */
  def batchOf(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
