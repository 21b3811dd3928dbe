package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a V1 streaming `Source` needs: the
  * micro-batch engine asserts that `getBatch`'s DataFrame has
  * `isStreaming = true`, and the only way to mint one is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * exactly how Spark's own `FileStreamSource`/`MemoryStream` build
  * their batches. This shim lives in the `org.apache.spark.sql`
  * package solely to re-export that constructor to
  * [[graft.io.TxCdfSource]]; nothing else from the internals is
  * touched. */
object GraftStreamingShim {
  def streamingDataFrame(spark: classic.SparkSession, schema: StructType,
      rdd: RDD[InternalRow]): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Third door: mint the V1 `StreamingRelation` logical node for a
    * registered stream source format — how the analyzer rewrite
    * ([[graft.plans.TxCatalogReads]]) turns `spark.readStream.table`
    * over a tx-catalog table into the [[graft.io.TxAppendSource]]
    * stream. `DataSource` and `StreamingRelation` are `private[sql]`
    * constructors; this is the same node `DataStreamReader.load`
    * builds for `format(...)` streams. */
  def v1StreamingRelation(spark: classic.SparkSession, format: String,
      options: Map[String, String]):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    execution.streaming.runtime.StreamingRelation(
      execution.datasources.DataSource(
        spark, className = format, options = options))

  /** The inverse door, for the SINK side: the DataFrame handed to a V1
    * `Sink.addBatch` wraps the micro-batch's incremental execution and
    * refuses batch writers; re-wrapping its planned RDD as a plain
    * batch DataFrame is how custom sinks hand the data to ordinary
    * write paths. */
  def batchDataFrame(spark: classic.SparkSession, schema: StructType,
      rdd: RDD[InternalRow]): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Re-expose a streaming-flagged `getBatch` result as a plain batch
    * DataFrame (test harnesses driving the Source API directly): the
    * V1 batch wraps an already-planned RDD in a streaming `LogicalRDD`,
    * whose RDD can be re-wrapped without executing the streaming plan. */
  def unwrapStreamingBatch(spark: classic.SparkSession,
      df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: execution.LogicalRDD =>
        batchDataFrame(spark, l.schema, l.rdd)
      case other => throw new IllegalArgumentException(
        s"not a Source.getBatch LogicalRDD plan: ${other.getClass}")
    }
}

/** The two `private[sql]` doors the SQL-DML command conversion needs
  * (graft.plans.TxCatalogReads lowering UPDATE/MERGE text onto the
  * TxTable writers, the Delta-analysis shape): Expression → Column for
  * re-binding resolved predicates/assignments by name, and
  * LogicalPlan → DataFrame for executing a command's source plan. */
object GraftSqlShim {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def dataFrame(spark: classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
