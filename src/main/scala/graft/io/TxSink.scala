package graft.io

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** First-class streaming SINK for [[TxTable]] — the `writeStream` face
  * of the exactly-once txn-watermark recipe that [[TxTable.appendBatch]]
  * implements (previously reachable only through a hand-rolled
  * `foreachBatch`):
  *
  * {{{
  *   df.writeStream.format("tx")
  *     .option("root", "/data/tx/orders")
  *     .option("appId", "ingest-orders")   // one writer per appId
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * Every micro-batch commits its files ATOMICALLY WITH its
  * (appId, batchId) watermark, so a replayed batch — restart, zombie
  * driver, deleted engine checkpoint — is skipped wholesale: source-side
  * at-least-once + this sink = exactly-once table content
  * (TxStreamSinkSpec pins replay and zombie-twin races; the streaming
  * daily loop composes this with the `tx-cdf` source). Append mode
  * only — updates flow through MERGE/delete on the batch API, which is
  * where their serializable semantics live. `appId` is REQUIRED rather
  * than defaulted from the query id: the watermark contract is
  * per-logical-pipeline, and a silently fresh appId on every restart
  * would quietly disable the idempotence this sink exists for. */
final class TxSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "tx"

  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"tx sink is append-only (got $outputMode); updates go through the " +
        "batch MERGE/delete API")
    require(partitionColumns.isEmpty,
      "tx sink ignores partitionBy — layout is the table's cluster key")
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("tx sink requires option 'root'"))
    val appId = parameters.getOrElse("appId",
      throw new IllegalArgumentException(
        "tx sink requires option 'appId' (the txn watermark identity)"))
    new TxSink(root, appId,
      parameters.getOrElse("nFiles", "4").toInt)
  }
}

private[io] final class TxSink(root: String, appId: String, nFiles: Int)
    extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the engine's DataFrame wraps the micro-batch's incremental
    // execution; re-wrap its planned RDD as a plain batch frame so the
    // ordinary write path (repartitionByRange + parquet) accepts it
    val batch = GraftStreamingShim.batchDataFrame(spark, data.schema,
      data.queryExecution.toRdd)
    TxTable.appendBatch(spark, root, appId, batchId, batch, nFiles)
  }
  override def toString: String = s"TxSink[$root, appId=$appId]"
}
