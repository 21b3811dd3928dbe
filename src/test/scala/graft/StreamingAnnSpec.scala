package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxRelation
import graft.ops.GraphAnn

case class VecRow(vec_id: Long, embedding: Array[Float])

/** The ANN SERVING half of the streaming daily loop, executed as a real
  * StreamingQuery: probe vectors arrive on a MemoryStream, are banded
  * under the standing store's scheme, stream-static-joined against the
  * band store, and folded into per-probe top-k by the core's ONE
  * stateful aggregate — across two separate deliveries, the
  * complete-mode result must converge to the oracled batch entry
  * (q_stream_ann), proving the entry's plan is the plan a streaming
  * ingest executes unchanged (the StreamingIncrSpec recipe for the
  * retrieval tier). */
class StreamingAnnSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("probe stream vs standing band store: micro-batches ≡ batch entry") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.expressions.FloatVectorDot.register(spark)
    // the batch entry builds (and memoizes) the standing stores; its
    // result is the convergence target
    val batch = SparkEntry.queries("q_stream_ann")(spark, sf).collect()
    batch.length should be > 0
    val (_, broot) = GraphAnn.ensureStores(spark, sf)
    val bits = GraphAnn.readBandScheme(broot)

    val probeRows = graft.io.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().toSeq
    probeRows.size shouldBe 3

    val mem = MemoryStream[VecRow]
    val q = GraphAnn.annServeCore(mem.toDF(),
        TxRelation.read(spark, broot), bits)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("complete").start()
    try {
      // two deliveries → at least two micro-batches; the stateful fold
      // must converge to the batch answer
      mem.addData(probeRows.take(1): _*)
      q.processAllAvailable()
      mem.addData(probeRows.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("ann_stream").orderBy("qid", "rn").collect()
      streamed shouldBe batch
    } finally q.stop()
  }
}
