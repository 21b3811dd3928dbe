package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}
import graft.ops.LexIndex

case class ProbeRow(query_id: Long, term: String)

/** The LEXICAL serving half of the streaming daily loop, executed as a
  * real StreamingQuery (the StreamingAnnSpec recipe for the BM25 tier):
  * probe (query_id, term) rows arrive on a MemoryStream in several
  * micro-batches; each batch is served from the STANDING postings +
  * stat cells by the relation-driven multi-probe operator and landed
  * exactly-once in a tx results table. Across deliveries — including a
  * replayed one — the accumulated results must equal the oracled batch
  * entry (q_bm25_multi), proving the batched serve IS the per-micro-
  * batch production loop: per-query scores depend only on the standing
  * index state, so any partition of a probe batch serves identically. */
class StreamingLexServeSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("probe stream vs standing postings: micro-batches ≡ batch entry, exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the batch entry builds (and memoizes) the standing index; its
    // result is the convergence target
    val batch = SparkEntry.queries("q_bm25_multi")(spark, sf).collect()
    batch.length should be > 0
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sf)

    val outT = "/tmp/graft_lexserve_spec_p" + ProcessHandle.current.pid
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outT))
    TxTable.createEmpty(outT, SparkEntry.queries("q_bm25_multi")(spark, sf)
      .schema, "query_id")

    val mem = MemoryStream[ProbeRow]
    val q = mem.toDF()
      .writeStream.option("checkpointLocation", s"$outT.ckpt")
      .foreachBatch { (probes: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        if (!probes.isEmpty) {
          val served = LexIndex.servedScoresMultiOf(spark, postT, statsT,
            tombT = None, probes.toDF())
          // exactly-once landing under the sink's txn watermark; a
          // foreachBatch replay (crash between the append and the
          // checkpoint advance) is absorbed
          TxTable.appendBatch(spark, outT, "lexserve", batchId, served)
          val v = TxTable.versions(outT).max
          TxTable.appendBatch(spark, outT, "lexserve", batchId, served)
          TxTable.versions(outT).max shouldBe v
        }
        ()
      }.start()
    try {
      // the probe batch arrives split across micro-batches (queries
      // 0–1, then 2–3) — production's query stream shape
      val rows = LexIndex.MultiProbes.map { case (id, t) => ProbeRow(id, t) }
      mem.addData(rows.filter(_.query_id < 2): _*)
      q.processAllAvailable()
      mem.addData(rows.filter(_.query_id >= 2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = TxRelation.read(spark, outT)
      .orderBy("query_id", "rank").collect()
    streamed shouldBe batch
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outT))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$outT.ckpt"))
  }
}
