package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}
import graft.ops.Sketches

/** Doc row for the streaming sketch-admission spec (top-level for the
  * Encoder, as DocRow). */
case class SkDocRow(source: String, text: String)

/** The standing sketch tier maintained BY A STREAM: q_incr_hll's
  * admission is one bounded append per ingest day, so a readStream
  * micro-batch ingest is foreachBatch → register build → appendBatch
  * under the stream's own (appId, batchId) — the exactly-once
  * contract the tx sink family already proves for row data, here
  * carrying SKETCH deltas. Pins: (a) a real StreamingQuery delivering
  * the corpus in micro-batches leaves a register log whose min-merge
  * estimate equals the from-scratch corpus sketch; (b) a redelivered
  * micro-batch (the restart-replay case foreachBatch must absorb) is
  * a version-preserving no-op even with poisoned rows. */
class StreamingSketchSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}
  import spark.implicits._

  test("streamed register admission converges to the from-scratch sketch; replay absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_txsketch_hllstream_spec_p" +
      ProcessHandle.current.pid
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.createEmpty(root, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("weight",
        org.apache.spark.sql.types.LongType))), "idx")

    val rows = graft.io.Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[SkDocRow].collect().toSeq
    rows.size should be > 0

    val mem = MemoryStream[SkDocRow]
    var seen = Vector.empty[Long]
    val q = mem.toDF().writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        TxTable.appendBatch(spark, root, "stream_hll", id,
          Sketches.hllRegisters(Sketches.hllShingles(df)), nFiles = 1)
        seen = seen :+ id
        ()
      }
      .start()
    try {
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    seen.size should be >= 2

    // (a) the standing log's estimate = the from-scratch corpus sketch
    val streamed = Sketches.hllEstimate(
        TxRelation.read(spark, root)
          .groupBy("source", "idx").agg(min(col("weight")).as("weight")))
      .select(col("source"), round(col("hll_raw"), 4).as("hll_est"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val full = Sketches.qHllEst(spark, sf)
      .select(col("source"), col("hll_est"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    streamed should contain theSameElementsInOrderAs full

    // (b) redelivery of the last micro-batch is absorbed wholesale
    val v0 = TxTable.snapshot(root).version
    val poison = TxRelation.read(spark, root)
      .select(col("source"), col("idx"), lit(1L).as("weight")).limit(2)
    TxTable.appendBatch(spark, root, "stream_hll", seen.max, poison) shouldBe v0
    TxTable.snapshot(root).version shouldBe v0
  }
}
