package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Doc row for the streaming incremental-dedup spec (top-level so Spark
  * generates an Encoder without an outer scope). */
case class DocRow(doc_id: Long, text: String)

/** The streaming daily-ingest story: q_incr_dedup_stream's core is a
  * stream-static pipeline (stateless signature folds, stream-STATIC
  * joins against the standing bucketed index tables, ONE terminal
  * stateful aggregation) — so a readStream micro-batch ingest runs the
  * SAME code. This spec replays the real batch docs through a
  * MemoryStream against the real standing indexes and pins
  * stream ≡ batch row-for-row, across multi-micro-batch delivery. */
class StreamingIncrSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}
  import spark.implicits._

  test("incremental dedup: MemoryStream micro-batches ≡ batch, against the standing index") {
    implicit val sqlCtx = spark.sqlContext
    val (fpT, bandT, sigT) = graft.ops.Incremental.buildIndexes(spark, sf)
    val batchDocs = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val rows = batchDocs.as[DocRow].collect().toSeq
    rows.size should be > 0

    val mem = MemoryStream[DocRow]
    val q = graft.ops.Incremental.incrDedupFlags(mem.toDF(),
        graft.io.TxRelation.read(spark, fpT),
        graft.io.TxRelation.read(spark, bandT),
        graft.io.TxRelation.read(spark, sigT))
      .writeStream.format("memory").queryName("incr_stream")
      .outputMode("complete").start()
    try {
      // two deliveries → at least two micro-batches; the complete-mode
      // aggregate must converge to the batch answer
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.size / 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("incr_stream").orderBy("doc_id").collect()
      val batch = SparkEntry.queries("q_incr_dedup_stream")(spark, sf).collect()
      streamed shouldBe batch
      // and the streaming-capable tier agrees with the other two tiers
      val idx = SparkEntry.queries("q_incr_dedup_idx")(spark, sf).collect()
      batch shouldBe idx
    } finally q.stop()
  }
}
