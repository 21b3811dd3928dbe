package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.StreamingOps

/** EXECUTION proof for the production streaming ops (B25–B27): the
  * MemoryStream specs pin transform semantics; this runs the real
  * `StreamingQuery` machinery end-to-end — file SOURCE over the actual
  * testdata parquet, `Trigger.AvailableNow`, a real checkpoint, and a
  * file/foreachBatch SINK — and asserts the landed output equals the
  * oracle-gated batch result row-for-row.
  *
  * Sink choice per query is the production-standard one:
  *  - q_stream_asof (flatMapGroupsWithState, Append output) lands in a
  *    NATIVE append-mode parquet sink;
  *  - q_incr_dedup_stream ends in a streaming AGGREGATE — file sinks
  *    are append-only and an unwatermarked aggregate can't append, so
  *    it lands via `foreachBatch` + idempotent overwrite, the standard
  *    aggregate→file pattern (checkpointed the same way).
  */
class AvailableNowSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def cleanDir(p: String): String = {
    val f = new java.io.File(p)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
    p
  }

  test("q_stream_asof runs as a real AvailableNow StreamingQuery into a parquet sink ≡ batch") {
    val s = spark
    import s.implicits._
    val outDir = cleanDir("/tmp/graft_stream/asof_out")
    val ckpt = cleanDir("/tmp/graft_stream/asof_ckpt")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val src = graft.io.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "error").as("is_err"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.asofAttribution(src)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("err_event_id"),
        timestamp_micros(col("err_us")).as("err_ts"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true

    val landed = spark.read.parquet(outDir)
      .orderBy("event_id").collect()
    val batch = SparkEntry.queries("q_stream_asof")(spark, sf).collect()
    landed.length shouldBe batch.length
    landed shouldBe batch
  }

  test("q_incr_dedup_stream runs as a real AvailableNow StreamingQuery (foreachBatch parquet) ≡ batch") {
    val outDir = cleanDir("/tmp/graft_stream/incr_out")
    val ckpt = cleanDir("/tmp/graft_stream/incr_ckpt")
    val (fpT, bandT, sigT) = graft.ops.Incremental.buildIndexes(spark, sf)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .filter(col("doc_id") % 10 >= 8) // the daily batch slice
      .select(col("doc_id"), col("text"))
    val q = graft.ops.Incremental.incrDedupFlags(src,
        graft.io.TxRelation.read(spark, fpT),
        graft.io.TxRelation.read(spark, bandT),
        graft.io.TxRelation.read(spark, sigT))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true

    val landed = spark.read.parquet(outDir).orderBy("doc_id").collect()
    val batch = SparkEntry.queries("q_incr_dedup_stream")(spark, sf).collect()
    landed.length shouldBe batch.length
    landed shouldBe batch
  }
}
