package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.StreamingOps

/** Kill-and-restart recovery (SURVEY §2 B27 tail): a streaming query is
  * STOPPED mid-stream, more data arrives while it is down, and a brand
  * new query object restarts from the same checkpoint. Proves the two
  * recovery guarantees a deployment actually relies on:
  *   1. exactly-once APPEND output — batch-1 rows are not re-emitted by
  *      the restarted query (offset log + parquet `_spark_metadata`);
  *   2. STATE STORE recovery for `flatMapGroupsWithState` — an
  *      attribution that can only be produced from state written BEFORE
  *      the kill (the pre-kill batches are not reprocessed).
  */
class StreamRestartSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val rows = Seq(
    Ev(1, ts(1), 1, 1.0), Ev(2, ts(4), 1, 2.0), Ev(3, ts(12), 2, 3.0),
    Ev(4, ts(25), 1, 4.0), Ev(5, ts(31), 2, 5.0), Ev(6, ts(75), 1, 6.0))

  private def cleanDir(p: String): String = {
    val f = new java.io.File(p)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
    p
  }

  test("file source → parquet sink: restart from checkpoint is exactly-once") {
    val in = cleanDir("/tmp/graft_stream/restart_in")
    val out = cleanDir("/tmp/graft_stream/restart_out")
    val ck = cleanDir("/tmp/graft_stream/restart_ck")
    val schema = rows.toDF().schema
    rows.take(3).toDF().write.mode("append").json(in)
    def startQ() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in)
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop() // kill after batch 1
    // more data lands while the query is DOWN
    rows.drop(3).toDF().write.mode("append").json(in)
    val q2 = startQ() // new query object, same checkpoint
    try q2.processAllAvailable() finally q2.stop()
    val landed = spark.read.parquet(out)
      .orderBy("event_id").collect().map(_.getLong(0)).toSeq
    // every row exactly once: the restart neither re-emitted batch 1
    // nor missed the while-down files
    landed shouldBe rows.map(_.event_id)
  }

  test("flatMapGroupsWithState: state recovers across restart (q_stream_asof shape)") {
    implicit val sqlCtx = spark.sqlContext
    val out = cleanDir("/tmp/graft_stream/asof_out")
    val ck = cleanDir("/tmp/graft_stream/asof_ck")
    val mem = MemoryStream[StreamingOps.Ev]
    def startQ() = StreamingOps.asofAttribution(mem.toDS())
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = startQ()
    try {
      mem.addData(
        StreamingOps.Ev(10, 1, 1000L, is_err = true),
        StreamingOps.Ev(11, 1, 2000L, is_err = false))
      q1.processAllAvailable()
    } finally q1.stop() // kill: user 1's ErrState(10, 1000) is only in the state store
    // a purchase arrives while down; attributing it REQUIRES the
    // pre-kill error state (batch 1 is not reprocessed on restart)
    mem.addData(StreamingOps.Ev(12, 1, 3000L, is_err = false))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).orderBy("event_id").collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(11L, 12L)
    got.foreach { r =>
      withClue(s"purchase ${r.getLong(0)}: ") {
        r.getLong(3) shouldBe 10L   // err_event_id from recovered state
        r.getLong(4) shouldBe 1000L // err_us
      }
    }
  }
}
