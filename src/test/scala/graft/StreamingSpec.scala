package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.StreamingOps

/** Top-level so Spark can generate an Encoder without an outer scope. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

/** Typed event row for the stream-stream join spec. */
case class EvT(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

/** B25–B27: the same transform functions run on a static frame and on a
  * MemoryStream replay must agree; the watermark path must drop a
  * too-late row in streaming mode (SURVEY §5.2.5). */
class StreamingSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val rows = Seq(
    Ev(1, ts(1), 1, 1.0), Ev(2, ts(4), 1, 2.0), Ev(3, ts(12), 2, 3.0),
    Ev(4, ts(25), 1, 4.0), Ev(5, ts(31), 2, 5.0), Ev(6, ts(75), 1, 6.0),
    Ev(7, ts(76), 2, 7.0), Ev(8, ts(118), 1, 8.0))

  test("B25: tumbling aggregation — stream replay ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete")
      .start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumb").orderBy("ws").collect()
      val batch = StreamingOps.tumblingAgg(rows.toDF()).orderBy("ws").collect()
      streamed shouldBe batch
      streamed.length should be > 0
    } finally q.stop()
  }

  test("B26: session windows — stream replay ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.sessionAgg(mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("sess").outputMode("complete")
      .start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess").orderBy("user_id", "session_start").collect()
      val batch = StreamingOps.sessionAgg(rows.toDF())
        .orderBy("user_id", "session_start").collect()
      streamed shouldBe batch
      // user 1: events at 1,4,25 merge (gaps<30m); 75 and 118 separate
      val u1 = streamed.filter(_.getLong(0) == 1L)
      u1.map(_.getLong(3)).toSeq shouldBe Seq(3L, 1L, 1L)
    } finally q.stop()
  }

  test("B27: dropDuplicatesWithinWatermark suppresses in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    try {
      // event 1 arrives twice within the watermark → second copy dropped
      mem.addData(Ev(1, ts(5), 1, 1.0), Ev(1, ts(5), 1, 1.0), Ev(2, ts(6), 1, 2.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(7), 1, 1.0))   // still within watermark → dropped
      q.processAllAvailable()
      val out = spark.table("dedup").collect()
      out.map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("B27: flatMapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingOps.runningCountsPerUser(mem.toDS())
      .toDF("user_id", "event_id", "n_so_far")
      .writeStream.format("memory").queryName("counts").outputMode("append")
      .start()
    try {
      mem.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      mem.addData((1L, 12L))               // state persists across batches
      q.processAllAvailable()
      val rows = spark.table("counts").orderBy("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      rows should contain ((1L, 12L, 3L))  // third event for user 1
      rows.filter(_._1 == 2L).map(_._3) shouldBe Seq(1L)
    } finally q.stop()
  }

  test("B27/B8: streaming as-of attribution — replay ≡ batch as-of, O(1) state") {
    import StreamingOps.{Ev => AEv}
    implicit val sqlCtx = spark.sqlContext
    // per-user event-time-ordered feed across THREE micro-batches, with
    // equal-ts ties (errors 100/101 at the purchase's exact ts) and a
    // cross-batch match (purchase 5 attributed to error 102 from the
    // PREVIOUS batch — only state, not history, survives the boundary)
    val b1 = Seq(AEv(99, 1, 5000, is_err = true), AEv(100, 1, 10000, is_err = true),
      AEv(101, 1, 10000, is_err = true), AEv(1, 1, 10000, is_err = false))
    val b2 = Seq(AEv(102, 1, 20000, is_err = true), AEv(2, 2, 10000, is_err = false))
    val b3 = Seq(AEv(5, 1, 30000, is_err = false))
    val mem = MemoryStream[AEv]
    val q = StreamingOps.asofAttribution(mem.toDS())
      .writeStream.format("memory").queryName("asof_att").outputMode("append")
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val streamed = spark.table("asof_att").orderBy("event_id").collect()
        .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
      streamed shouldBe Seq(
        (1L, Some(101L)), // equal-ts tie → largest error id
        (2L, None),       // user 2 never errored
        (5L, Some(102L))) // attributed across the batch boundary via state
      // batch-mode run of the SAME code agrees (the oracled q_stream_asof path)
      val batch = StreamingOps.asofAttribution((b1 ++ b2 ++ b3).toDS())
        .orderBy("event_id").collect()
        .map(a => (a.event_id, a.err_event_id)).toSeq
      batch shouldBe streamed
    } finally q.stop()
  }

  test("B27/B8: streaming as-of — a late (older) error cannot overwrite newer state") {
    import StreamingOps.{Ev => AEv}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AEv]
    val q = StreamingOps.asofAttribution(mem.toDS())
      .writeStream.format("memory").queryName("asof_late").outputMode("append")
      .start()
    try {
      // batch 1 establishes error 200 at t=20ms
      mem.addData(AEv(200, 1, 20000, is_err = true)); q.processAllAvailable()
      // batch 2 delivers a LATE error (t=10ms, id 199) then a purchase at
      // t=30ms — the guard must keep error 200 as the match
      mem.addData(AEv(199, 1, 10000, is_err = true),
        AEv(9, 1, 30000, is_err = false))
      q.processAllAvailable()
      val out = spark.table("asof_late").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
      out shouldBe Seq((9L, 200L))
    } finally q.stop()
  }

  test("B27: foreachBatch sink — every row lands exactly once with its batch id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = mem.toDF()
      .filter(col("value") > 1.0)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the production landing pattern: per-micro-batch transactional
        // writes keyed by batch id (idempotent re-runs); here the "sink"
        // is an in-memory queue so the spec can assert exactly-once
        batch.select("event_id").collect().foreach(r => seen.add((id, r.getLong(0))))
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val landed = seen.toArray(Array.empty[(Long, Long)]).toSeq
    landed.map(_._2).sorted shouldBe rows.filter(_.value > 1.0).map(_.event_id)
    landed.map(_._1).distinct.size should be >= 2 // spanned multiple batches
  }

  test("B27: stream-stream interval join — replay ≡ batch, interval respected") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      EvT(1, ts(1), 1, "click"), EvT(2, ts(5), 1, "purchase"), // within 10m → pair
      EvT(3, ts(2), 2, "click"), EvT(4, ts(30), 2, "purchase"), // 28m gap → no pair
      EvT(5, ts(28), 2, "click"), EvT(6, ts(31), 1, "click"),
      EvT(7, ts(33), 1, "purchase"), // pairs with click 6 (2m), not click 1 (32m)
      EvT(8, ts(40), 3, "purchase")) // no click for user 3
    val mem = MemoryStream[EvT]
    val q = StreamingOps.clickAttribution(mem.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append")
      .start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr")
        .orderBy("user_id", "purchase_id", "click_id").collect()
      val batch = StreamingOps.clickAttribution(evs.toDF())
        .orderBy("user_id", "purchase_id", "click_id").collect()
      streamed shouldBe batch
      streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
        Seq((1L, 2L, 1L), (1L, 7L, 6L), (2L, 4L, 5L))
    } finally q.stop()
  }

  test("B27: watermark drops a too-late row in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.withLateDataHandling(mem.toDF())
      .writeStream.format("memory").queryName("late").outputMode("append")
      .start()
    try {
      // batch 1: events up to 02:00 → watermark advances to 01:50
      mem.addData(Ev(1, ts(5), 1, 1.0), Ev(2, ts(15), 1, 2.0), Ev(3, ts(120), 1, 9.0))
      q.processAllAvailable()
      // batch 2: a row at 00:07 — far older than the watermark → dropped
      mem.addData(Ev(99, ts(7), 1, 100.0))
      q.processAllAvailable()
      // batch 3: advance event time far enough to close all windows
      mem.addData(Ev(5, ts(600), 1, 0.0))
      q.processAllAvailable()
      val out = spark.table("late").orderBy("ws").collect()
      // window 00:00–00:10 must contain ONLY event 1 (value 1.0): the
      // late 100.0 row was discarded by the watermark
      val w0 = out.filter(_.getTimestamp(0) == ts(0))
      w0.length shouldBe 1
      w0.head.getLong(1) shouldBe 1L
      w0.head.getDouble(2) shouldBe 1.0
    } finally q.stop()
  }
}
