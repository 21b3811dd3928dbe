package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.StreamingOps

/** B25–B27 production path: file SOURCE (readStream over a JSON-lines
  * directory, discovered incrementally) and file SINK (append-mode
  * parquet with a checkpoint — the exactly-once landing zone). The
  * MemoryStream specs prove transform semantics; these prove the
  * file-based plumbing a deployment actually runs. */
class FileStreamSpec extends AnyFunSuite with Matchers {
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

  test("file source: readStream over a JSON directory ≡ batch aggregation") {
    val dir = cleanDir("/tmp/graft_stream/in_json")
    val schema = rows.toDF().schema
    // two separate slices so the source sees >1 file; maxFilesPerTrigger=1
    // forces multi-batch incremental discovery
    rows.take(3).toDF().write.mode("append").json(dir)
    rows.drop(3).toDF().write.mode("append").json(dir)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir)
    val q = StreamingOps.tumblingAgg(src)
      .writeStream.format("memory").queryName("file_tumb")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_tumb").orderBy("ws").collect()
      val batch = StreamingOps.tumblingAgg(
        spark.read.schema(schema).json(dir)).orderBy("ws").collect()
      streamed shouldBe batch
      streamed.length should be > 1
    } finally q.stop()
  }

  test("parquet file source on the REAL events table (ts shim) ≡ batch") {
    // the driver's events.parquet ts layout varies by testdata revision
    // (INT64 ns / native µs) — the SAME layout-adaptive normalizer as
    // Tables.events makes the streaming and batch paths identical
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def shim(df: org.apache.spark.sql.DataFrame) =
      graft.io.Tables.normalizeTs(df)
    // the file source wants a DIRECTORY; pathGlobFilter narrows it to the
    // events table inside the shared testdata dir
    val src = shim(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val q = StreamingOps.tumblingAgg(src)
      .writeStream.format("memory").queryName("real_tumb")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("real_tumb").orderBy("ws").collect()
      val batch = StreamingOps.tumblingAgg(
        shim(spark.read.parquet(s"$dir/events.parquet"))).orderBy("ws").collect()
      streamed shouldBe batch
      streamed.length should be > 10
    } finally q.stop()
  }

  test("file sink: append-mode parquet with checkpoint writes exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = cleanDir("/tmp/graft_stream/out_parquet")
    val ckpt = cleanDir("/tmp/graft_stream/ckpt")
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .filter(col("value") > 1.0)
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(outDir)
    // every qualifying row exactly once, across both micro-batches
    landed.orderBy("event_id").collect().map(_.getLong(0)).toSeq shouldBe
      rows.filter(_.value > 1.0).map(_.event_id)
  }
}
