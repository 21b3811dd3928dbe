package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q_stream_session's STREAMING twin on the production state backend:
  * the same `session_window` gap-merge aggregation run as a real
  * `StreamingQuery` with the ROCKSDB state store provider — the knob a
  * 100 TB deployment turns so session state (every open session keyed
  * by user) lives off-heap/on-disk instead of in executor heap — plus
  * a watermark, `Trigger.AvailableNow`, and a real checkpoint. (The
  * provider is a session conf captured at query START, so it is set
  * around `.start()` and restored immediately.)
  *
  * Parity contract: in append mode a session emits only once the
  * watermark passes its end, so the landed rows must equal the BATCH
  * result restricted to sessions finalized under the final watermark
  * (max event ts − the 10-minute delay); sessions still open at drain
  * end stay in state, which is correct streaming semantics, not loss.
  * A second test restarts from the checkpoint with nothing new and
  * pins that RocksDB state survives a restart without re-emitting. */
class RocksDbSessionSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def cleanDir(p: String): String = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    p
  }

  test("streaming session windows on RocksDB state ≡ batch below the watermark") {
    val outDir = cleanDir("/tmp/graft_stream/rocks_session_out")
    val ckpt = cleanDir("/tmp/graft_stream/rocks_session_ckpt")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val src = graft.io.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
      .withWatermark("ts", "10 minutes")
    // the provider class is a SESSION conf captured at query start
    // (not a sink option); restore the default after the run so the
    // shared test session doesn't leak it into parallel suites
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try graft.ops.StreamingOps.sessionAgg(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    q.awaitTermination(120000) shouldBe true

    // the provider actually engaged: the state operator reports
    // RocksDB's own custom metrics in the query progress
    val metrics = q.recentProgress.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet.toArray.map(_.toString))
    metrics.exists(_.toLowerCase.contains("rocksdb")) shouldBe true

    val landed = spark.read.parquet(outDir)
      .orderBy("user_id", "session_start").collect()
    // batch truth, restricted to sessions the final watermark finalized
    val maxTs = graft.io.Tables.events(spark, sf)
      .agg(max("ts")).head.getTimestamp(0)
    val wm = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val batch = SparkEntry.queries("q_stream_session")(spark, sf)
      .filter(col("session_end") <= lit(wm))
      .orderBy("user_id", "session_start").collect()
    landed.length shouldBe batch.length
    landed shouldBe batch
    landed.length should be > 0
  }

  test("checkpoint restart with no new data re-emits nothing") {
    val outDir = "/tmp/graft_stream/rocks_session_out"
    val ckpt = "/tmp/graft_stream/rocks_session_ckpt"
    val before = spark.read.parquet(outDir).count()
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val src = graft.io.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
      .withWatermark("ts", "10 minutes")
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try graft.ops.StreamingOps.sessionAgg(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    q.awaitTermination(120000) shouldBe true
    spark.read.parquet(outDir).count() shouldBe before
  }
}
