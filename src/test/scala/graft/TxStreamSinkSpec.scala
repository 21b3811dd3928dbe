package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Pins exactly-once streaming ingest into the tx table
  * (TxTable.appendBatch — the `txn`-action sink recipe): a replayed
  * micro-batch must be skipped wholesale because the (appId, batchId)
  * watermark commits ATOMICALLY with the batch's files; the watermark
  * must survive log checkpoints; and the end-to-end proof is a real
  * file-source StreamingQuery whose entire checkpoint is DELETED and
  * the stream re-run from scratch — every batch replays, the table
  * changes by nothing. */
class TxStreamSinkSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshDir(name: String): String = {
    val r = s"/tmp/graft_txsink_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  private def seed(root: String): Unit =
    TxTable.create(spark, root,
      spark.range(0, 50).select(col("id").as("k"),
        (col("id") * 2).cast("double").as("v")), "k", nFiles = 2)

  test("appendBatch is idempotent per (appId, batchId); apps independent") {
    val root = freshDir("idem")
    seed(root)
    def batch(lo: Long) = spark.range(lo, lo + 10)
      .select(col("id").as("k"), lit(0.0).as("v"))
    TxTable.appendBatch(spark, root, "appA", 0L, batch(100)) shouldBe 1L
    TxTable.read(spark, root).count() shouldBe 60L
    // exact replay: same app, same batch — no-op, no new version
    TxTable.appendBatch(spark, root, "appA", 0L, batch(100)) shouldBe 1L
    TxTable.versions(root).max shouldBe 1L
    TxTable.read(spark, root).count() shouldBe 60L
    // stale replay after progress is also skipped
    TxTable.appendBatch(spark, root, "appA", 1L, batch(200)) shouldBe 2L
    TxTable.appendBatch(spark, root, "appA", 0L, batch(100)) shouldBe 2L
    TxTable.read(spark, root).count() shouldBe 70L
    // a DIFFERENT app's batch 0 is its own stream — it lands
    TxTable.appendBatch(spark, root, "appB", 0L, batch(300)) shouldBe 3L
    TxTable.read(spark, root).count() shouldBe 80L
    TxTable.snapshot(root).txns shouldBe Map("appA" -> 1L, "appB" -> 0L)
  }

  test("zombie-twin race: same (appId, batchId) from two writers lands once") {
    val root = freshDir("race")
    seed(root)
    def batch = spark.range(500, 520)
      .select(col("id").as("k"), lit(3.0).as("v"))
    // a failed-over driver and its zombie predecessor both deliver
    // batch 7: whatever the interleaving, strict commit + watermark
    // re-validation must admit exactly one copy
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            TxTable.appendBatch(spark, root, "twin", 7L, batch)
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    TxTable.read(spark, root).count() shouldBe 70L // 50 seed + ONE batch
    TxTable.read(spark, root).filter(col("k") >= 500)
      .select("k").distinct().count() shouldBe 20L
    TxTable.snapshot(root).txns shouldBe Map("twin" -> 7L)
  }

  test("txn watermarks survive checkpoint replay (compact drops no state)") {
    val root = freshDir("ckpt")
    seed(root)
    TxTable.appendBatch(spark, root, "app", 7L,
      spark.range(100, 110).select(col("id").as("k"), lit(1.0).as("v")))
    TxTable.compact(spark, root, nFiles = 2) // writes a log checkpoint
    val viaCkpt = TxTable.snapshot(root, useCheckpoint = true)
    val viaLog = TxTable.snapshot(root, useCheckpoint = false)
    viaCkpt.txns shouldBe Map("app" -> 7L)
    viaCkpt.txns shouldBe viaLog.txns
    // the replay guard still holds when state came through the checkpoint
    val v = viaCkpt.version
    TxTable.appendBatch(spark, root, "app", 7L,
      spark.range(900, 910).select(col("id").as("k"),
        lit(9.0).as("v"))) shouldBe v
    TxTable.read(spark, root).count() shouldBe 60L
  }

  test("file-source stream lands exactly-once; full checkpoint loss replays to a no-op") {
    val root = freshDir("stream")
    val srcDir = freshDir("stream_src")
    val ckpt = freshDir("stream_ckpt")
    seed(root)
    // two source files → the stream sees them (as one or more batches)
    spark.range(1000, 1040).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("v"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    spark.range(2000, 2040).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("v"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def run(checkpoint: String): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          TxTable.appendBatch(spark, root, "ingest", id, df); ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000) shouldBe true
    }
    run(ckpt)
    val after = TxTable.read(spark, root).count()
    after shouldBe 130L // 50 seed + 80 streamed
    val vAfter = TxTable.versions(root).max
    // catastrophic sink-coordination loss: the engine checkpoint is
    // GONE, so the restarted query re-emits every batch from scratch —
    // the txn watermarks alone must absorb the replay
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    run(freshDir("stream_ckpt2"))
    TxTable.read(spark, root).count() shouldBe 130L
    TxTable.versions(root).max shouldBe vAfter
    // and the landed content is the exact union, no row lost either
    TxTable.read(spark, root).filter(col("k") >= 1000)
      .agg(sum("k")).head.getLong(0) shouldBe
      ((1000L until 1040L).sum + (2000L until 2040L).sum)
  }
}
