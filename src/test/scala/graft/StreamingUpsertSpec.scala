package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** Pins the exactly-once streaming UPSERT recipe (TxTable.upsertBatch —
  * foreachBatch + MERGE with a txn watermark, the public Delta-upsert
  * pattern): matched keys update, fresh keys insert, columns absent
  * from the batch carry on update and land NULL on insert; a replayed
  * (appId, batchId) is a wholesale no-op; a zombie-twin race lands the
  * batch exactly once; and a real StreamingQuery whose checkpoint is
  * DELETED re-runs every batch into a bit-identical table. Upserts are
  * NOT idempotent by content (the watermark, not the payload, carries
  * the guarantee), so the version/txn evidence matters, not just the
  * final rows. */
class StreamingUpsertSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshDir(name: String): String = {
    val r = s"/tmp/graft_txupsert_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  private def seed(root: String): Unit =
    TxTable.create(spark, root,
      spark.range(0, 50).select(col("id").as("k"),
        (col("id") * 2).cast("double").as("v"),
        concat(lit("s"), col("id")).as("tag")), "k", nFiles = 2)

  test("upsertBatch: update + insert + partial-column carry; replays " +
      "and stale batches absorbed") {
    val root = freshDir("semantics")
    seed(root)
    // batch 0 carries only (k, v): 40..49 exist (update v, CARRY tag),
    // 50..59 are fresh (insert; absent tag lands NULL)
    val b0 = spark.range(40, 60).select(col("id").as("k"),
      lit(-1.0).as("v"))
    TxTable.upsertBatch(spark, root, "ups", 0L, b0) shouldBe 1L
    val t = TxRelation.read(spark, root)
    t.count() shouldBe 60L
    t.filter(col("k").between(40, 49) && col("v") === -1.0 &&
      col("tag").startsWith("s")).count() shouldBe 10L // updated, tag carried
    t.filter(col("k") >= 50 && col("v") === -1.0 &&
      col("tag").isNull).count() shouldBe 10L // inserted, tag NULL
    t.filter(col("k") < 40 && col("v") === col("k") * 2)
      .count() shouldBe 40L // untouched rows untouched
    // exact replay: no new version, content unchanged
    TxTable.upsertBatch(spark, root, "ups", 0L, b0) shouldBe 1L
    TxTable.versions(root).max shouldBe 1L
    // progress, then a stale replay — also absorbed
    TxTable.upsertBatch(spark, root, "ups", 1L,
      spark.range(0, 5).select(col("id").as("k"), lit(7.0).as("v"),
        lit("u").as("tag"))) shouldBe 2L
    TxTable.upsertBatch(spark, root, "ups", 0L, b0) shouldBe 2L
    TxTable.snapshot(root).txns shouldBe Map("ups" -> 1L)
    TxRelation.read(spark, root).filter(col("tag") === "u")
      .count() shouldBe 5L
    // a batch with an unknown column is refused (schema evolution is
    // administrative, not a mid-stream side effect — same as append)
    intercept[IllegalArgumentException] {
      TxTable.upsertBatch(spark, root, "ups", 2L,
        spark.range(0, 1).select(col("id").as("k"), lit(1).as("extra")))
    }.getMessage should include("new columns")
  }

  test("zombie-twin race: the same upsert batch from two writers " +
      "lands exactly once") {
    val root = freshDir("race")
    seed(root)
    def batch = spark.range(45, 55).select(col("id").as("k"),
      lit(99.0).as("v"), lit("tw").as("tag"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            TxTable.upsertBatch(spark, root, "twin", 3L, batch)
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // exactly one merge landed: one new version, watermark at 3
    TxTable.versions(root).max shouldBe 1L
    TxTable.snapshot(root).txns shouldBe Map("twin" -> 3L)
    val t = TxRelation.read(spark, root)
    t.count() shouldBe 55L // 50 seed + 5 fresh (50..54), 45..49 updated
    t.filter(col("tag") === "tw").count() shouldBe 10L
  }

  test("file-source upsert stream: full checkpoint loss replays every " +
      "batch into a bit-identical table") {
    val root = freshDir("stream")
    val srcDir = freshDir("stream_src")
    val ckpt = freshDir("stream_ckpt")
    seed(root)
    // one file updates seed keys, one inserts fresh ones; file-per-batch
    // (maxFilesPerTrigger) keeps each batch's keys unique, the caller's
    // side of the merge contract
    spark.range(10, 30).select(col("id").as("k"),
      lit(-5.0).as("v"), lit("f1").as("tag"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    Thread.sleep(1100) // distinct mod times → deterministic file order
    spark.range(100, 120).select(col("id").as("k"),
      lit(-6.0).as("v"), lit("f2").as("tag"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def run(checkpoint: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          TxTable.upsertBatch(spark, root, "stream-ups", id, df); ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000) shouldBe true
    }
    run(ckpt)
    val contentAfter = TxRelation.read(spark, root)
      .orderBy("k").collect()
    contentAfter.length shouldBe 70 // 50 seed + 20 fresh
    val vAfter = TxTable.versions(root).max
    // catastrophic engine-checkpoint loss: every batch replays from
    // scratch; the txn watermarks alone must absorb the replay
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    run(freshDir("stream_ckpt2"))
    TxTable.versions(root).max shouldBe vAfter
    TxRelation.read(spark, root).orderBy("k").collect() shouldBe contentAfter
  }
}
