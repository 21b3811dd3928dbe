package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** The STREAMING twin of DailyLoopSpec — the same daily 100 TB loop,
  * but with BOTH ends of the table streaming through the first-class
  * connectors instead of hand-driven batch calls:
  *
  *   `writeStream.format("tx")` (exactly-once sink, txn watermarks) →
  *   `readStream.format("tx-cdf")` (per-commit change feed) →
  *   foreachBatch: incremental dedup against the STANDING bucketed
  *   index → index admission → repeat.
  *
  * Pins: the sink survives total engine-checkpoint loss without double
  * ingest; the feed's checkpointed drains hand each day's inserts to
  * the dedup tier exactly once; day-2 re-submissions of day-1 content
  * are caught by the index day 1 maintained — and every moving part is
  * the public streaming API surface, no bespoke glue. */
class StreamingDailyLoopSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val base = s"/tmp/graft_sdl_p${ProcessHandle.current.pid}"
  private val root = s"$base/table"

  private def idx(name: String) = s"$base/idx_$name"

  private def buildIdx(corpus: DataFrame): Unit =
    graft.ops.Incremental.buildIndexTables(spark, corpus,
      idx("fp"), idx("band"), idx("sig"))

  private def flags(batch: DataFrame): DataFrame =
    graft.ops.Incremental.incrDedupFlags(batch,
      graft.io.TxRelation.read(spark, idx("fp")),
      graft.io.TxRelation.read(spark, idx("band")),
      graft.io.TxRelation.read(spark, idx("sig")))

  /** Drain the srcDir file stream into the tx table via the `tx` sink. */
  private def ingest(srcDir: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("tx")
      .option("root", root).option("appId", "daily")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
  }

  /** Drain the change feed through THE library fan-out driver
    * ([[graft.ops.Propagate.runFanoutLoop]]); hand each commit's
    * inserts to the dedup tier under the CORPUS COMMIT VERSION the
    * driver derives — never the streaming batchId (the capstones' r17
    * hazard, fixed here too) — admit the keepers, record the flags. */
  private def consumeFeed(ckpt: String,
      out: scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row]): Unit = {
    graft.ops.Propagate.runFanoutLoop(spark, root, ckpt,
      apply = { (batch, commitV) =>
        val inserts = batch.filter(col("change_type") === "insert")
          .select(col("doc_id"), col("text"))
        if (!inserts.isEmpty) {
          val f = flags(inserts).cache()
          // materialize BEFORE admission: admitBatch appends this
          // batch's own fingerprints to the index, and a lazy flags
          // plan evaluated after that would self-dup every doc
          val rows = f.collect()
          // EXACTLY-ONCE admission: the tx indexes record
          // (appId, commit_v), so a replay (crash between index commit
          // and engine-checkpoint advance) is absorbed
          graft.ops.Incremental.admitBatch(spark, inserts,
            f.filter(col("kept") === 1L), idx("fp"), idx("band"),
            idx("sig"), txn = Some(("sdl_admit", commitV)))
          // a replayed admission of the SAME commit commits nothing
          val vb = TxTable.versions(idx("fp")).max
          graft.ops.Incremental.admitBatch(spark, inserts,
            f.filter(col("kept") === 1L), idx("fp"), idx("band"),
            idx("sig"), txn = Some(("sdl_admit", commitV)))
          TxTable.versions(idx("fp")).max shouldBe vb
          out ++= rows
          f.unpersist()
        }
      }, timeoutMs = 120000) shouldBe true
  }

  test("streaming sink → streaming CDF → standing-index dedup loop") {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // day 0: standing corpus + standing index
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    TxTable.create(spark, root, corpus, "doc_id", nFiles = 4)
    buildIdx(corpus)
    val feedCkpt = s"$base/feed_ckpt"
    val sinkCkpt = s"$base/sink_ckpt"

    // day 1: fresh docs arrive as files in the ONE growing source dir
    // (one logical pipeline: one appId, one sink checkpoint — the
    // txn-watermark contract)
    val day1 = docs.filter(col("doc_id") % 10 === 8)
    val src = s"$base/incoming"
    day1.coalesce(1).write.mode("append").parquet(src)
    ingest(src, sinkCkpt)
    TxTable.countRows(root) shouldBe corpus.count() + day1.count()
    val vDay1 = TxTable.versions(root).max

    // catastrophic engine-checkpoint loss: re-ingest day 1 from scratch
    // — the sink's txn watermark absorbs every replayed batch
    ingest(src, s"$base/sink_ckpt_lost")
    TxTable.versions(root).max shouldBe vDay1
    TxTable.countRows(root) shouldBe corpus.count() + day1.count()

    // the feed hands day-1 inserts to the dedup tier
    val flags1 = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    consumeFeed(feedCkpt, flags1)
    flags1.size shouldBe day1.count()
    // fresh content: no exact dups against day 0
    flags1.count(_.getAs[Long]("exact_dup") == 1L) shouldBe 0

    // day 2: genuinely new docs PLUS re-submissions of day-1 content
    // under fresh ids (the crawler re-fetch shape)
    val fresh2 = docs.filter(col("doc_id") % 10 === 9)
    val resub = day1.select((col("doc_id") + 100000).as("doc_id"),
      col("text"))
    fresh2.unionByName(resub).coalesce(1).write.mode("append").parquet(src)
    ingest(src, sinkCkpt) // SAME pipeline: next batch id, lands once
    val flags2 = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    consumeFeed(feedCkpt, flags2) // SAME feed checkpoint: resumes
    flags2.size shouldBe (fresh2.count() + resub.count())
    // resubs of ADMITTED day-1 docs flag as exact dups; day-1 docs the
    // dedup tier itself dropped were never admitted, so their resubs
    // flag as near dups — either way nothing re-enters
    val admitted1 = flags1.filter(_.getAs[Long]("kept") == 1L)
      .map(_.getAs[Long]("doc_id") + 100000).toSet
    flags2.filter(r => admitted1(r.getAs[Long]("doc_id")))
      .count(_.getAs[Long]("exact_dup") == 0L) shouldBe 0
    flags2.filter(_.getAs[Long]("doc_id") >= 100000)
      .count(_.getAs[Long]("kept") == 1L) shouldBe 0
    flags2.filter(_.getAs[Long]("doc_id") < 100000)
      .count(_.getAs[Long]("exact_dup") == 1L) shouldBe 0

    // the table holds every ingested row exactly once
    TxTable.countRows(root) shouldBe
      docs.count() + day1.count() // corpus + day1 + fresh2 + resub
  }
}
