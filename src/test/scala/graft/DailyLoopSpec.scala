package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** The PLATFORM CAPSTONE: the full daily 100 TB ingest loop, composed
  * from the tiers the repo ships —
  *
  *   exactly-once streaming ingest (TxTable.appendBatch, txn
  *   watermarks) → change data feed (TxTable.changes reads only the
  *   day's files) → incremental dedup against the STANDING bucketed
  *   index (Incremental.incrDedupFlags, corpus never re-shuffles) →
  *   index maintenance (admitBatch appends the kept docs) → repeat.
  *
  * Each piece is oracled/spec-pinned alone; this spec pins the
  * COMPOSITION: day-2 re-submissions of day-1 content are caught as
  * exact duplicates by an index that only ever saw appends, a replayed
  * ingest batch contributes NOTHING to the feed (the dedup tier never
  * even sees it), and the loop's cost each day is O(day's data) — the
  * CDF diffs only commit-touched files and the flag join only shuffles
  * the batch side. */
class DailyLoopSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val root =
    s"/tmp/graft_dailyloop_p${ProcessHandle.current.pid}/table"

  private def idx(name: String) =
    s"/tmp/graft_dailyloop_p${ProcessHandle.current.pid}/idx_$name"

  private def buildIdx(corpus: DataFrame): Unit =
    graft.ops.Incremental.buildIndexTables(spark, corpus,
      idx("fp"), idx("band"), idx("sig"))

  private def flags(batch: DataFrame): DataFrame =
    graft.ops.Incremental.incrDedupFlags(batch,
      graft.io.TxRelation.read(spark, idx("fp")),
      graft.io.TxRelation.read(spark, idx("band")),
      graft.io.TxRelation.read(spark, idx("sig")))

  private def inserts(fromV: Long, toV: Long): DataFrame =
    TxTable.changes(spark, root, fromV, toV)
      .filter(col("change_type") === "insert")
      .select(col("doc_id"), col("text"))

  test("ingest → CDF → flag → admit: day-2 re-submissions all flag as dups") {
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // day 0: the standing corpus, seeded into the warehouse table and
    // the standing dedup index
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    TxTable.create(spark, root, corpus, "doc_id", nFiles = 4)
    buildIdx(corpus)
    val v0 = TxTable.snapshot(root).version

    // day 1: fresh docs stream in exactly-once
    val day1 = docs.filter(col("doc_id") % 10 === 8)
    TxTable.appendBatch(spark, root, "daily", 1L, day1)
    val v1 = TxTable.snapshot(root).version
    val feed1 = inserts(v0, v1)
    feed1.count() shouldBe day1.count()
    val f1 = flags(feed1).cache()
    // fresh content: nothing exact-dups against the day-0 corpus
    f1.filter(col("exact_dup") === 1).count() shouldBe 0L
    graft.ops.Incremental.admitBatch(spark, feed1,
      f1.filter(col("kept") === 1), idx("fp"), idx("band"), idx("sig"))

    // a REPLAY of day 1 (zombie driver): absorbed by the txn watermark,
    // so the feed sees nothing and the dedup tier never runs at all
    TxTable.appendBatch(spark, root, "daily", 1L, day1)
    TxTable.snapshot(root).version shouldBe v1
    inserts(v1, TxTable.snapshot(root).version).count() shouldBe 0L

    // day 2: genuinely new docs PLUS re-submissions of day-1 content
    // under fresh ids (the crawler re-fetch shape)
    val fresh2 = docs.filter(col("doc_id") % 10 === 9)
    val resub = day1.select((col("doc_id") + 100000).as("doc_id"),
      col("text"))
    TxTable.appendBatch(spark, root, "daily", 2L, fresh2.unionByName(resub))
    val v2 = TxTable.snapshot(root).version
    val feed2 = inserts(v1, v2)
    feed2.count() shouldBe (fresh2.count() + resub.count())
    val f2 = flags(feed2).cache()
    // every re-submission is caught by the index day 1 maintained:
    // resubs of ADMITTED docs as exact dups, resubs of docs day 1
    // itself dropped (near-dups of the corpus, never admitted) as
    // near dups — either way nothing re-enters
    val admittedResub = f1.filter(col("kept") === 1)
      .select((col("doc_id") + 100000).as("doc_id"))
    f2.join(admittedResub, "doc_id")
      .filter(col("exact_dup") === 0).count() shouldBe 0L
    f2.filter(col("doc_id") >= 100000)
      .filter(col("kept") === 1).count() shouldBe 0L
    f2.filter(col("doc_id") < 100000)
      .filter(col("exact_dup") === 1).count() shouldBe 0L

    // the table itself holds every ingested row exactly once
    TxTable.countRows(root) shouldBe docs.count() + day1.count()
    f1.unpersist(); f2.unpersist()
  }
}
