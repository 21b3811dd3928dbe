package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{Tables, TxRelation, TxTable}
import graft.ops.{Incremental, LexIndex, Pipeline}

/** The standing lexical (BM25) index's contract (r17 verdict item 1):
  * served scores are BIT-IDENTICAL to from-scratch BM25 at every
  * lifecycle stage (grown, retracted), admission and retraction are
  * exactly-once, the probe's postings scan is bucket-pruned to the
  * queried terms, and physical compaction leaves reads unchanged. */
class LexIndexSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("grown index: served scores ≡ from-scratch BM25, full frame") {
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sf)
    val served = LexIndex.servedScores(spark, postT, statsT, tombT = None)
      .orderBy("doc_id").collect().toSeq
    // served covers exactly the hit docs — the score > 0 cut of the
    // from-scratch frame (module doc: hit scores are strictly positive)
    val scratch = Pipeline.bm25Scores(spark, sf)
      .filter(col("score") > 0).orderBy("doc_id").collect().toSeq
    served shouldBe scratch
    served.size should be > 0
  }

  test("retracted index: masked postings + negated stat cells ≡ from-scratch BM25 on survivors") {
    val (postT, statsT, tombT) = LexIndex.buildDeleteIndex(spark, sf)
    val served = LexIndex.servedScores(spark, postT, statsT, Some(tombT))
      .orderBy("doc_id").collect().toSeq
    val survivors = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(!Incremental.isDroppedDoc)
    val scratch = Pipeline.bm25ScoresOf(survivors)
      .filter(col("score") > 0).orderBy("doc_id").collect().toSeq
    served shouldBe scratch
    served.size should be > 0
  }

  test("admission and retraction are exactly-once under the txn watermark") {
    val (postT, statsT, tombT) = LexIndex.buildDeleteIndex(spark, sf)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val before = Seq(postT, statsT, tombT).map(r => TxTable.versions(r).max)
    // replayed admission (same appId/batchId as the fixture's day 1)
    LexIndex.admitDocs(spark, docs.filter(Incremental.isBatch),
      postT, statsT, txn = Some(("incr_bm25", 1L)))
    // replayed retraction (same appId/batchId as the fixture's delete)
    LexIndex.retractDocs(spark, docs.filter(Incremental.isDroppedDoc),
      tombT, statsT, deletedAtV = 2L, txn = Some(("incr_bm25", 2L)))
    Seq(postT, statsT, tombT).map(r => TxTable.versions(r).max) shouldBe
      before
  }

  test("the probe's postings scan bucket-prunes to the queried terms") {
    val (postT, _) = LexIndex.buildGrownIndex(spark, sf)
    // a bare filter has no distribution requirement, so the planner's
    // DisableUnnecessaryBucketedScan would read the files unbucketed;
    // pin autoBucketedScan off for the probe — the standard knob
    // (the BucketedIndexSpec device) — so the bucket-set pruning a
    // selective 100 TB probe relies on is visible
    val prev = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = TxRelation.read(spark, postT)
        .filter(col("term").isin(Pipeline.Bm25Terms: _*))
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+)".r
        .findFirstMatchIn(plan).map(_.group(1).toInt)
      sel.isDefined shouldBe true
      // ≤ one bucket per queried term, never the whole postings store
      sel.get should be <= Pipeline.Bm25Terms.size
      probe.count() should be > 0L
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("only probed-term postings feed the score assembly (corpus never re-aggregated)") {
    // the served plan's scans: postings (filtered to the probe terms)
    // and the stat-cell log — NO documents-table scan anywhere; the
    // global stats come from the O(#commits) cell merge
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sf)
    val plan = LexIndex.servedScores(spark, postT, statsT, tombT = None)
      .queryExecution.executedPlan.toString
    plan should not include "documents.parquet"
  }

  test("hybrid fusion served from the standing index ≡ the from-scratch fusion") {
    // the indexed tier is a physical re-plan of the same logical
    // contract (one oracle text gates both); pin the row-level identity
    // directly too
    val idx = SparkEntry.queries("q_hybrid_rrf_idx")(spark, sf)
      .collect().toSeq
    val scratch = SparkEntry.queries("q_hybrid_rrf")(spark, sf)
      .collect().toSeq
    idx shouldBe scratch
    idx.size should be > 0
  }

  test("physical compaction drops dead postings, reads unchanged") {
    val (postT, statsT, tombT) = LexIndex.buildDeleteIndex(spark, sf)
    def read() = LexIndex.servedScores(spark, postT, statsT, Some(tombT))
      .orderBy("doc_id").collect().toSeq
    val before = read()
    val rawRows = TxRelation.read(spark, postT).count()
    val rawCells = TxRelation.read(spark, statsT).count()
    LexIndex.compactLexIndex(spark, postT, statsT, tombT)
    TxRelation.read(spark, postT).count() should be < rawRows
    TxRelation.read(spark, statsT).count() should be < rawCells
    read() shouldBe before
  }
}
