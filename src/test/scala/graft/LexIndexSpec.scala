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

  test("the ENTRY's own served plan bucket-prunes — no session knob") {
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sf)
    val served = LexIndex.servedScores(spark, postT, statsT, tombT = None)
    val plan = served.queryExecution.executedPlan.toString
    // the posting-uniqueness fold keys on the bucket column, so the
    // scan's HashPartitioning(term) feeds it with zero Exchange and
    // DisableUnnecessaryBucketedScan keeps the bucketed scan — Spark's
    // own bucket set prunes the production plan (r18 verdict item 1)
    val sel = "SelectedBucketsCount: (\\d+)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    sel.isDefined shouldBe true
    sel.get should be <= Pipeline.Bm25Terms.size
    plan should not include "Bucketed: false"
    served.count() should be > 0L
  }

  test("the manifest itself bucket-prunes a bare literal probe (planner-robust)") {
    // even a probe with NO distribution requirement — the shape the
    // planner downgrades to an unbucketed scan — lists only the probed
    // terms' buckets' files: TxFileIndex.listFiles hashes the pushed
    // literals with the writer's own placement function, so the IO
    // property holds however the scan executes
    val (postT, _) = LexIndex.buildGrownIndex(spark, sf)
    val probe = TxRelation.read(spark, postT)
      .filter(col("term").isin(Pipeline.Bm25Terms: _*))
    val idx = idxOfFrame(probe)
    probe.count() should be > 0L
    val total = TxTable.snapshot(postT).files.size
    // grown fixture = 2 commits, ≤ 1 file per bucket per commit; the
    // 3 probed terms touch ≤ 3 of the 8 buckets
    idx.lastListedFiles should be <= Pipeline.Bm25Terms.size * 2
    idx.lastListedFiles should be < total
  }

  private def idxOfFrame(df: org.apache.spark.sql.DataFrame): graft.io.TxFileIndex =
    df.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
        org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          loc: graft.io.TxFileIndex, _, _, _, _, _), _, _, _, _) => loc
    }.get

  test("delete → compact → re-admit: the folded tombstone no longer masks the re-insert") {
    // the full lifecycle the change feed can produce (r18 advice):
    // retraction tombstones a doc, compaction purges its postings AND
    // folds the consumed tombstone away, a later commit re-admits the
    // same doc_id — served scores must see it again
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("lexreinsert").toString
    val (postT, statsT, tombT) = (s"$dir/post", s"$dir/stats", s"$dir/tomb")
    LexIndex.buildLexTables(spark, docs, postT, statsT)
    TxTable.createTombTable(tombT, "doc_id")
    val dropped = docs.filter(Incremental.isDroppedDoc)
    LexIndex.retractDocs(spark, dropped, tombT, statsT, deletedAtV = 1L,
      txn = Some(("lex_reins", 1L)))
    LexIndex.compactLexIndex(spark, postT, statsT, tombT)
    TxRelation.read(spark, tombT).count() shouldBe 0L
    LexIndex.admitDocs(spark, dropped, postT, statsT,
      txn = Some(("lex_reins", 2L)))
    val served = LexIndex.servedScores(spark, postT, statsT, Some(tombT))
      .orderBy("doc_id").collect().toSeq
    val scratch = Pipeline.bm25ScoresOf(docs)
      .filter(col("score") > 0).orderBy("doc_id").collect().toSeq
    served shouldBe scratch
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("multi-probe serve: one pruned pass over the postings store serves the whole batch") {
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sf)
    val probes = spark.createDataFrame(LexIndex.MultiProbes)
      .toDF("query_id", "term")
    val served = LexIndex.servedScoresMulti(spark, postT, statsT,
      tombT = None, probes, LexIndex.MultiProbes.map(_._2).distinct)
    val plan = served.queryExecution.executedPlan.toString
    // scan count is independent of the batch size: the postings store
    // appears ONCE (df rides a window over the same pass), bucketed and
    // bucket-pruned, with the probe relation broadcast over it
    java.util.regex.Pattern.quote(postT).r.findAllIn(plan).size shouldBe 1
    plan should include("SelectedBucketsCount")
    plan should not include "Bucketed: false"
    val n = served.count()
    n should be > 0L
    n should be <= 40L // 4 queries × top-10
  }

  test("multi-probe serve under retraction ≡ rebuilt-from-survivors serve") {
    val probes = spark.createDataFrame(LexIndex.MultiProbes)
      .toDF("query_id", "term")
    val terms = LexIndex.MultiProbes.map(_._2).distinct
    val (postT, statsT, tombT) = LexIndex.buildDeleteIndex(spark, sf)
    val served = LexIndex.servedScoresMulti(spark, postT, statsT,
      Some(tombT), probes, terms).collect().toSeq
    // ground truth: an index rebuilt from scratch on the survivor
    // corpus must serve the identical batch result
    val dir = java.nio.file.Files.createTempDirectory("lexmulti").toString
    val survivors = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(!Incremental.isDroppedDoc)
    LexIndex.buildLexTables(spark, survivors, s"$dir/post", s"$dir/stats")
    val rebuilt = LexIndex.servedScoresMulti(spark, s"$dir/post",
      s"$dir/stats", tombT = None, probes, terms).collect().toSeq
    served shouldBe rebuilt
    served.size should be > 0
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
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
