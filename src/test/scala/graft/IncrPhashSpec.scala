package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}
import graft.ops.Multimodal

/** Lifecycle pins for the STANDING image-phash index (r16 verdict item
  * 3 — the multimodal mirror of the Incremental dedup-index contract):
  * exactly-once admission, retraction ≡ a fresh index on the survivor
  * corpus, compaction read-equivalence with physical deletion, and
  * replayed delete absorption. The zero-Exchange plan pin for the
  * corpus side of the band join lives in BucketedIndexSpec with its
  * text-tier siblings. */
class IncrPhashSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("admission is exactly-once and admitted hashes serve immediately") {
    val root = "/tmp/graft_txphash_spec_adm_p" + ProcessHandle.current.pid
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    // a small corpus slice as the standing index
    val corpus = spark.range(0, 50).select(col("id").as("doc_id"),
      (col("id") * 7919 + 13).as("phash_hi"), (col("id") * 104729 + 7).as("phash_lo"))
    Multimodal.buildPhashTable(spark, corpus, root)
    val v0 = TxTable.versions(root).max
    // admit a 10-image batch exactly-once...
    val batch = spark.range(50, 60).select(col("id").as("doc_id"),
      (col("id") * 7919 + 13).as("phash_hi"), (col("id") * 104729 + 7).as("phash_lo"))
    Multimodal.admitPhashBatch(spark, root, batch, txn = Some(("spec_adm", 1L)))
    val v1 = TxTable.versions(root).max
    v1 should be > v0
    // ...a replayed admission is absorbed wholesale
    Multimodal.admitPhashBatch(spark, root, batch, txn = Some(("spec_adm", 1L)))
    TxTable.versions(root).max shouldBe v1
    TxRelation.read(spark, root).filter(col("doc_id") >= 50).count() shouldBe 40L
    // probes carrying an admitted image's exact hash under NEW ids find
    // it at hamming 0 — the admitted rows serve without a rebuild
    val probes = Multimodal.phashBandsFolded(
      batch.select((col("doc_id") + 1000000).as("doc_id"),
        col("phash_hi"), col("phash_lo")))
    val res = Multimodal.phashNearAgainst(probes, TxRelation.read(spark, root))
      .collect()
    res.length shouldBe 10
    res.foreach { r =>
      r.getAs[Int]("hamming") shouldBe 0
      r.getAs[Long]("nbr") shouldBe (r.getAs[Long]("doc_id") - 1000000)
    }
  }

  test("retraction ≡ fresh index on the survivor corpus; compaction is physical and read-equivalent") {
    val masked = SparkEntry.queries("q_incr_phash_del")(spark, sf).collect().toSeq
    masked.size should be > 0
    // fresh-rebuild truth: band the survivor corpus in-query (no store)
    val docs = graft.io.Tables.documents(spark, sf)
    val hashed = Multimodal.phashBandsFolded(
      SparkEntry.queries("q_mm_phash_dedup")(spark, sf)
        .select(col("doc_id"), col("phash_hi"), col("phash_lo")))
    val survivors = hashed.join(
      docs.filter(col("doc_id") % 10 < 8 && col("doc_id") % 10 =!= 7)
        .select("doc_id"), "doc_id")
    val batch = hashed.join(
      docs.filter(col("doc_id") % 10 >= 8).select("doc_id"), "doc_id")
    val truth = Multimodal.phashNearAgainst(batch, survivors)
      .orderBy("doc_id").collect().toSeq
    masked shouldBe truth
    // physical deletion: compaction removes tombstoned rows from the
    // files, keeps every survivor row, and reads are unchanged
    val (bandT, tombT) = Multimodal.buildPhashDeleteIndex(spark, sf)
    val liveBefore = Multimodal.livePhashIndex(spark, bandT, tombT).count()
    val rawBefore = TxRelation.read(spark, bandT).count()
    rawBefore should be > liveBefore // tombstoned rows still physical
    Multimodal.compactPhashIndex(spark, bandT, tombT)
    TxRelation.read(spark, bandT).count() shouldBe liveBefore
    val after = SparkEntry.queries("q_incr_phash_del")(spark, sf).collect().toSeq
    after shouldBe masked
  }

  test("a replayed delete batch is a version-preserving no-op") {
    val (bandT, tombT) = Multimodal.buildPhashDeleteIndex(spark, sf)
    val v = TxTable.versions(tombT).max
    graft.ops.Incremental.retractDocs(spark,
      graft.io.Tables.documents(spark, sf)
        .filter(col("doc_id") % 10 === 7).select(col("doc_id")),
      tombT, deletedAtV = 1L, txn = Some(("incr_phash_del", 1L)))
    TxTable.versions(tombT).max shouldBe v
    val _ = bandT
  }
}
