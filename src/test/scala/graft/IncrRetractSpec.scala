package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable
import graft.ops.Incremental

/** Retraction in the standing dedup indexes (r15 verdict item 3):
  * tombstone-masked reads must equal a FRESH index build on the
  * surviving corpus, delete admission must be exactly-once under the
  * txn watermark, the shared-text fingerprint subtlety must resolve
  * through the doc→fp sidecar (drop one twin → the fp lives; drop
  * both → it dies), and per-bucket compaction must shed the dead rows
  * without changing any read. The oracled entry (q_incr_dedup_del)
  * gates the same rebuild contract against DuckDB at the fixture
  * split; this spec owns the corners the oracle can't see. */
class IncrRetractSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  // pid LAST so Housekeeping's dead-pid reaper (prefix graft_txidx_,
  // trailing _p<pid>) covers these spec-owned roots
  private def roots(tag: String) = {
    def r(kind: String) =
      s"/tmp/graft_txidx_rtspec_${tag}_${kind}_p${ProcessHandle.current.pid}"
    (r("fp"), r("band"), r("sig"), r("dfp"), r("tomb"))
  }

  // corpus: doc 0/1 are exact twins; docs 2,3 near-dup (shingle overlap)
  // via long shared prefixes; doc 4 unique. batch docs probe each layer.
  private def mk(id: Long, text: String) = (id, text)
  private val twin = "alpha beta gamma delta epsilon zeta eta theta iota"
  private val nearA = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen"
  private def corpus = Seq(
    mk(0L, twin), mk(1L, twin), mk(2L, nearA),
    mk(3L, "solo doc with entirely distinct words here")
  ).toDF("doc_id", "text")
  private def batch = Seq(
    mk(100L, twin), // exact hit while ANY twin lives
    mk(101L, nearA + " sixteen"), // near hit while doc 2 lives
    mk(102L, "completely novel text nothing shared at all")
  ).toDF("doc_id", "text")

  private def buildAll(tag: String) = {
    val (fpT, bandT, sigT, dfpT, tombT) = roots(tag)
    Seq(fpT, bandT, sigT, dfpT, tombT).foreach { r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    }
    Incremental.buildIndexTables(spark, corpus, fpT, bandT, sigT)
    Incremental.buildDocFpTable(spark, corpus, dfpT)
    Incremental.createDocTombTable(tombT)
    (fpT, bandT, sigT, dfpT, tombT)
  }

  private def flags(fpT: String, bandT: String, sigT: String,
      dfpT: String, tombT: String): Seq[(Long, Long, Long, Long)] = {
    val (fp, band, sig) =
      Incremental.liveIndexes(spark, fpT, bandT, sigT, dfpT, tombT)
    Incremental.idxFlagsFor(batch, fp, band, sig)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  private def freshFlags(survivors: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val (fpT, bandT, sigT, dfpT, tombT) = roots("fresh")
    Seq(fpT, bandT, sigT, dfpT, tombT).foreach { r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    }
    Incremental.buildIndexTables(spark, survivors, fpT, bandT, sigT)
    Incremental.buildDocFpTable(spark, survivors, dfpT)
    Incremental.createDocTombTable(tombT)
    flags(fpT, bandT, sigT, dfpT, tombT)
  }

  test("drop one exact twin: the fingerprint lives through the sidecar; " +
    "drop both: it dies — masked reads ≡ fresh index on survivors") {
    val (fpT, bandT, sigT, dfpT, tombT) = buildAll("tw")
    // baseline: everything live
    flags(fpT, bandT, sigT, dfpT, tombT) shouldBe
      freshFlags(corpus)
    // drop doc 0 — doc 1 still holds the twin text: exact hit survives
    Incremental.retractDocs(spark, Seq(0L).toDF("doc_id"), tombT,
      deletedAtV = 1L, txn = Some(("rt", 1L)))
    val afterOne = flags(fpT, bandT, sigT, dfpT, tombT)
    afterOne shouldBe freshFlags(corpus.filter(col("doc_id") =!= 0L))
    afterOne.find(_._1 == 100L).get._2 shouldBe 1L // exact_dup still 1
    // drop doc 1 too — no live holder: the fp must leave the exact layer
    Incremental.retractDocs(spark, Seq(1L).toDF("doc_id"), tombT,
      deletedAtV = 2L, txn = Some(("rt", 2L)))
    val afterBoth = flags(fpT, bandT, sigT, dfpT, tombT)
    afterBoth shouldBe freshFlags(corpus.filter(col("doc_id") > 1L))
    afterBoth.find(_._1 == 100L).get._2 shouldBe 0L
    // drop the near-dup source: the banded candidate disappears
    Incremental.retractDocs(spark, Seq(2L).toDF("doc_id"), tombT,
      deletedAtV = 3L, txn = Some(("rt", 3L)))
    val afterNear = flags(fpT, bandT, sigT, dfpT, tombT)
    afterNear shouldBe freshFlags(corpus.filter(col("doc_id") > 2L))
    afterNear.find(_._1 == 101L).get._3 shouldBe 0L // near_dup gone
  }

  test("delete admission is exactly-once; re-deletes are row no-ops") {
    val (fpT, bandT, sigT, dfpT, tombT) = buildAll("eo")
    Incremental.retractDocs(spark, Seq(0L, 2L).toDF("doc_id"), tombT,
      deletedAtV = 1L, txn = Some(("rt_eo", 1L)))
    val vt = TxTable.versions(tombT).max
    TxTable.countRows(tombT) shouldBe 2L
    // replayed batch (foreachBatch restart): absorbed wholesale
    Incremental.retractDocs(spark, Seq(0L, 2L).toDF("doc_id"), tombT,
      deletedAtV = 1L, txn = Some(("rt_eo", 1L)))
    TxTable.versions(tombT).max shouldBe vt
    // later batch re-deleting a dead id adds no row for it
    Incremental.retractDocs(spark, Seq(0L, 3L).toDF("doc_id"), tombT,
      deletedAtV = 2L, txn = Some(("rt_eo", 2L)))
    TxTable.countRows(tombT) shouldBe 3L
    val _ = (fpT, bandT, sigT, dfpT)
  }

  test("compaction sheds dead rows without changing the masked reads") {
    val (fpT, bandT, sigT, dfpT, tombT) = buildAll("cp")
    Incremental.retractDocs(spark, Seq(0L, 2L).toDF("doc_id"), tombT,
      deletedAtV = 1L)
    val before = flags(fpT, bandT, sigT, dfpT, tombT)
    val (b0, s0, f0, d0) = (TxTable.countRows(bandT), TxTable.countRows(sigT),
      TxTable.countRows(fpT), TxTable.countRows(dfpT))
    Incremental.compactIndexes(spark, fpT, bandT, sigT, dfpT, tombT)
    TxTable.countRows(bandT) should be < b0
    TxTable.countRows(sigT) should be < s0
    TxTable.countRows(fpT) should be < f0 // doc 2's unique fp died
    TxTable.countRows(dfpT) should be < d0
    flags(fpT, bandT, sigT, dfpT, tombT) shouldBe before
  }
}
