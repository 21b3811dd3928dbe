package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Incremental

/** Multi-increment SOAK of the standing dedup index: three synthetic
  * "days" chained through flag → admit, each day carrying fresh docs
  * plus clones of docs admitted the previous day. Pins the APPEND path
  * (IndexMaintenanceSpec pins one cycle): after two admissions, day 3
  * flagged against the incrementally-maintained tables must equal
  * day 3 flagged against an index REBUILT FROM SCRATCH over
  * corpus ∪ kept(day1) ∪ kept(day2) — i.e. chained bucketed appends
  * never drift from the ground-truth index state (now on the tx tier —
  * each admission is an atomic bucket-preserving commit). */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class IndexSoakSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val base = s"/tmp/graft_idxsoak_p${ProcessHandle.current.pid}"

  private def writeIdx(prefix: String, corpus: DataFrame): (String, String, String) = {
    val (fpT, bandT, sigT) =
      (s"$base/${prefix}_fp", s"$base/${prefix}_band", s"$base/${prefix}_sig")
    Seq(fpT, bandT, sigT).foreach(t =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t)))
    Incremental.buildIndexTables(spark, corpus, fpT, bandT, sigT)
    (fpT, bandT, sigT)
  }

  private def flagRows(df: DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("3-day flag→admit chain equals a from-scratch index of the union at day 3") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val batch = docs.filter(col("doc_id") % 10 >= 8).cache()

    // day i carries its own slice plus clones of 3 docs KEPT the
    // previous day (new ids, identical text) — the cross-day dup case
    // only a correctly-maintained index can catch
    def slice(i: Int): DataFrame = batch.filter(col("doc_id") % 3 === i)
    def clonesOf(kept: DataFrame, dayDocs: DataFrame, tag: Int): DataFrame =
      dayDocs.join(kept.select("doc_id"), "doc_id")
        .orderBy("doc_id").limit(3)
        .select((col("doc_id") + lit(1000000L * tag)).as("doc_id"), col("text"))

    val (fpT, bandT, sigT) = writeIdx("soak_incr", corpus)
    def idx = (graft.io.TxRelation.read(spark, fpT),
      graft.io.TxRelation.read(spark, bandT),
      graft.io.TxRelation.read(spark, sigT))

    // --- day 1
    val day1 = slice(0)
    val f1 = Incremental.incrDedupFlags(day1, idx._1, idx._2, idx._3).cache()
    val kept1 = f1.filter(col("kept") === 1).select("doc_id").cache()
    kept1.count() should be > 0L
    Incremental.admitBatch(spark, day1, kept1, fpT, bandT, sigT)

    // --- day 2: fresh slice + clones of day-1 admissions
    val day2 = slice(1).union(clonesOf(kept1, day1, 1)).cache()
    val f2 = Incremental.incrDedupFlags(day2, idx._1, idx._2, idx._3).cache()
    // every clone of an admitted doc must flag as an exact dup
    f2.filter(col("doc_id") >= 1000000L)
      .filter(col("exact_dup") =!= 1).count() shouldBe 0L
    val kept2 = f2.filter(col("kept") === 1).select("doc_id").cache()
    Incremental.admitBatch(spark, day2, kept2, fpT, bandT, sigT)

    // --- day 3: fresh slice + clones of day-2 admissions
    val day3 = slice(2).union(clonesOf(kept2, day2, 2)).cache()
    val incremental = flagRows(
      Incremental.incrDedupFlags(day3, idx._1, idx._2, idx._3))

    // from-scratch ground truth: rebuild the index over the union of
    // the corpus and everything admitted across the two days
    val admitted = day1.join(kept1, "doc_id").union(day2.join(kept2, "doc_id"))
    val (ffp, fband, fsig) = writeIdx("soak_fresh", corpus.union(admitted))
    val fromScratch = flagRows(Incremental.incrDedupFlags(day3,
      graft.io.TxRelation.read(spark, ffp),
      graft.io.TxRelation.read(spark, fband),
      graft.io.TxRelation.read(spark, fsig)))

    incremental shouldBe fromScratch
    incremental.length.toLong shouldBe day3.count()
    // day-3 clones again read as exact dups of their day-2 originals
    incremental.filter(_._1 >= 2000000L).foreach { case (_, exact, _, kept) =>
      exact shouldBe 1L
      kept shouldBe 0L
    }
  }
}
