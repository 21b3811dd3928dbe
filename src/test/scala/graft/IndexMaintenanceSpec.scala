package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The full daily-ingest CYCLE over the standing dedup index: flag a
  * batch against the index, ADMIT the kept docs (append-mode writes
  * into the same bucket layout — no corpus re-shuffle, each day only
  * adds its own bucketed files), then re-present the same batch and
  * verify every doc is now an exact duplicate of the (updated) corpus.
  * Runs on spec-owned COPIES of the standing tables so the pristine
  * index other suites share is never mutated (suites run in parallel).
  */
class IndexMaintenanceSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def copyTable(src: String, dst: String, bucketCols: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $dst")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$dst"))
    spark.table(src).write
      .bucketBy(8, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(dst)
  }

  test("admit cycle: flag → append kept docs → re-presented batch is all exact-dup") {
    val (fpT, bandT, sigT) = graft.ops.Incremental.buildIndexes(spark, sf)
    copyTable(fpT, "m_fp_idx", Seq("cfp"))
    copyTable(bandT, "m_band_idx", Seq("band", "bkey"))
    copyTable(sigT, "m_sig_idx", Seq("doc_id"))

    val batch = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))

    // day 1: flag against the copied standing index
    val day1 = graft.ops.Incremental.incrDedupFlags(batch,
      spark.table("m_fp_idx"), spark.table("m_band_idx"),
      spark.table("m_sig_idx")).cache()
    val keptIds = day1.filter(col("kept") === 1).select("doc_id")
    val nKept = keptIds.count()
    nKept should be > 0L

    // admit the kept docs into the index (append, same bucket layout)
    graft.ops.Incremental.admitBatch(spark, batch, keptIds,
      "m_fp_idx", "m_band_idx", "m_sig_idx")

    // fp index stays unique-keyed after the append (the streaming
    // core's exact layer relies on join multiplicity 1)
    val fp = spark.table("m_fp_idx")
    fp.count() shouldBe fp.select("cfp").distinct().count()

    // day 2: the SAME batch re-presented — every doc now collides with
    // its own admitted fingerprint (kept docs) or with whatever flagged
    // it on day 1 (dropped docs) → all exact or near dups, none kept
    val day2 = graft.ops.Incremental.incrDedupFlags(batch,
      spark.table("m_fp_idx"), spark.table("m_band_idx"),
      spark.table("m_sig_idx"))
    day2.filter(col("kept") === 1).count() shouldBe 0L
    // specifically: every doc admitted on day 1 is an EXACT dup on day 2
    day2.join(keptIds, "doc_id")
      .filter(col("exact_dup") =!= 1).count() shouldBe 0L
    // and no day-1 duplicate became admittable
    day1.filter(col("kept") === 0).select("doc_id")
      .join(day2.filter(col("kept") === 1), "doc_id").count() shouldBe 0L
  }
}
