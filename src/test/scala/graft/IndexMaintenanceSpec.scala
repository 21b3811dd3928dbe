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

  private val base = s"/tmp/graft_idxmaint_p${ProcessHandle.current.pid}"
  private def ownIdx(name: String) = s"$base/$name"
  private def rd(root: String) = graft.io.TxRelation.read(spark, root)

  test("admit cycle: flag → append kept docs → re-presented batch is all exact-dup") {
    // spec-owned tx index instances (the pristine standing index other
    // suites share is never mutated; suites run in parallel)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    graft.ops.Incremental.buildIndexTables(spark,
      graft.io.Tables.documents(spark, sf).filter(col("doc_id") % 10 < 8),
      ownIdx("fp"), ownIdx("band"), ownIdx("sig"))

    val batch = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))

    // day 1: flag against the spec-owned standing index
    val day1 = graft.ops.Incremental.incrDedupFlags(batch,
      rd(ownIdx("fp")), rd(ownIdx("band")), rd(ownIdx("sig"))).cache()
    val keptIds = day1.filter(col("kept") === 1).select("doc_id")
    val nKept = keptIds.count()
    nKept should be > 0L

    // admit the kept docs into the index (ATOMIC bucket-preserving
    // tx appends — one commit per index table)
    graft.ops.Incremental.admitBatch(spark, batch, keptIds,
      ownIdx("fp"), ownIdx("band"), ownIdx("sig"))

    // fp index stays unique-keyed after the append (the streaming
    // core's exact layer relies on join multiplicity 1)
    val fp = rd(ownIdx("fp"))
    fp.count() shouldBe fp.select("cfp").distinct().count()

    // the admission is a real tx commit: time travel below it sees the
    // pre-admission index
    graft.io.TxTable.snapshot(ownIdx("fp")).version shouldBe 1L
    graft.io.TxTable.read(spark, ownIdx("fp"), Some(0L)).count() should
      be < fp.count()

    // day 2: the SAME batch re-presented — every doc now collides with
    // its own admitted fingerprint (kept docs) or with whatever flagged
    // it on day 1 (dropped docs) → all exact or near dups, none kept
    val day2 = graft.ops.Incremental.incrDedupFlags(batch,
      rd(ownIdx("fp")), rd(ownIdx("band")), rd(ownIdx("sig")))
    day2.filter(col("kept") === 1).count() shouldBe 0L
    // specifically: every doc admitted on day 1 is an EXACT dup on day 2
    day2.join(keptIds, "doc_id")
      .filter(col("exact_dup") =!= 1).count() shouldBe 0L
    // and no day-1 duplicate became admittable
    day1.filter(col("kept") === 0).select("doc_id")
      .join(day2.filter(col("kept") === 1), "doc_id").count() shouldBe 0L
  }
}
