package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.io.{Tables, TxRelation, TxTable}
import graft.ops.LlmOps

/** Retraction contracts on the cell-probed (IVFPQ) serving tier that
  * the value oracle can't see (q_ann_ivfpq_del's survivor-chain
  * equality IS oracle-gated):
  *  - no tombstoned vector is ever served, and none remains in the
  *    compacted codes store (the deletion is physical);
  *  - the store shrank by exactly the deleted-row count, and the
  *    bucket layout + txn watermark survived compaction;
  *  - a replayed delete batch is a version-preserving no-op. */
class IvfRetractSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("served results and the compacted store exclude every deleted vector") {
    val served = LlmOps.queries("q_ann_ivfpq_del")(spark, sf)
    val deleted = Tables.embeddings(spark, sf).filter(LlmOps.isDeletedPq)
      .select(col("vec_id"))
    served.join(deleted, Seq("vec_id"), "left_semi").count() shouldBe 0L
    val (croot, _) = LlmOps.ensurePqDeleteStore(spark, sf)
    TxRelation.read(spark, croot)
      .join(deleted, Seq("vec_id"), "left_semi").count() shouldBe 0L
  }

  test("compaction removed exactly the deleted rows and kept the layout") {
    val (croot, _) = LlmOps.ensurePqDeleteStore(spark, sf)
    val nVec = Tables.embeddings(spark, sf).count()
    val nDeleted = Tables.embeddings(spark, sf)
      .filter(LlmOps.isDeletedPq).count()
    nDeleted should be > 0L // the fixture actually deletes something
    // codes are one row per (vec_id, m), M = 8 sub-vectors
    TxRelation.read(spark, croot).count() shouldBe (nVec - nDeleted) * 8
    val s = TxTable.snapshot(croot)
    s.bucketBy shouldBe Seq("ccid") // cell bucketing survives compaction
    s.nBuckets shouldBe 8
  }

  test("bucket pruning survives the tombstone mask and compaction") {
    // the retraction tier must keep the serving tier's scale property:
    // probed cells still push as bucket pruning on the compacted store
    val plan = LlmOps.queries("q_ann_ivfpq_del")(spark, sf)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    withClue(plan.linesIterator.filter(_.contains("Bucket"))
        .mkString("; ") + ": ") {
      m.isDefined shouldBe true
      m.get.group(1).toInt should be <= 6
    }
  }

  test("a replayed delete batch is a version-preserving no-op") {
    val (_, troot) = LlmOps.ensurePqDeleteStore(spark, sf)
    val v0 = TxTable.snapshot(troot).version
    val poison = Tables.embeddings(spark, sf).limit(3)
      .select(col("vec_id"), lit(9L).as("deleted_at_v"))
    TxTable.appendBatch(spark, troot, "ivfpq_del", 1L, poison) shouldBe v0
    TxTable.snapshot(troot).version shouldBe v0
  }
}
