package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.io.{TxRelation, TxTable}
import graft.ops.Sketches

/** Standing-sketch-tier contracts the oracle can't see (q_incr_hll's
  * value equality to the from-scratch sketch IS oracle-gated — these
  * pin the maintenance semantics around it):
  *  - exactly-once ingest-day admission: a replayed (appId, batchId)
  *    append is a version-preserving no-op even with different rows;
  *  - fold invariance: compacting the register LOG to the min-merged
  *    registers (the bounded sources·m standing form) changes neither
  *    the row-count bound nor a single served estimate. */
class IncrSketchSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("served estimate equals the from-scratch whole-corpus sketch") {
    val inc = Sketches.qIncrHll(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val full = Sketches.qHllEst(spark, sf)
      .select(col("source"), col("hll_est"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    inc should contain theSameElementsInOrderAs full
  }

  test("a replayed ingest day is a version-preserving no-op") {
    val root = Sketches.buildIncrHll(spark, sf)
    val v0 = TxTable.snapshot(root).version
    // replay day 1 with DIFFERENT rows — the txn watermark must
    // short-circuit before anything is written
    val poison = TxRelation.read(spark, root)
      .select(col("source"), col("idx"), lit(1L).as("weight"))
    TxTable.appendBatch(spark, root, "incr_hll", 1L, poison) shouldBe v0
    TxTable.snapshot(root).version shouldBe v0
  }

  test("cms: served estimates equal the from-scratch corpus sketch") {
    val inc = Sketches.qIncrCms(spark, sf).collect().toSeq
    val full = Sketches.qCmsFreq(spark, sf)
      .select(col("tok"), col("exact_cnt"), col("cms_est"))
      .collect().toSeq
    inc shouldBe full
  }

  test("cms: a replayed ingest day is a version-preserving no-op") {
    val root = Sketches.buildIncrCms(spark, sf)
    val v0 = TxTable.snapshot(root).version
    val poison = TxRelation.read(spark, root)
      .select(col("j"), col("bucket"), lit(999L).as("cnt")).limit(2)
    TxTable.appendBatch(spark, root, "incr_cms", 2L, poison) shouldBe v0
    TxTable.snapshot(root).version shouldBe v0
  }

  test("cms: folding the cell log preserves estimates and bounds the store") {
    val root = Sketches.buildIncrCms(spark, sf)
    val before = Sketches.qIncrCms(spark, sf).collect().toSeq
    val folded = TxRelation.read(spark, root)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt")).cache()
    folded.count()
    TxTable.overwrite(spark, root, folded, nFiles = 1)
    folded.unpersist()
    TxRelation.read(spark, root).count() should be <= 3L * 1024L
    Sketches.qIncrCms(spark, sf).collect().toSeq shouldBe before
  }

  test("cms: retraction is isolated — q_incr_cms's log never sees the negation") {
    // run the delete entry first, then the plain entry: the latter must
    // still serve the FULL corpus sketch (own store roots)
    Sketches.qIncrCmsDel(spark, sf).collect()
    val inc = Sketches.qIncrCms(spark, sf).collect().toSeq
    val full = Sketches.qCmsFreq(spark, sf)
      .select(col("tok"), col("exact_cnt"), col("cms_est"))
      .collect().toSeq
    inc shouldBe full
  }

  test("cms: a replayed retraction is a version-preserving no-op") {
    Sketches.qIncrCmsDel(spark, sf).collect() // ensure the negation landed
    val root = Sketches.buildIncrCms(spark, sf, kind = "d")
    val v0 = TxTable.snapshot(root).version
    val poison = TxRelation.read(spark, root)
      .select(col("j"), col("bucket"), lit(-7L).as("cnt")).limit(2)
    TxTable.appendBatch(spark, root, "incr_cms_del", 1L, poison) shouldBe v0
    TxTable.snapshot(root).version shouldBe v0
  }

  test("qsketch: served estimates equal the from-scratch corpus sketch") {
    val inc = Sketches.qIncrQsketch(spark, sf).collect().toSeq
    val full = Sketches.qQuantileSketch(spark, sf)
      .select(col("l_returnflag"), col("n"), col("m"),
        col("p50_est"), col("p90_est"), col("p99_est"))
      .collect().toSeq
    inc shouldBe full
  }

  test("qsketch: a replayed ingest day is a version-preserving no-op on both logs") {
    val (sroot, proot) = Sketches.buildIncrQsk(spark, sf)
    val vs = TxTable.snapshot(sroot).version
    val vp = TxTable.snapshot(proot).version
    val poisonS = TxRelation.read(spark, sroot)
      .select(col("gk"), col("grp"), lit(1L).as("n")).limit(1)
    val poisonP = TxRelation.read(spark, proot).limit(1)
    TxTable.appendBatch(spark, sroot, "incr_qsk", 2L, poisonS) shouldBe vs
    TxTable.appendBatch(spark, proot, "incr_qsk", 2L, poisonP) shouldBe vp
    TxTable.snapshot(sroot).version shouldBe vs
    TxTable.snapshot(proot).version shouldBe vp
  }

  test("qsketch: folding the logs preserves estimates and bounds the store") {
    val (sroot, proot) = Sketches.buildIncrQsk(spark, sf)
    val before = Sketches.qIncrQsketch(spark, sf).collect().toSeq
    Sketches.foldIncrQsk(spark, sroot, proot)
    val groups = TxRelation.read(spark, sroot).count() // one row per grp now
    TxRelation.read(spark, proot).count() should be <= groups * 3 * 256
    Sketches.qIncrQsketch(spark, sf).collect().toSeq shouldBe before
  }

  test("hll retention: dropping a day's segments serves the survivor sketch; fold invariant") {
    val served = Sketches.qIncrHllDel(spark, sf).collect().toSeq
    // physical drop: fold the log to the surviving days' min-merge
    val root = Sketches.buildIncrHllDel(spark, sf)
    val survivors = TxRelation.read(spark, root)
      .filter(col("day") =!= 1)
      .groupBy("source", "idx").agg(min(col("weight")).as("weight"))
      .select(lit(0L).as("day"), col("source"), col("idx"), col("weight"))
      .cache()
    survivors.count()
    TxTable.overwrite(spark, root, survivors, nFiles = 1)
    survivors.unpersist()
    Sketches.qIncrHllDel(spark, sf).collect().toSeq shouldBe served
  }

  test("folding the register log preserves every estimate and bounds the store") {
    val root = Sketches.buildIncrHll(spark, sf)
    val before = Sketches.qIncrHll(spark, sf).collect().toSeq
    val folded = TxRelation.read(spark, root)
      .groupBy("source", "idx").agg(min(col("weight")).as("weight"))
      .cache()
    val nSources = graft.io.Tables.documents(spark, sf)
      .select("source").distinct().count()
    TxTable.overwrite(spark, root, folded, nFiles = 1)
    folded.unpersist()
    val rows = TxRelation.read(spark, root).count()
    rows should be <= nSources * 256
    Sketches.qIncrHll(spark, sf).collect().toSeq shouldBe before
  }
}
