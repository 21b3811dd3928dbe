package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}
import graft.ops.Propagate

/** The library fan-out driver's own safety contract (r18 verdict item
  * "what's missing" #2): feed wiring, per-commit txn keying, and the
  * checkpoint-loss argument live in [[graft.ops.Propagate]] — these
  * cases drive the properties the capstone specs rely on, with a toy
  * consumer whose payload (a signed count cell) is deliberately
  * NON-idempotent so any double-application is loud. */
class PropagateSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val base = s"/tmp/graft_propagate_spec_p${ProcessHandle.current.pid}"
  private val App = "toy"

  private def freshCorpus(tag: String): String = {
    val corpT = s"$base/$tag/corpus"
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$base/$tag"))
    import spark.implicits._
    TxTable.create(spark, corpT,
      (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
      "doc_id", nFiles = 2)
    corpT
  }

  private def freshConsumer(tag: String): String = {
    val consT = s"$base/$tag/cons"
    TxTable.createEmpty(consT, StructType(Seq(
      StructField("n", LongType))), "n")
    consT
  }

  /** The toy application: one signed count cell per commit — the
    * [[graft.ops.Sketches]] CMS-cell shape, where a double-applied
    * commit corrupts the sum instead of no-oping. */
  private def applyCell(consT: String)(
      batch: org.apache.spark.sql.DataFrame, v: Long): Unit = {
    val n = batch.filter(col("change_type") === "delete").count()
    if (n > 0) {
      import spark.implicits._
      TxTable.appendBatch(spark, consT, App, v, Seq(n).toDF("n"), nFiles = 1)
    }
  }

  test("coalesced checkpoint-loss replay over a partially-applied history applies each commit exactly once") {
    val corpT = freshCorpus("coalesce")
    val consT = freshConsumer("coalesce")
    // three delete commits of known sizes
    val v1 = TxTable.deleteMorWhere(spark, corpT, col("doc_id") < 10) // 10
    val v2 = TxTable.deleteMorWhere(spark, corpT,
      col("doc_id").between(10, 14)) // 5
    val v3 = TxTable.deleteMorWhere(spark, corpT,
      col("doc_id").between(15, 17)) // 3
    // the consumer has applied THROUGH v2 (watermarks are monotone
    // applied-through versions), v3 not yet
    import spark.implicits._
    TxTable.appendBatch(spark, consT, App, v1, Seq(10L).toDF("n"), 1)
    TxTable.appendBatch(spark, consT, App, v2, Seq(5L).toDF("n"), 1)
    // catastrophic feed-checkpoint loss: a FRESH drain replays all
    // history, and the source COALESCES many commits per batch — the
    // driver must decompose by the commit_v stamp and key each
    // version independently; keying on the batch max would re-apply
    // v1/v2's pre-images under v3 and double-count
    Propagate.runFanoutLoop(spark, corpT, s"$base/coalesce/ckpt_lost",
      apply = applyCell(consT), maxVersionsPerBatch = 10) shouldBe true
    TxRelation.read(spark, consT).agg(sum(col("n"))).head.getLong(0) shouldBe
      (10L + 5L + 3L)
    TxTable.snapshot(consT).txns(App) shouldBe v3
    // a second full re-drain (another lost checkpoint) commits nothing
    val vCons = TxTable.versions(consT).max
    Propagate.runFanoutLoop(spark, corpT, s"$base/coalesce/ckpt_lost2",
      apply = applyCell(consT), maxVersionsPerBatch = 10) shouldBe true
    TxTable.versions(consT).max shouldBe vCons
  }

  test("subscribe parks the checkpoint: seed history never reaches a late-wired consumer") {
    val corpT = freshCorpus("sub")
    val consT = freshConsumer("sub")
    val ckpt = s"$base/sub/ckpt"
    // wire-at-build-time: the corpus create (and anything before the
    // subscription) must not flow into the consumer
    Propagate.subscribe(spark, corpT, ckpt) shouldBe true
    val vDel = TxTable.deleteMorWhere(spark, corpT, col("doc_id") < 7) // 7
    Propagate.runFanoutLoop(spark, corpT, ckpt,
      apply = applyCell(consT)) shouldBe true
    TxRelation.read(spark, consT).agg(sum(col("n"))).head.getLong(0) shouldBe 7L
    TxTable.snapshot(consT).txns(App) shouldBe vDel
  }

  test("post-drain maintenance runs only when due, and due-ness is manifest-only") {
    val corpT = freshCorpus("maint")
    val consT = freshConsumer("maint")
    val ckpt = s"$base/maint/ckpt"
    var ran = 0
    def hook(maxFiles: Int) = Propagate.Maintenance("toy",
      due = Propagate.logFilesExceed(consT, maxFiles),
      run = () => ran += 1)
    TxTable.deleteMorWhere(spark, corpT, col("doc_id") < 3)
    // consumer log has 1 file after the drain: threshold 8 → not due
    Propagate.runFanoutLoop(spark, corpT, ckpt,
      apply = applyCell(consT), maintenance = Seq(hook(8))) shouldBe true
    ran shouldBe 0
    // threshold 0 → due (the drain above landed one cell file)
    Propagate.runFanoutLoop(spark, corpT, ckpt,
      apply = applyCell(consT), maintenance = Seq(hook(0))) shouldBe true
    ran shouldBe 1
  }
}
