package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable
import graft.ops.GraphAnn

/** The graph-ANN admission tier's DAILY LOOP as a real streaming
  * pipeline — the twin of StreamingDailyLoopSpec for the dedup indexes:
  * vectors land in the corpus tx table through the `tx` streaming sink
  * (exactly-once via the txn watermark), the `tx-cdf` feed hands each
  * micro-batch's inserts to [[GraphAnn.admitVectors]], and admission
  * itself is exactly-once — the edge and band stores record
  * (appId, batchId) with their commits, so a foreachBatch replay
  * (crash between store commit and engine-checkpoint advance) commits
  * nothing. The end state is pinned by the tier's core contract: the
  * incrementally-admitted graph is ROW-IDENTICAL to a from-scratch
  * rebuild over the same total vector set. */
class GraphDailyLoopSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val base = s"/tmp/graft_gdl_p${ProcessHandle.current.pid}"
  private val root = s"$base/vectors"
  private val eroot = s"$base/edges"
  private val broot = s"$base/bands"
  private val troot = s"$base/tombs"

  private def ingest(srcDir: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("tx")
      .option("root", root).option("appId", "gdl_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
  }

  /** Drain the change feed through THE library fan-out driver
    * ([[graft.ops.Propagate.runFanoutLoop]]): admissions/retractions
    * key on the CORPUS COMMIT VERSION the driver derives — never the
    * streaming batchId (the capstones' r17 hazard, fixed here too) —
    * then immediately replay each delivery to pin the txn watermark's
    * absorption. */
  private def consumeFeed(ckpt: String): Unit = {
    graft.ops.Propagate.runFanoutLoop(spark, root, ckpt,
      apply = { (batch, commitV) =>
        val inserts = batch.filter(col("change_type") === "insert")
          .select(col("vec_id"), col("embedding"))
        if (!inserts.isEmpty) {
          GraphAnn.admitVectors(spark, inserts, eroot, broot,
            txn = Some(("gdl_admit", commitV)))
          val ve = TxTable.versions(eroot).max
          val vb = TxTable.versions(broot).max
          // a replayed admission of the SAME commit commits nothing
          GraphAnn.admitVectors(spark, inserts, eroot, broot,
            txn = Some(("gdl_admit", commitV)))
          TxTable.versions(eroot).max shouldBe ve
          TxTable.versions(broot).max shouldBe vb
        }
        // a DELETE commit flows through the same feed as a retraction
        // (tombstone + re-link), exactly-once under its own appId
        val deletes = batch.filter(col("change_type") === "delete")
          .select(col("vec_id"))
        if (!deletes.isEmpty) {
          GraphAnn.retractVectors(spark, deletes, eroot, broot, troot,
            deletedAtV = commitV, txn = Some(("gdl_del", commitV)))
          val ve = TxTable.versions(eroot).max
          val vt = TxTable.versions(troot).max
          GraphAnn.retractVectors(spark, deletes, eroot, broot, troot,
            deletedAtV = commitV, txn = Some(("gdl_del", commitV)))
          TxTable.versions(eroot).max shouldBe ve
          TxTable.versions(troot).max shouldBe vt
        }
      }, timeoutMs = 120000) shouldBe true
  }

  private def sorted(df: DataFrame) =
    df.select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")

  test("streaming sink → streaming CDF → graph admission ≡ rebuild") {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val e = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // day 0: standing corpus + standing stores (scheme fixed at the
    // corpus's occupancy bits — bitsFor(80%·n) == bitsFor(n) here, the
    // identity-with-rebuild precondition the tier documents)
    val corpus = e.filter(col("vec_id") % 10 < 8)
    TxTable.create(spark, root, corpus, "vec_id", nFiles = 4)
    GraphAnn.buildAnnStores(spark, corpus, eroot, broot)
    GraphAnn.createTombTable(troot)
    val sinkCkpt = s"$base/sink_ckpt"
    val feedCkpt = s"$base/feed_ckpt"

    // day 1 arrives as files; the sink lands it exactly once
    val day1 = e.filter(col("vec_id") % 10 === 8)
    val src = s"$base/incoming"
    day1.coalesce(1).write.mode("append").parquet(src)
    ingest(src, sinkCkpt)
    TxTable.countRows(root) shouldBe corpus.count() + day1.count()
    val vDay1 = TxTable.versions(root).max
    // catastrophic engine-checkpoint loss on the SINK: re-ingest from
    // scratch — the table's txn watermark absorbs every replayed batch
    ingest(src, s"$base/sink_ckpt_lost")
    TxTable.versions(root).max shouldBe vDay1

    consumeFeed(feedCkpt)

    // day 2: more vectors through the SAME pipeline (next batch ids)
    val day2 = e.filter(col("vec_id") % 10 === 9)
    day2.coalesce(1).write.mode("append").parquet(src)
    ingest(src, sinkCkpt)
    consumeFeed(feedCkpt) // same feed checkpoint: resumes past day 1

    // the tier's contract: the admitted graph is row-identical to a
    // from-scratch rebuild over the full vector set
    val admitted = sorted(GraphAnn.readGraph(spark, eroot, sf)).collect()
    val rebuilt = sorted(GraphAnn.knnEdges(spark, sf)).collect()
    admitted shouldBe rebuilt

    // day 3: a takedown — a DELETE commit on the corpus table flows
    // through the SAME change feed into serving as a retraction
    // (tombstone + re-link, exactly-once), and the served live graph
    // is row-identical to a from-scratch rebuild over the survivors
    TxTable.deleteMorWhere(spark, root, col("vec_id") % 10 === 7)
    consumeFeed(feedCkpt)
    TxTable.countRows(troot) shouldBe
      e.filter(col("vec_id") % 10 === 7).count()
    val servedLive =
      sorted(GraphAnn.readGraphLive(spark, eroot, troot, sf)).collect()
    val rebuiltLive = sorted(GraphAnn.knnEdgesFrom(spark,
      e.filter(col("vec_id") % 10 =!= 7))).collect()
    servedLive shouldBe rebuiltLive
  }
}
