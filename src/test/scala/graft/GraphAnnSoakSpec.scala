package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable
import graft.ops.GraphAnn

/** Randomized soak of the graph-ANN standing-store tier — the
  * IndexSoakSpec/TxModelFuzzSpec discipline applied to vector
  * admission: from a seeded RNG, admit the non-corpus batches in a
  * RANDOM order with RANDOM immediate/stale replays and RANDOM
  * interleaved per-bucket compactions, then require the tier's core
  * contract — the standing graph is row-identical to a from-scratch
  * rebuild over the full vector set — plus watermark absorption at
  * every replay point. The daily loop's happy path is GraphDailyLoopSpec;
  * this drives the orderings a real fleet produces (crash-replays after
  * progress, maintenance racing admissions in commit order). */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class GraphAnnSoakSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("random admit order + replays + interleaved compactions ≡ rebuild") {
    val rnd = new scala.util.Random(4242)
    val base = s"/tmp/graft_anngraph_soak_p${ProcessHandle.current.pid}"
    val eroot = s"$base/e"
    val broot = s"$base/b"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val e = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // corpus = 70% (bitsFor(0.7n) == bitsFor(n) at every test SF — the
    // tier's identity precondition); batches 7/8/9 admitted in a
    // seeded-random order
    def part(b: Int) = e.filter(col("vec_id") % 10 === b)
    GraphAnn.buildAnnStores(spark, e.filter(col("vec_id") % 10 < 7),
      eroot, broot)
    val order = rnd.shuffle(Seq(7, 8, 9))
    var admitted = List.empty[(Int, Long)] // (bucket, batchId) history
    order.zipWithIndex.foreach { case (b, i) =>
      val bid = i.toLong
      GraphAnn.admitVectors(spark, part(b), eroot, broot,
        txn = Some(("soak", bid)))
      admitted ::= (b, bid)
      if (rnd.nextBoolean()) { // immediate replay: wholesale no-op
        val ve = TxTable.versions(eroot).max
        val vb = TxTable.versions(broot).max
        GraphAnn.admitVectors(spark, part(b), eroot, broot,
          txn = Some(("soak", bid)))
        withClue(s"immediate replay of batch $bid committed: ") {
          TxTable.versions(eroot).max shouldBe ve
          TxTable.versions(broot).max shouldBe vb
        }
      }
      if (rnd.nextBoolean()) { // maintenance racing admissions
        GraphAnn.compactEdgeStore(spark, eroot)
      }
      // stale replay of a RANDOM earlier batch (crash-restart long
      // after progress): the watermark absorbs it even after any
      // compactions in between (compaction preserves txn watermarks)
      val (sb, sbid) = admitted(rnd.nextInt(admitted.size))
      val ve = TxTable.versions(eroot).max
      GraphAnn.admitVectors(spark, part(sb), eroot, broot,
        txn = Some(("soak", sbid)))
      withClue(s"stale replay of batch $sbid committed: ") {
        TxTable.versions(eroot).max shouldBe ve
      }
    }
    GraphAnn.compactEdgeStore(spark, eroot) // final maintenance pass
    // the tier's contract, after the whole random history
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")
    val standing = sorted(GraphAnn.readGraph(spark, eroot, sf)).collect()
    val rebuilt = sorted(GraphAnn.knnEdges(spark, sf)).collect()
    standing shouldBe rebuilt
  }
}
