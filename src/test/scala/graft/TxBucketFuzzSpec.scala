package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** [[TxModelFuzzSpec]]'s twin for the HASH-BUCKETED tier: random
  * sequences of the ops that tier actually permits (bucketed append,
  * MOR delete, per-bucket compaction — plain or with a
  * read-equivalent prune — and exactly-once appendBatch with random
  * replays), mirrored against an in-memory model. Beyond the shared
  * invariants (manifest count ≡ model after every op, content ≡ model
  * at the end and via time travel, gapless chain), the tier's OWN
  * contract is pinned after every compaction and at the end: the scan
  * still reports its BucketSpec — a bucket-column groupBy runs with
  * ZERO Exchange — which only holds if every rewrite reproduced every
  * row's value-hashed placement. */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class TxBucketFuzzSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private case class R(bk: Long, v: Double)

  test("random bucketed-tier op sequences: content ≡ model, placement intact") {
    Seq(11L, 22L, 33L).foreach(runSequence)
  }

  private def df(rows: Seq[(Long, R)]): DataFrame =
    spark.createDataFrame(rows.map { case (k, r) => (k, r.bk, r.v) })
      .toDF("k", "bk", "v")

  private def readAll(root: String, v: Option[Long]): Map[Long, R] =
    TxTable.read(spark, root, v).select("k", "bk", "v").collect()
      .map(r => r.getLong(0) -> R(r.getLong(1), r.getDouble(2))).toMap

  private def assertNoExchange(root: String): Unit = {
    val grouped = TxRelation.read(spark, root).groupBy("bk").count()
    grouped.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
    grouped.count() should be > 0L
  }

  private def runSequence(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = s"/tmp/graft_txbfuzz_p${ProcessHandle.current.pid}_$seed"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    var nextK = 0L
    def fresh(n: Int): Seq[(Long, R)] = {
      val rows = (0 until n).map { i =>
        val k = nextK + i; k -> R(k % 7, k * 0.5)
      }
      nextK += n
      rows
    }

    val init = fresh(60)
    TxTable.createBucketed(spark, root, df(init), "k", Seq("bk"), 4)
    var model: Map[Long, R] = init.toMap
    var history = Map(0L -> model)
    var batchId = 0L

    for (_ <- 1 to 10) {
      rnd.nextInt(5) match {
        case 0 =>
          val rows = fresh(8 + rnd.nextInt(20))
          TxTable.append(spark, root, df(rows))
          model ++= rows
        case 1 =>
          val lo = rnd.nextLong(nextK)
          val hi = lo + rnd.nextLong(math.max(1L, nextK / 4))
          TxTable.deleteMor(spark, root, lo, hi)
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 2 =>
          TxTable.compactBuckets(spark, root)
          assertNoExchange(root)
        case 3 =>
          // pruned compaction with an identity-safe prune (drop
          // nothing readers could surface: here, nothing at all —
          // the prune hook itself must round-trip placement)
          TxTable.compactBuckets(spark, root, df => df.filter(lit(true)))
          assertNoExchange(root)
        case 4 =>
          val rows = fresh(8)
          TxTable.appendBatch(spark, root, "bfz", batchId, df(rows))
          model ++= rows
          if (rnd.nextBoolean())
            TxTable.appendBatch(spark, root, "bfz", batchId, df(rows))
          batchId += 1
      }
      withClue(s"seed=$seed after v${TxTable.versions(root).max}: ") {
        TxTable.countRows(root) shouldBe model.size.toLong
      }
      history += TxTable.versions(root).max -> model
    }

    withClue(s"seed=$seed latest: ") {
      readAll(root, None) shouldBe model
    }
    assertNoExchange(root)
    history.foreach { case (v, m) =>
      withClue(s"seed=$seed time travel v$v: ") {
        readAll(root, Some(v)) shouldBe m
      }
    }
    val vs = TxTable.versions(root)
    vs shouldBe (0L to vs.max)
  }
}
