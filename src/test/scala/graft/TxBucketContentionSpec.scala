package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** compactBuckets racing concurrent appends on a bucketed table — the
  * shape a standing index actually runs (streaming admission appending
  * while a maintenance job compacts). Appends are add-only commits and
  * REBASE past a racing compaction; compactBuckets is a STRICT commit
  * that re-packs from a fresh snapshot when it loses a race — so every
  * appended row must survive every interleaving, placement must stay
  * value-hashed (zero-Exchange scans), and the version chain must be
  * gapless. */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class TxBucketContentionSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  test("appends racing compactBuckets: no lost rows, placement intact") {
    val root = s"/tmp/graft_txbcontend_p${ProcessHandle.current.pid}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") % 5).as("bk"),
        (col("id") * 3).cast("double").as("v"))
    TxTable.createBucketed(spark, root, batch(0, 100), "k", Seq("bk"), 4)

    val nBatches = 8
    val appender = new Thread(() => {
      for (i <- 0 until nBatches)
        TxTable.append(spark, root,
          batch(1000L * (i + 1), 1000L * (i + 1) + 50))
    })
    appender.start()
    // compact repeatedly while the appender runs — each call races the
    // in-flight commits; STRICT retry must absorb every loss
    var compactions = 0
    while (appender.isAlive) {
      TxTable.compactBuckets(spark, root)
      compactions += 1
    }
    appender.join()
    TxTable.compactBuckets(spark, root) // final pack over everything
    compactions += 1

    // every row of every batch survived every interleaving
    TxTable.countRows(root) shouldBe (100L + nBatches * 50L)
    val read = TxRelation.read(spark, root)
    read.count() shouldBe (100L + nBatches * 50L)
    read.select(countDistinct("k")).head.getLong(0) shouldBe
      (100L + nBatches * 50L)
    // placement stayed value-hashed through every rewrite: the bucketed
    // scan still serves a bucket-column groupBy with zero Exchange
    val grouped = read.groupBy("bk").count()
    grouped.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
    grouped.count() shouldBe 5
    // final state: fully packed, gapless version chain covering the
    // create + every append + every won compaction
    TxTable.snapshot(root).files.size should be <= 4
    val vs = TxTable.versions(root)
    vs shouldBe (0L to vs.max)
    vs.max shouldBe (nBatches + compactions)
  }
}
