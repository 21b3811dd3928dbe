package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Incremental

/** q_incr_dedup invariants: the decision column is consistent with the
  * two detection layers, every batch doc is decided exactly once, and
  * the exact layer agrees with a direct text-equality join. */
class IncrementalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private lazy val out = Incremental.qIncrDedup(spark, sf).cache()

  test("every batch doc gets exactly one decision row") {
    val batch = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
    out.count() shouldBe batch.count()
    out.select("doc_id").distinct().count() shouldBe out.count()
  }

  test("kept is the complement of (exact_dup OR near_dup)") {
    out.filter(col("kept") =!=
      when(col("exact_dup") === 0 && col("near_dup") === 0, 1L).otherwise(0L))
      .count() shouldBe 0
  }

  test("exact layer agrees with a direct text-equality join") {
    val docs = graft.io.Tables.documents(spark, sf)
    val expected = docs.filter(col("doc_id") % 10 >= 8).as("b")
      .join(docs.filter(col("doc_id") % 10 < 8).as("c"),
        col("b.text") === col("c.text"), "left_semi")
      .select(col("doc_id"))
    val flagged = out.filter(col("exact_dup") === 1).select("doc_id")
    flagged.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(flagged).count() shouldBe 0
  }

  test("near-dup layer fires on this corpus (non-vacuous)") {
    out.filter(col("near_dup") === 1).count() should be > 0L
  }
}
