package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Analytic

/** Hand-computed expectations for the product-analytics transforms on
  * synthetic events — independent of the DuckDB oracle, so a mistake
  * made identically on both engines would still be caught here. */
class FunnelRetentionSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  test("funnel: strict view→click→purchase ordering per user") {
    val ev = Seq(
      // user 1: full ordered chain
      (1L, "view", ts(0, 1)), (1L, "click", ts(0, 2)), (1L, "purchase", ts(0, 3)),
      // user 2: click BEFORE first view → no click-after-view, no purchase stage
      (2L, "click", ts(0, 1)), (2L, "view", ts(0, 2)), (2L, "purchase", ts(0, 3)),
      // user 3: view only
      (3L, "view", ts(0, 1))
    ).toDF("user_id", "event_type", "ts")
    val row = Analytic.funnel(ev).head
    row.getLong(0) shouldBe 3L // n_view: users 1, 2, 3
    row.getLong(1) shouldBe 1L // n_click_after_view: only user 1
    row.getLong(2) shouldBe 1L // n_purchase_after_click: only user 1
  }

  test("corpus pipeline: quality filter excludes short/repetitive docs, dedup keeps min id") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct tokens
    val docs = Seq(
      (1L, long, "en", long.length.toLong),                 // passes, keeper
      (2L, long, "en", long.length.toLong),                 // exact dup of 1 → dropped
      (3L, "too short", "en", 9L),                          // < 20 tokens → dropped
      (4L, ("x " * 30).trim, "de", 59L),                    // 30 tokens, 1 distinct → uniq 1/30 < 0.3 → dropped
      (5L, (1 to 20).map(i => s"v$i").mkString(" "), "de", 100L) // passes
    ).toDF("doc_id", "text", "lang", "n_chars")
    val got = graft.ops.LlmOps.pipelineCorpus(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // en: only doc 1 survives (dup 2 removed); de: only doc 5 (3, 4 filtered)
    got shouldBe Seq(("de", 1L), ("en", 1L))
  }

  test("retention: cohort day-offset matrix") {
    val ev = Seq(
      (1L, "view", ts(0, 1)), (1L, "view", ts(1, 1)), (1L, "view", ts(3, 1)),
      (1L, "view", ts(1, 9)), // same day as another u1 event — no double count
      (2L, "view", ts(1, 1))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytic.retention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq(
      ("2024-01-01", 0L, 1L), // u1 cohort day, day 0
      ("2024-01-01", 1L, 1L), // u1 back on day 1
      ("2024-01-01", 3L, 1L), // u1 back on day 3
      ("2024-01-02", 0L, 1L)) // u2 cohort day
  }
}
