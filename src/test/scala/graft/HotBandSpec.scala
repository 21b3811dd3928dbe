package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** Skew-stress for the MinHash banded candidate join: a hot band key —
  * one band bucket holding a large fraction of the corpus, as produced
  * by mass-duplicated boilerplate — must NOT emit its O(bucket²) pair
  * blowup when the per-band cap (spark.graft.bandCap) is engaged, while
  * genuinely small buckets keep their candidates and their exact
  * verified Jaccard scores.
  *
  * The synthetic corpus: 60 byte-identical "hot" docs (every band key
  * equal → four buckets of 60) + 3 pairs of per-pair-identical "cold"
  * docs (per-pair buckets of 2; identical text keeps band agreement
  * deterministic — a merely-similar pair surfaces only with banding
  * probability J⁴ per band and would flake). With the cap below 60 the
  * hot buckets are dropped entirely; the cold pairs survive unchanged.
  */
class HotBandSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def corpus() = {
    import spark.implicits._
    val hotText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val hot = (0L until 60L).map(i => (i, hotText))
    // three exact-duplicate pairs; token vocab fully DISJOINT across
    // pairs (a shared middle would band-collide cross-pair and inflate
    // the expected candidate count)
    val cold = (0 until 3).flatMap { p =>
      val base = (0 until 25).map(i => s"p${p}w$i").mkString(" ")
      Seq((100L + 2 * p, base), (101L + 2 * p, base))
    }
    (hot ++ cold).toDF("doc_id", "text")
  }

  private def withBandCap[A](cap: Int)(body: => A): A = {
    spark.conf.set("spark.graft.bandCap", cap.toString)
    try body finally spark.conf.unset("spark.graft.bandCap")
  }

  test("uncapped: the hot band emits its quadratic candidate set") {
    val pairs = withBandCap(1000000)(LlmOps.minhashLshFrom(corpus()).collect())
    // 60 identical docs → C(60,2) = 1770 verified pairs at jacc 1.0,
    // plus the 3 cold pairs
    pairs.count(r => r.getLong(0) < 100L) shouldBe 1770
    pairs.count(r => r.getLong(0) >= 100L) shouldBe 3
  }

  test("capped: hot-band candidates are bounded out, cold pairs intact") {
    val pairs = withBandCap(50)(LlmOps.minhashLshFrom(corpus()).collect())
    // every hot bucket (60 > cap) is dropped → zero hot pairs; the cold
    // pairs (buckets of 2) keep their exact scores
    pairs.count(r => r.getLong(0) < 100L) shouldBe 0
    val cold = pairs.filter(r => r.getLong(0) >= 100L)
    cold.length shouldBe 3
    all(cold.map(_.getDouble(2))) should be >= 0.2
  }

  test("default cap leaves the test-SF corpus untouched") {
    // the real corpus' largest band bucket holds 4 docs (measured) —
    // far under the 256 default, so the capped chain must equal the
    // effectively-uncapped one row for row
    val deflt = LlmOps.qMinhashLsh(spark, TestSpark.sf).collect().toSeq
    val uncapped = withBandCap(1000000)(
      LlmOps.qMinhashLsh(spark, TestSpark.sf).collect().toSeq)
    deflt shouldBe uncapped
  }
}
