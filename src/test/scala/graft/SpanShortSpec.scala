package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Forensics

/** The SHORT-SPAN winnow profile (k=3, w=2) delivers its w+k−1 = 4
  * token recall guarantee: on a hand-built corpus of planted 4–7-token
  * shared spans, the winnowed-candidate chain equals an UN-winnowed
  * brute-force diagonal scan exactly — nothing at or above the bar is
  * missed, and sub-bar sharing (3 tokens) is not reported. */
class SpanShortSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}
  import spark.implicits._

  // filler tokens unique per doc so ONLY the planted spans are shared
  private def fill(doc: Int, n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"f${doc}_${tag}_$i")

  private val span4 = Seq("alpha", "beta", "gamma", "delta")
  private val span5 = Seq("one", "two", "three", "four", "five")
  private val span7 = Seq("p", "q", "r", "s", "t", "u", "v")
  private val span3 = Seq("xx", "yy", "zz") // BELOW the 4-token bar

  private val corpus = Seq(
    (0L, (fill(0, 6, "a") ++ span4 ++ fill(0, 6, "b")).mkString(" ")),
    (1L, (fill(1, 4, "a") ++ span4 ++ fill(1, 8, "b")).mkString(" ")),
    (2L, (span5 ++ fill(2, 9, "a")).mkString(" ")),
    (3L, (fill(3, 7, "a") ++ span5).mkString(" ")),
    (4L, (fill(4, 3, "a") ++ span7 ++ fill(4, 3, "b")).mkString(" ")),
    (5L, (fill(5, 5, "a") ++ span7 ++ fill(5, 5, "b")).mkString(" ")),
    (6L, (fill(6, 6, "a") ++ span3 ++ fill(6, 6, "b")).mkString(" ")),
    (7L, (fill(7, 6, "a") ++ span3 ++ fill(7, 6, "b")).mkString(" ")),
    (8L, fill(8, 14, "a").mkString(" "))).toDF("doc_id", "text")

  /** Un-winnowed truth: ALL positioned 3-gram hashes of every doc pair
    * joined directly (no candidate stage, no df-cap), diagonal runs,
    * same span_toks = max run + 2 formula, bar ≥ 4. */
  private def bruteForce(d: org.apache.spark.sql.DataFrame) = {
    val g = Forensics.winnowGrams(d, 3).select(col("doc_id"), col("p"), col("h"))
    val m = g.as("a").join(g.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.p").as("pa"), (col("a.p") - col("b.p")).as("diag"))
    val runW = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    m.withColumn("run0", col("pa") - row_number().over(runW))
      .groupBy("doc_a", "doc_b", "diag", "run0")
      .agg(count(lit(1)).as("len"))
      .groupBy("doc_a", "doc_b")
      .agg((max(col("len")) + 2).cast("long").as("span_toks"),
        count(lit(1)).as("n_runs"))
      .filter(col("span_toks") >= 4)
      .orderBy("doc_a", "doc_b")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq

  test("planted 4/5/7-token spans: winnowed short profile ≡ brute-force diagonal scan") {
    val got = rows(Forensics.spanDedupAnyFrom(corpus, 3, 2))
    val truth = rows(bruteForce(corpus))
    got shouldBe truth
    // the planted pairs, with exactly the planted span lengths
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    byPair((0L, 1L)) shouldBe 4L
    byPair((2L, 3L)) shouldBe 5L
    byPair((4L, 5L)) shouldBe 7L
    // the 3-token plant is below the bar: absent
    byPair.get((6L, 7L)) shouldBe None
    // and nothing else surfaced
    byPair.keySet shouldBe Set((0L, 1L), (2L, 3L), (4L, 5L))
  }

  test("df-cap ENGAGEMENT: boilerplate fps leave the sharing join, pair volume is cap-bounded, rare spans still surface") {
    // the SCALING.md round-16 disposition claimed the cap engages once
    // df crosses WinnowDfCap (= 50) and pair growth reverts to the
    // rare-fp tail — this fixture makes it happen: a 6-token
    // boilerplate span planted in 60 docs (df = 60 > 50), plus ONE
    // rare 9-token span shared by docs 0 and 1 only (df = 2).
    //
    // DETERMINISTIC BY CONSTRUCTION (review r17 — the previous fixture
    // wrapped the boilerplate in doc-unique filler, so edge grams
    // selected only via straddling windows could land at any df in
    // 1..60, breaking either the hot assertion or the exact candidate
    // set on unlucky hash constants): the boilerplate docs are the
    // bare span with NO filler, so every selected boilerplate gram is
    // selected identically in all docs (df ∈ {0, 60}-adjacent — a
    // window fully inside the span exists in every doc, and docs 0/1's
    // extra straddling windows can only ADD selections whose fps are
    // shared by docs 0/1 alone). Consequently every fp's df is either
    // ≥ nBoiler (pure boilerplate, capped away) or ≤ 2 (rare tail) —
    // no intermediate df exists to flood the candidate join.
    val boiler = Seq("tos", "copy", "right", "all", "res", "erved")
    val rareSp = Seq("r1", "r2", "r3", "r4", "r5", "r6", "r7", "r8", "r9")
    val nBoiler = 60
    val heavy = (0 until nBoiler).map { i =>
      // docs 0/1 additionally carry the rare span, behind unique filler
      // so the two shared regions are distinct diagonal runs, not one
      val toksI = if (i < 2) boiler ++ fill(i, 3, "x") ++ rareSp else boiler
      (i.toLong, toksI.mkString(" "))
    }.toDF("doc_id", "text")

    // (a) the boilerplate fps CROSS the cap and leave the join: every
    // fp above the cap is one of the shared boilerplate hashes (df =
    // nBoiler exactly — internal-window selections are identical in
    // every doc), and at least one such fp exists
    val hist = Forensics.winnowDfHistogram(heavy, 3, 2).collect()
    val hot = hist.filter(_.getAs[Long]("df") > Forensics.winnowDfCap)
    hot.length should be > 0
    hot.foreach(_.getAs[Long]("df").toInt shouldBe nBoiler)

    // (b) candidate volume is the rare tail, NOT the boilerplate
    // square: the un-capped join would generate ≥ C(60,2) = 1770
    // boilerplate pairs; the capped stage generates exactly the rare
    // pair — and in general stays ≤ Σ_{df ≤ cap} df² (the pinned
    // cost model)
    val cand = Forensics.cappedCandidatePairs(heavy, 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    cand shouldBe Set((0L, 1L))
    val bound = hist.filter(_.getAs[Long]("df") <= Forensics.winnowDfCap)
      .map(r => r.getAs[Long]("df") * r.getAs[Long]("df")).sum
    cand.size.toLong should be <= bound

    // (c) the recall exclusion is EXACTLY the documented boilerplate
    // semantics: pairs whose only shared span is boilerplate are not
    // reported; the rare pair still is — and its verify stage (which
    // sees ALL matching grams, the cap applies to candidate
    // GENERATION only) reports the true longest span
    val got = rows(Forensics.spanDedupAnyFrom(heavy, 3, 2))
    got.map(t => (t._1, t._2)).toSet shouldBe Set((0L, 1L))
    got.head._3 shouldBe 9L // the rare span, not the 6-token boilerplate
  }

  test("short profile on the real corpus is a superset of the default profile's pairs") {
    val short8 = Forensics.spanDedupAnyFrom(
      graft.io.Tables.documents(spark, sf), 3, 2)
      .filter(col("span_toks") >= 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = SparkEntry.queries("q_span_dedup_any")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair the 8-token profile reports is visible to the 4-token
    // profile at the same bar (k=3 grams subsume k=4 matches)
    dflt.subsetOf(short8) shouldBe true
  }
}
