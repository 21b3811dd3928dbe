package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Forensics

/** Corpus-forensics invariants: planted contamination spans are
  * recovered at exact length, winnowing keeps its detection guarantee
  * and density bound, and novelty counts partition the global distinct
  * shingle set. */
class ForensicsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("contam span: a planted 8-token verbatim quote is recovered at exact length") {
    // doc 20 (bench: % 20 == 0) and doc 1 share exactly tokens q1..q8
    val d = docsOf(
      20L -> "b1 b2 q1 q2 q3 q4 q5 q6 q7 q8 b3 b4",
      1L -> "c1 c2 c3 q1 q2 q3 q4 q5 q6 q7 q8 c4 c5")
    val out = Forensics.contamSpansFrom(d, col("doc_id") % 20 === 0).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("doc_id") shouldBe 1L
    r.getAs[Long]("bench_id") shouldBe 20L
    r.getAs[Long]("span_toks") shouldBe 8L
    r.getAs[Long]("n_runs") shouldBe 1L
  }

  test("contam span: shared runs under 5 tokens produce no shared shingle") {
    val d = docsOf(
      20L -> "b1 b2 q1 q2 q3 q4 b3 b4 b5 b6",
      1L -> "c1 c2 q1 q2 q3 q4 c3 c4 c5 c6")
    Forensics.contamSpansFrom(d, col("doc_id") % 20 === 0, minSpanToks = 5)
      .count() shouldBe 0L
  }

  test("contam span: two disjoint quotes surface as two runs, max span reported") {
    // quotes of 9 and 6 tokens at different alignments
    val d = docsOf(
      20L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9 b1 b2 r1 r2 r3 r4 r5 r6 b3",
      1L -> "c1 q1 q2 q3 q4 q5 q6 q7 q8 q9 c2 c3 c4 c5 r1 r2 r3 r4 r5 r6 c6")
    val out = Forensics.contamSpansFrom(d, col("doc_id") % 20 === 0, minSpanToks = 5)
      .collect()
    out.length shouldBe 1
    out.head.getAs[Long]("span_toks") shouldBe 9L
    out.head.getAs[Long]("n_runs") shouldBe 2L
  }

  test("winnow: guarantee — identical docs share fingerprints; disjoint docs share none") {
    val d = docsOf(
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10",
      2L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    val out = Forensics.winnowFrom(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_shared_docs") shouldBe 1L
    out(2L).getAs[Long]("n_shared_docs") shouldBe 1L
    out(3L).getAs[Long]("n_shared_docs") shouldBe 0L
    // identical docs select the identical fingerprint set
    out(1L).getAs[Long]("n_fps") shouldBe out(2L).getAs[Long]("n_fps")
  }

  test("winnow: window accounting — m-w+1 complete windows, fps bounded by windows") {
    val corpus = graft.io.Tables.documents(spark, sf)
    val out = Forensics.winnowFrom(corpus)
    // n tokens -> m = n-3 k-grams -> max(m-4, 1) windows
    out.filter(col("n_windows") =!=
      greatest(col("n_kgrams") - 4, lit(1L))).count() shouldBe 0L
    out.filter(col("n_fps") > col("n_windows")).count() shouldBe 0L
    out.filter(col("n_fps") < 1).count() shouldBe 0L
    out.count() shouldBe corpus.count() // all docs >= 4 tokens here
  }

  test("span_dedup_any: planted spans of known lengths are recovered exactly") {
    // docs 1/2 share exactly q1..q12 (12 tokens); docs 1/3 share exactly
    // r1..r8 (8 tokens, the winnowing guarantee bar); doc 4 shares nothing
    val d = docsOf(
      1L -> "a1 a2 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 a3 r1 r2 r3 r4 r5 r6 r7 r8 a4",
      2L -> "b1 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 b2 b3 b4 b5 b6 b7 b8",
      3L -> "c1 c2 c3 r1 r2 r3 r4 r5 r6 r7 r8 c4 c5 c6 c7 c8 c9 c10",
      4L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14 z15 z16")
    val out = Forensics.spanDedupAnyFrom(d).collect()
    out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("span_toks"))).toSeq shouldBe
      Seq((1L, 2L, 12L), (1L, 3L, 8L))
  }

  test("span_dedup_any: guarantee bar — a 7-token shared run stays below the report") {
    // 7 shared tokens = 4 shared 4-grams < the w+k-1 = 8 guarantee; the
    // report bar (span_toks >= 8) keeps sub-guarantee spans out even
    // when a fingerprint happens to surface the pair
    val d = docsOf(
      1L -> "a1 a2 s1 s2 s3 s4 s5 s6 s7 a3 a4 a5 a6 a7",
      2L -> "b1 b2 b3 s1 s2 s3 s4 s5 s6 s7 b4 b5 b6 b7")
    Forensics.spanDedupAnyFrom(d).count() shouldBe 0L
  }

  test("span_dedup_any: two disjoint shared spans on one pair count as separate runs") {
    val d = docsOf(
      1L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9 a1 a2 r1 r2 r3 r4 r5 r6 r7 r8 a3",
      2L -> "b1 q1 q2 q3 q4 q5 q6 q7 q8 q9 b2 b3 b4 r1 r2 r3 r4 r5 r6 r7 r8 b5")
    val out = Forensics.spanDedupAnyFrom(d).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("span_toks") shouldBe 9L
    out.head.getAs[Long]("n_runs") shouldBe 2L
  }

  test("span_dedup_any: boilerplate fingerprints (df > cap) are excluded by contract") {
    // 60 docs share one 8-token boilerplate span (every involved
    // fingerprint's df > 50 → candidate generation drops it); two other
    // docs share a rare 8-token span (df = 2 → reported). Pins the
    // documented df-cap exclusion: boilerplate pairs are NOT reported,
    // the rare pair is.
    val boiler = "p1 p2 p3 p4 p5 p6 p7 p8"
    val rows = (1L to 60L).map(i => i -> s"u${i}a u${i}b $boiler u${i}c u${i}d") ++
      Seq(100L -> "r1 r2 r3 r4 r5 r6 r7 r8 x1 x2 x3",
        101L -> "y1 y2 r1 r2 r3 r4 r5 r6 r7 r8 y3")
    val out = Forensics.spanDedupAnyFrom(docsOf(rows: _*)).collect()
    out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq shouldBe
      Seq((100L, 101L))
    out.head.getAs[Long]("span_toks") shouldBe 8L
    // and the strip side consequently leaves the boilerplate docs intact
    val strip = Forensics.spanStripFrom(docsOf(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    (1L to 60L).foreach(i => strip(i) shouldBe 0L)
    strip(101L) shouldBe 8L
  }

  test("span_strip: the higher doc loses exactly the shared span; the lower doc is untouched") {
    val d = docsOf(
      1L -> "a1 a2 q1 q2 q3 q4 q5 q6 q7 q8 a3 a4 a5 a6",
      2L -> "b1 b2 b3 q1 q2 q3 q4 q5 q6 q7 q8 b4 b5 b6 b7")
    val out = Forensics.spanStripFrom(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_after"))).toMap
    out(1L) shouldBe ((14L, 0L, 14L)) // lower id keeps the first occurrence
    out(2L) shouldBe ((15L, 8L, 7L)) // exactly the 8 shared tokens removed
  }

  test("span_strip: stripped content is the original minus covered positions, in order") {
    import spark.implicits._
    val d = docsOf(
      1L -> "q1 q2 q3 q4 q5 q6 q7 q8",
      2L -> "x1 q1 q2 q3 q4 q5 q6 q7 q8 x2 x3")
    val out = Forensics.spanStripFrom(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stripped_fp")).toMap
    // doc 2 loses q1..q8, keeping "x1 x2 x3" in original order
    out(2L) shouldBe Seq("x1 x2 x3").toDF("s")
      .select(md5(col("s"))).head.getString(0)
    // doc 1 (fully duplicated, but lower id) is untouched
    out(1L) shouldBe Seq("q1 q2 q3 q4 q5 q6 q7 q8").toDF("s")
      .select(md5(col("s"))).head.getString(0)
  }

  test("span_strip: a doc that is entirely one shared span strips to empty") {
    import spark.implicits._
    val d = docsOf(
      1L -> "z0 q1 q2 q3 q4 q5 q6 q7 q8 z9",
      2L -> "q1 q2 q3 q4 q5 q6 q7 q8")
    val out = Forensics.spanStripFrom(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_after"), r.getAs[String]("stripped_fp"))).toMap
    out(2L)._1 shouldBe 0L
    out(2L)._2 shouldBe Seq("").toDF("s").select(md5(col("s"))).head.getString(0)
  }

  test("novelty: per-doc novel counts partition the global distinct shingle set") {
    val corpus = graft.io.Tables.documents(spark, sf)
    val out = Forensics.noveltyFrom(corpus).cache()
    val globalDistinct = graft.ops.LlmOps.docShinglesFrom(corpus)
      .select(explode(col("shs")).as("sh")).distinct().count()
    out.agg(sum("n_novel")).head.getLong(0) shouldBe globalDistinct
    // the earliest doc's shingles all first-occur there
    val first = out.orderBy("doc_id").head
    first.getAs[Long]("n_novel") shouldBe first.getAs[Long]("n_shingles")
    first.getAs[Double]("novelty") shouldBe 1.0
  }
}
