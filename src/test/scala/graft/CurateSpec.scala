package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Curate

/** Round-6 curation operators: substring-level span dedup, span
  * coverage, bigram-LM scoring, semantic dedup, resample/EWMA/anomaly
  * time-series prep. Synthetic-frame tests pin the exact expected
  * outputs where the operator core is frame-parameterized; the
  * table-bound operators are pinned by invariants on sf0.001 (their
  * value-level correctness is the DuckDB oracle's job). */
class CurateSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("span dedup finds exactly the sliding spans of a shared run") {
    // doc 1 and doc 2 share an identical 25-token run; doc 3 is noise.
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    val d = mkDocs(
      (1L, shared + " x1 x2 x3"),
      (2L, "y1 y2 " + shared),
      (3L, (1 to 30).map(i => s"z$i").mkString(" ")))
    val spans = Curate.spanFrameOf(d)
      .groupBy("span_fp").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1)
    // a 25-token shared run yields 25 - 20 + 1 = 6 duplicated spans
    spans.count() shouldBe 6
  }

  test("span frame emits no spans for docs shorter than the span length") {
    val d = mkDocs((1L, (1 to 19).map(_ => "t").mkString(" ")))
    Curate.spanFrameOf(d).count() shouldBe 0
  }

  test("lm score is exactly 1e6 micro-units on a deterministic corpus") {
    // "a b a b ..." — every bigram is the unique continuation of its
    // context, so every P(cur|prev) = 1 and the mean is exactly 1.0
    val d = mkDocs((1L, ("a b " * 20).trim), (2L, ("a b " * 10).trim))
    val out = Curate.lmScoreOf(d).collect()
    out.map(_.getLong(2)).toSet shouldBe Set(1000000L)
  }

  test("lm micro-scores stay within [0, 1e6] on real data") {
    val out = Curate.qLmScore(spark, sf)
      .agg(min("lm_micro"), max("lm_micro")).head
    out.getLong(0) should be >= 0L
    out.getLong(1) should be <= 1000000L
  }

  test("span coverage is bounded by the token count and zero for short docs") {
    val cov = Curate.qSpanCoverage(spark, sf)
    cov.filter(col("n_cov") > col("n_toks")).count() shouldBe 0
    cov.filter(col("n_toks") < 20 && col("n_cov") =!= 0).count() shouldBe 0
  }

  test("semantic-dedup drops are sound: keeper is a lower id with cos >= threshold") {
    val out = Curate.qDedupSemantic(spark, sf)
    out.filter(col("keeper") >= col("vec_id")).count() shouldBe 0
    out.filter(col("cos_sim") < 0.4).count() shouldBe 0
    // soundness vs the brute-force all-pairs ground truth: every
    // (keeper, vec_id) pair must be a true >=0.4-cosine pair
    val truth = graft.ops.LlmOps.dedupCosineAllPairs(spark, sf)
      .select(col("va").as("keeper"), col("vb").as("vec_id"))
    out.select("keeper", "vec_id").except(truth).count() shouldBe 0
  }

  test("resample grid is dense per user and forward fill leaves no nulls") {
    val r = Curate.qResample(spark, sf)
    r.filter(col("v_fill").isNull).count() shouldBe 0
    r.filter(col("is_gap") && col("n_events") =!= 0).count() shouldBe 0
    // grid density: rows per user == hours between that user's bounds
    val bad = r.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max("hour")) - unix_timestamp(min("hour"))) / 3600 + 1)
          .cast("long").as("expect"))
      .filter(col("rows") =!= col("expect"))
    bad.count() shouldBe 0
  }

  test("ewma equals the raw value on each user's first event") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val first = Curate.qEwma(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    first.filter(col("ewma") =!= round(col("value"), 6)).count() shouldBe 0
  }

  test("anomaly flags agree with var_samp-based z-scores") {
    val flagged = Curate.qAnomaly(spark, sf)
    val stats = graft.io.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
    val recomputed = graft.io.Tables.events(spark, sf)
      .join(stats, Seq("event_type"))
      .filter(abs((col("value") - col("mu")) / col("sd")) >= 2.5)
    // identical event sets (rounding differences can only matter within
    // 1e-4 of the threshold; assert symmetric difference is tiny)
    val a = flagged.select("event_id")
    val b = recomputed.select("event_id")
    a.except(b).union(b.except(a)).count() should be <= 1L
  }
}
