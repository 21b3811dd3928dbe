package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Pipeline, Sketches}

/** Invariants of the mergeable-sketch family that the exact-match
  * oracle alone can't express as guarantees: Bloom's zero false
  * negatives (vs the exact q_decontam), CMS's one-sided error, HLL's
  * bounded register relation and error, and the sampled quantiles'
  * positional validity. */
class SketchesSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("bloom prefilter loses nothing: q_bloom_decontam == q_decontam on shared cols") {
    val exact = Pipeline.qDecontam(spark, sf)
      .select("doc_id", "n_shared", "contam_ratio")
    val bloom = Sketches.qBloomDecontam(spark, sf)
      .select("doc_id", "n_shared", "contam_ratio")
    // a Bloom filter admits false positives but never false negatives,
    // and the exact verify removes the false positives — so the final
    // relation must be IDENTICAL to the brute exact path
    bloom.exceptAll(exact).count() shouldBe 0
    exact.exceptAll(bloom).count() shouldBe 0
  }

  test("bloom candidate count bounds the shared count (fp-visibility column)") {
    Sketches.qBloomDecontam(spark, sf)
      .filter(col("n_cand") < col("n_shared")).count() shouldBe 0
  }

  test("count-min estimates are a one-sided upper bound on exact counts") {
    val cms = Sketches.qCmsFreq(spark, sf).cache()
    cms.count() shouldBe 20
    cms.filter(col("cms_est") < col("exact_cnt")).count() shouldBe 0
    cms.filter(col("overest") < 0).count() shouldBe 0
  }

  test("hll registers stay bounded and the estimate lands near the exact count") {
    val hll = Sketches.qHllEst(spark, sf).cache()
    // one row per source; at p=8 the raw estimator's std err is
    // 1.04/sqrt(256) = 6.5% — measured max |err| at sf0.001 is 15.7%
    // (~2.5 sigma over 20 sources); 25% is a deterministic-data pin
    // with headroom, not a probabilistic bound
    hll.count() shouldBe 20
    hll.filter(abs(col("err_pct")) > 25.0).count() shouldBe 0
  }

  test("sampled quantiles are ordered and drawn from the data") {
    val q = Sketches.qQuantileSample(spark, sf).cache()
    q.count() should be > 0L
    q.filter(col("p50_ex") > col("p90_ex") || col("p90_ex") > col("p99_ex"))
      .count() shouldBe 0
    q.filter(col("p50_sm") > col("p90_sm") || col("p90_sm") > col("p99_sm"))
      .count() shouldBe 0
    // positional quantiles return actual input values: every exact p50
    // must exist in lineitem for its flag
    val joined = q.join(
      graft.io.Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_extendedprice").as("p50_ex")),
      Seq("l_returnflag", "p50_ex"), "left_anti")
    joined.count() shouldBe 0
  }

  test("bloom bit relation is far smaller than the benchmark shingle set") {
    // the scale rationale: bits <= k * |bench| (and <= m), each a long —
    // vs the full shingle strings; pin the bound so a hash change that
    // explodes the relation fails loudly
    val bench = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0)
      .selectExpr("explode(array_distinct(transform(" +
        "sequence(1, greatest(size(split(text, ' ')) - 4, 1)), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 5))))) AS sh")
      .distinct()
    val nBench = bench.count()
    val nBits = bench.selectExpr(
        "explode(array(" + (0 until 3).map(j =>
          s"cast(conv(substring(md5(concat('$j|', sh)), 1, 15), 16, 10) " +
            "as bigint) % 131072").mkString(",") + ")) AS bit")
      .distinct().count()
    nBits should be <= math.min(3 * nBench, 131072L)
  }
}
