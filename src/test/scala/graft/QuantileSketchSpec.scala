package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the mergeable quantile sketch (ops.Sketches.qsketch*): the
  * hash-deterministic level rule makes the sketch a pure function of
  * the underlying multiset, so shard merges must equal the
  * from-scratch sketch EXACTLY (not just within error bounds), under
  * any merge grouping — the associativity the 100 TB shard-then-merge
  * deployment relies on. Plus the space bound and rank accuracy. */
class QuantileSketchSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def base: DataFrame =
    graft.io.Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("grp"), col("l_extendedprice").as("v"),
      ops.LlmOps.md5Long(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))).as("h"))

  private def rowsOf(sk: (DataFrame, DataFrame)): Set[(String, Long)] =
    sk._2.select("grp", "h").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  private def summaryOf(sk: (DataFrame, DataFrame)): Map[String, Long] =
    sk._1.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap

  test("3-shard merge equals the from-scratch sketch, any grouping") {
    val whole = ops.Sketches.qsketchBuild(base)
    // arbitrary uneven shards (hash thirds of the order key)
    val shards = (0 until 3).map(i =>
      ops.Sketches.qsketchBuild(base.filter(col("h") % 3 === i)))
    val leftAssoc = ops.Sketches.qsketchMerge(Seq(
      ops.Sketches.qsketchMerge(Seq(shards(0), shards(1))), shards(2)))
    val rightAssoc = ops.Sketches.qsketchMerge(Seq(
      shards(0), ops.Sketches.qsketchMerge(Seq(shards(1), shards(2)))))
    summaryOf(leftAssoc) shouldBe summaryOf(whole)
    summaryOf(rightAssoc) shouldBe summaryOf(whole)
    // EXACT sample-set equality — the pure-function property
    val want = rowsOf(whole)
    rowsOf(leftAssoc) shouldBe want
    rowsOf(rightAssoc) shouldBe want
    // and therefore identical estimates
    val est = ops.Sketches.qsketchEstimate _
    est.tupled(leftAssoc).orderBy("grp").collect().map(_.toSeq) shouldBe
      est.tupled(whole).orderBy("grp").collect().map(_.toSeq)
  }

  test("sample size is bounded near k = 256 at every group size") {
    val (summary, sample) = ops.Sketches.qsketchBuild(base)
    val m = sample.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    summaryOf((summary, sample)).foreach { case (g, n) =>
      // expectation is in (k/2, k]; 2k is a generous uniform-hash bound
      m(g) should be <= 2 * 256L
      if (n > 256L) m(g) should be >= 32L
    }
  }

  test("small groups degrade to exact quantiles (level 0 keeps all rows)") {
    val tiny = base.limit(100)
    val (summary, sample) = ops.Sketches.qsketchBuild(tiny)
    sample.count() shouldBe tiny.count() // n <= k → modulus 1
  }

  test("estimate ranks land within the sampling error of the target") {
    val (summary, sample) = ops.Sketches.qsketchBuild(base)
    val est = ops.Sketches.qsketchEstimate(summary, sample)
      .select("grp", "p50_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // realized rank of the p50 estimate within each full group
    base.groupBy("grp").agg(count(lit(1)).as("n")).collect().foreach { r =>
      val g = r.getString(0); val n = r.getLong(1)
      val below = base.filter(col("grp") === g && col("v") <= est(g)).count()
      val frac = below.toDouble / n
      // ~1/sqrt(k) sampling error; 0.15 is ~4 sigma at k=256
      frac should be (0.5 +- 0.15)
    }
  }
}
