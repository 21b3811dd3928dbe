package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** q_minhash_est calibration invariants: each minhash component agrees
  * with probability J (the true Jaccard), so est16/16 is an unbiased
  * estimator — pinned as a mean-vs-mean comparison over the candidate
  * pairs (16 components × pairs keeps sampling error modest), plus the
  * exact endpoints. */
class MinhashEstSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private lazy val est = LlmOps.qMinhashEst(spark, sf).cache()

  test("estimate is bounded and identical docs estimate exactly 16/16") {
    est.filter(col("est16") < 0 || col("est16") > 16).count() shouldBe 0
    // jacc = 1 means identical shingle sets -> identical signatures
    est.filter(col("jacc") === 1.0 && col("est16") =!= 16).count() shouldBe 0
  }

  test("estimator is unbiased on average over the candidate pairs") {
    val row = est.agg(avg(col("est16") / 16.0).as("m_est"),
      avg(col("jacc")).as("m_jacc")).head
    val (mEst, mJacc) = (row.getDouble(0), row.getDouble(1))
    // n_pairs × 16 Bernoulli components; band-selection bias pushes the
    // candidate set toward pairs with at least one agreeing band, so
    // allow a generous but non-vacuous envelope
    math.abs(mEst - mJacc) should be < 0.15
  }
}
