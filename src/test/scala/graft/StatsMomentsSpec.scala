package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q_stats_moments computes sample variance/stddev from exact sums
  * ((n·Σx² − (Σx)²)/(n(n−1))) for cross-engine determinism; this spec
  * pins that formulation to Spark's own var_samp/stddev_samp semantics —
  * the values must agree to float tolerance on real data. */
class StatsMomentsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("exact-sum variance formula matches Spark var_samp/stddev_samp") {
    val got = ops.Scalar.qStatsMoments(spark, sf)
    val ref = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"), stddev_samp(col("l_quantity")).as("s"))
    val joined = got.join(ref, "l_returnflag").collect()
    joined.length shouldBe 3
    joined.foreach { r =>
      r.getDouble(r.fieldIndex("var_qty")) shouldBe
        r.getDouble(r.fieldIndex("v")) +- 1e-4
      r.getDouble(r.fieldIndex("std_qty")) shouldBe
        r.getDouble(r.fieldIndex("s")) +- 1e-4
    }
  }

  test("exact-sum correlation/covariance matches Spark corr/covar_samp") {
    val got = ops.Scalar.qCorr(spark, sf)
    val ref = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_discount")).as("c"),
        covar_samp(col("l_quantity"), col("l_discount")).as("cv"))
    val joined = got.join(ref, "l_returnflag").collect()
    joined.length shouldBe 3
    joined.foreach { r =>
      r.getDouble(r.fieldIndex("corr_qd")) shouldBe
        r.getDouble(r.fieldIndex("c")) +- 1e-4
      r.getDouble(r.fieldIndex("cov_qd")) shouldBe
        r.getDouble(r.fieldIndex("cv")) +- 1e-4
    }
  }
}
