package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.Tables

/** B11's actual approximate path (the oracle entry is deliberately the
  * exact variant — approx values are engine-specific): HLL++ distinct
  * counts and approximate percentiles must land within their documented
  * error bounds of the exact answers on real data. */
class ApproxSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("approx_count_distinct (HLL++) is within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    math.abs(approx - exact) / exact should be < 0.05
  }

  test("approx percentile is within the accuracy bound of the exact percentile") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_p50")).head
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    // rank error ≤ 1/1000 → value error small on a smooth distribution
    math.abs(approx - exact) / exact should be < 0.02
  }
}
