package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Skew-handling pattern from the scale design (SURVEY §4.2 / brief
  * "salting for skew"): a two-phase salted aggregation must equal the
  * direct aggregation. At 100 TB a hot key overwhelms one reducer; the
  * salt spreads its partial aggregates across 8, the second phase merges
  * — sums are integral-valued doubles so equality is exact. */
class SaltingSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("salted two-phase aggregation ≡ direct aggregation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("s"))

    val salted = li
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(8)))
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("p_cnt"), sum("l_quantity").as("p_s"))
      .groupBy("l_returnflag")
      .agg(sum("p_cnt").as("cnt"), sum("p_s").as("s"))

    salted.orderBy("l_returnflag").collect() shouldBe
      direct.orderBy("l_returnflag").collect()
  }
}
