package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scale story: bucketing co-locates join keys so fact⋈fact joins run
  * WITHOUT a shuffle — the 100 TB answer to repeated joins on the same
  * key (SURVEY §4.2 / builder brief "bucketing for co-located joins").
  * Asserts on the actual physical plan, not just results. */
class BucketingSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables at JVM exit but their files
    // survive — clear the physical locations too
    Seq("b_orders", "b_customer").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    // hint forces sort-merge (the fact⋈fact shape this demonstrates) —
    // otherwise the small dimension side is auto-broadcast
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: the sort-merge join reads both bucketed sides directly —
    // no Exchange (shuffle) anywhere in the plan
    plan should not include "Exchange"

    // and the result is identical to the shuffled plain-parquet join
    val plainCount = orders.join(customer,
      col("o_custkey") === col("c_custkey")).count()
    joined.count() shouldBe plainCount
  }
}
