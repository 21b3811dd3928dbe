package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.expressions.TopKDoubles

/** Native bounded-heap top-k aggregate: known-answer, null skipping,
  * duplicate handling, partial/merge path under repartition, and parity
  * with the sort-based formulation on real data. */
class TopKAggSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("known answer, duplicates kept, nulls skipped, short groups") {
    import spark.implicits._
    TopKDoubles.register(spark)
    val df = Seq(
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(2.0)),
      ("a", None), ("b", Some(5.0)), ("c", None)
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(TopKDoubles.topK(col("v"), 3).as("t"))
      .orderBy("g").collect()
    out(0).getSeq[Double](1) shouldBe Seq(3.0, 3.0, 2.0) // dups kept, k-bounded
    out(1).getSeq[Double](1) shouldBe Seq(5.0)           // short group
    out(2).getSeq[Double](1) shouldBe Seq()              // all-null group
  }

  test("merge path: many partitions agree with single partition") {
    import spark.implicits._
    TopKDoubles.register(spark)
    val data = (1 to 1000).map(i => ((i % 7).toString, (i * 37 % 991).toDouble))
    val wide = data.toDF("g", "v").repartition(16)
    val narrow = data.toDF("g", "v").coalesce(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(TopKDoubles.topK(col("v"), 10).as("t"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    run(wide) shouldBe run(narrow)
  }

  test("matches the sort-based formulation on real data") {
    TopKDoubles.register(spark)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val viaAgg = li.groupBy("l_returnflag")
      .agg(TopKDoubles.topK(col("l_extendedprice"), 8).as("t"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
    val viaSort = li.groupBy("l_returnflag")
      .agg(slice(sort_array(collect_list("l_extendedprice"), asc = false), 1, 8).as("t"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
    viaAgg shouldBe viaSort
  }

  test("NaN ranks largest, matching Spark's sort_array ordering") {
    import spark.implicits._
    TopKDoubles.register(spark)
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("a", 9.0), ("a", 3.0))
      .toDF("g", "v")
    val viaAgg = df.groupBy("g").agg(TopKDoubles.topK(col("v"), 2).as("t"))
      .head.getSeq[Double](1)
    val viaSort = df.groupBy("g")
      .agg(slice(sort_array(collect_list("v"), asc = false), 1, 2).as("t"))
      .head.getSeq[Double](1)
    viaAgg.map(java.lang.Double.doubleToLongBits) shouldBe
      viaSort.map(java.lang.Double.doubleToLongBits)
    viaAgg.head.isNaN shouldBe true // NaN is the top-1 in Spark ordering
  }

  test("partial aggregation bounds the shuffle: plan shows partial_topk") {
    val df = SparkEntry.queries("q_topk_agg")(spark, sf)
    df.queryExecution.executedPlan.toString should include("partial_topk")
  }
}
