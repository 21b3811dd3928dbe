package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.Tables

/** B1/B2 breadth beyond parquet: CSV / JSON-lines / ORC round-trips with
  * explicit schemas, and the 100 TB layout primitive — a date-partitioned
  * parquet write whose partition column prunes at scan time (only the
  * matching day's files are touched, regardless of table size). */
class SourcesSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val base = "/tmp/graft_sources"

  test("CSV round-trip with explicit schema") {
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("header", "true").csv(s"$base/nation_csv")
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$base/nation_csv")
    back.orderBy("n_nationkey").collect() shouldBe
      nation.orderBy("n_nationkey").collect()
  }

  test("JSON-lines round-trip with explicit schema") {
    val cust = Tables.customer(spark, sf)
    cust.write.mode("overwrite").json(s"$base/customer_json")
    val back = spark.read.schema(cust.schema).json(s"$base/customer_json")
    back.orderBy("c_custkey").collect() shouldBe
      cust.orderBy("c_custkey").collect()
  }

  test("ORC round-trip") {
    val supp = Tables.supplier(spark, sf)
    supp.write.mode("overwrite").orc(s"$base/supplier_orc")
    val back = spark.read.orc(s"$base/supplier_orc")
    back.orderBy("s_suppkey").collect() shouldBe
      supp.orderBy("s_suppkey").collect()
  }

  test("date-partitioned parquet write prunes partitions at scan time") {
    val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$base/events_by_day")
    val part = spark.read.parquet(s"$base/events_by_day")
    val aDay = part.agg(min("day")).head.getDate(0)
    val pruned = part.filter(col("day") === lit(aDay))
    // the partition predicate must land in PartitionFilters (directory
    // pruning), NOT as a data filter over every file
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("day")
    pruned.count() shouldBe ev.filter(col("day") === lit(aDay)).count()
  }

  test("dynamic partition pruning fires when the partition filter is join-derived") {
    // the 100 TB mechanism: the fact side's partition filter is only
    // known at runtime (from the filtered dimension) — DPP injects a
    // subquery into the scan's partition filters instead of reading
    // every partition
    val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$base/events_dpp")
    val fact = spark.read.parquet(s"$base/events_dpp")
    val days = fact.select("day").distinct().orderBy("day")
      .collect().map(_.getDate(0))
    val aDay = days.head
    // independent dimension filtered on a NON-join column: the optimizer
    // cannot rewrite this into a static partition literal on the fact
    // side, so only runtime (dynamic) pruning can avoid the full scan
    import spark.implicits._
    days.zipWithIndex
      .map { case (d, i) => (d, if (i == 0) "keep" else "drop") }.toSeq
      .toDF("dim_day", "tag")
      .write.mode("overwrite").parquet(s"$base/day_dim")
    // read back from files: a local relation would constant-fold the
    // filter away and DPP needs the selective Filter node to trigger
    val dim = spark.read.parquet(s"$base/day_dim").filter(col("tag") === "keep")
    val joined = fact.join(dim, col("day") === col("dim_day"))
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("dynamicpruning")
    joined.count() shouldBe fact.filter(col("day") === lit(aDay)).count()
  }
}
