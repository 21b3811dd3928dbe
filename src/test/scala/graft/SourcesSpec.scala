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
}
