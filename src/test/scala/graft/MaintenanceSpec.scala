package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Maintenance

/** Merge/SCD2 invariants beyond the oracle: row accounting of the three
  * action classes, and interval-table coverage/ordering. */
class MaintenanceSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("merge accounting: |result| = |snapshot| - deletes + inserts, all classes non-vacuous") {
    val orders = graft.io.Tables.orders(spark, sf)
    val n = orders.count()
    val nDel = orders.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 10 === 2).count()
    val out = Maintenance.qMergeUpsert(spark, sf).cache()
    out.count() shouldBe n - nDel + nIns
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc("inserted") shouldBe nIns
    bySrc("updated") shouldBe orders.filter(col("o_orderkey") % 10 === 1).count()
    all(Seq("kept", "updated", "inserted").map(bySrc.getOrElse(_, 0L))) should be > 0L
    // no deleted key survives; every inserted key is the negation of one
    out.filter(col("okey") % 10 === 0 && col("okey") > 0).count() shouldBe 0
  }

  test("scd2 covers every event exactly once and intervals chain per user") {
    val out = Maintenance.qScd2(spark, sf).cache()
    val events = graft.io.Tables.events(spark, sf)
    out.agg(sum("n_events")).head.getLong(0) shouldBe events.count()
    // exactly one open interval (valid_to null) per user
    val users = events.select("user_id").distinct().count()
    out.filter(col("valid_to").isNull).count() shouldBe users
    // intervals are well-formed (valid_to may EQUAL valid_from when a
    // type change happens within one timestamp tick) and consecutive
    // runs differ in type
    out.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count() shouldBe 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    out.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("prev_type") === col("event_type"))
      .count() shouldBe 0
  }
}
