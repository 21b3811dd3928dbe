package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Partitioned sort-merge as-of (ops.AsofMerge): row-for-row agreement
  * with the union+last window formulation on real data, hand-built
  * tie/boundary semantics, and the co-partitioned merge plan shape. */
class AsofMergeSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("merge as-of equals the union+last window formulation on events") {
    val merge = SparkEntry.queries("q_join_asof_merge")(spark, sf)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().map(_.toSeq)
    merge.length shouldBe window.length
    merge.length should be > 0
    merge.zip(window).foreach { case (m, w) => m shouldBe w }
  }

  test("merge as-of with tolerance equals the windowed tolerance variant") {
    val merge = SparkEntry.queries("q_join_asof_merge_tol")(spark, sf)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("q_join_asof_tol")(spark, sf)
      .collect().map(_.toSeq)
    merge.length shouldBe window.length
    merge.zip(window).foreach { case (m, w) => m shouldBe w }
    // the tolerance actually bites: more nulled matches than the plain form
    val nulledTol = SparkEntry.queries("q_join_asof_merge_tol")(spark, sf)
      .filter(col("err_event_id").isNull).count()
    val nulledPlain = SparkEntry.queries("q_join_asof_merge")(spark, sf)
      .filter(col("err_event_id").isNull).count()
    nulledTol should be > nulledPlain
  }

  test("tie-breaks: equal-ts error matches (<=); among equal-ts errors the largest id wins") {
    import spark.implicits._
    val t = (us: Long) => new Timestamp(us / 1000L) // whole-ms instants
    // user 1: purchase at 10ms, two errors at exactly 10ms (ids 100, 101),
    //         one earlier error at 5ms (id 99), one later at 20ms (id 102)
    // user 2: purchase at 10ms, no errors at-or-before -> null match
    val ev = Seq(
      (1L, 1L, t(10000), "purchase"),
      (99L, 1L, t(5000), "error"),
      (100L, 1L, t(10000), "error"),
      (101L, 1L, t(10000), "error"),
      (102L, 1L, t(20000), "error"),
      (2L, 2L, t(10000), "purchase"),
      (103L, 2L, t(30000), "error"))
      .toDF("event_id", "user_id", "ts", "event_type")
    // run both formulations over a temp parquet dir shaped like events
    val dir = java.nio.file.Files.createTempDirectory("asof_merge_spec").toString
    ev.withColumn("ts", unix_micros(col("ts")) * 1000L) // ns longs like the raw table
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_join_asof_merge")(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    byId(1L).getLong(3) shouldBe 101L // equal-ts match, largest id among ties
    byId(2L).isNullAt(3) shouldBe true // no error at-or-before
    byId(2L).isNullAt(4) shouldBe true
    // window formulation agrees on the synthetic ties too
    val win = SparkEntry.queries("q_join_asof")(spark, dir).collect().map(_.toSeq)
    out.map(_.toSeq) shouldBe win
  }

  test("plan: co-partitioned CoGroup with per-side sorts, no join, no union-wide window") {
    val df = SparkEntry.queries("q_join_asof_merge")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("CoGroup")
    (plan should not).include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
    (plan should not).include("Window")
    // each side is sorted on (key, time, id) below the CoGroup
    plan should include("ts_us")
    plan should include("err_us")
  }
}
