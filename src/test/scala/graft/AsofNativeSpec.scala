package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Native-AsOfJoin path (plans.AsOfJoinOp → catalyst AsOfJoin →
  * RewriteAsOfJoin): agrees row-for-row with the union+last window
  * formulation, and the logical node really is constructed and lowered
  * (not silently planned as something else). */
class AsofNativeSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq)

  test("native as-of equals the union+last window formulation") {
    val native = rows("q_join_asof_native")
    val window = rows("q_join_asof")
    native.length shouldBe window.length
    native.length should be > 0
    native.zip(window).foreach { case (n, w) => n shouldBe w }
  }

  test("native as-of with tolerance equals the windowed tolerance variant") {
    val native = rows("q_join_asof_native_tol")
    val window = rows("q_join_asof_tol")
    native.length shouldBe window.length
    native.zip(window).foreach { case (n, w) => n shouldBe w }
    // the tolerance actually bites: some matches are nulled
    val nulled = SparkEntry.queries("q_join_asof_native_tol")(spark, sf)
      .filter(col("err_event_id").isNull).count()
    val matchedPlain = SparkEntry.queries("q_join_asof_native")(spark, sf)
      .filter(col("err_event_id").isNull).count()
    nulled should be > matchedPlain
  }

  test("the catalyst AsOfJoin node is built, then lowered by the optimizer") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, sf)
    df.queryExecution.analyzed.toString should include("AsOfJoin")
    val opt = df.queryExecution.optimizedPlan.toString
    (opt should not).include("AsOfJoin") // RewriteAsOfJoin consumed it
    opt should include("Aggregate")     // …into the min-struct aggregate
  }
}
