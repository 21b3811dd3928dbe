package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Native-AsOfJoin path (plans.AsOfJoinOp → catalyst AsOfJoin →
  * RewriteAsOfJoin): agrees row-for-row with the union+last window
  * formulation, and the logical node really is constructed and lowered
  * (not silently planned as something else).
  *
  * SPEC-ONLY TIER: since round 11 the native variants are NOT
  * `SparkEntry.queries` entries — Catalyst's own lowering nested-loops
  * the distinct left as-of keys against the whole right side, so the
  * production map must not carry the plan. The oracle-parity guarantee
  * lives HERE instead: row-for-row equality against q_join_asof, which
  * remains under the DuckDB oracle gate — transitively the native node
  * still answers the oracle exactly. */
class AsofNativeSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq)

  test("demoted from the production map; windowed twins remain oracled") {
    SparkEntry.queries.keySet should not contain "q_join_asof_native"
    SparkEntry.queries.keySet should not contain "q_join_asof_native_tol"
    SparkEntry.oracleSql.keySet should contain("q_join_asof")
    SparkEntry.oracleSql.keySet should contain("q_join_asof_tol")
  }

  test("native as-of equals the union+last window formulation") {
    val native = ops.Joins.qJoinAsofNative(spark, sf).collect().map(_.toSeq)
    val window = rows("q_join_asof")
    native.length shouldBe window.length
    native.length should be > 0
    native.zip(window).foreach { case (n, w) => n shouldBe w }
  }

  test("native as-of with tolerance equals the windowed tolerance variant") {
    val native = ops.Joins.qJoinAsofNativeTol(spark, sf).collect().map(_.toSeq)
    val window = rows("q_join_asof_tol")
    native.length shouldBe window.length
    native.zip(window).foreach { case (n, w) => n shouldBe w }
    // the tolerance actually bites: some matches are nulled
    val nulled = ops.Joins.qJoinAsofNativeTol(spark, sf)
      .filter(col("err_event_id").isNull).count()
    val matchedPlain = ops.Joins.qJoinAsofNative(spark, sf)
      .filter(col("err_event_id").isNull).count()
    nulled should be > matchedPlain
  }

  test("the catalyst AsOfJoin node is built, then lowered by the optimizer") {
    val df = ops.Joins.qJoinAsofNative(spark, sf)
    df.queryExecution.analyzed.toString should include("AsOfJoin")
    val opt = df.queryExecution.optimizedPlan.toString
    (opt should not).include("AsOfJoin") // RewriteAsOfJoin consumed it
    opt should include("Aggregate")     // …into the min-struct aggregate
  }
}
