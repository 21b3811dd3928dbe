package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Extras

/** Plan-shape pins for the SQL-frontend suite (r15 verdict item 5):
  * the entries are value-gated by the shared-text oracle; what the
  * oracle can't see is whether the ANALYZER lowered them to the plans
  * a 100 TB run needs — correlated EXISTS must decorrelate to a semi
  * join (never a per-row subquery probe), the IN-subquery must become
  * a semi join, and the dimension tables must broadcast rather than
  * shuffle the fact side. */
class SqlSuiteSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def plan(name: String): String = {
    graft.io.Tables.registerAll(spark, sf)
    spark.sql(Extras.sqlSuite(name)).queryExecution.executedPlan.toString
  }

  test("q_sql_q4: correlated EXISTS decorrelates to a semi join") {
    val p = plan("q_sql_q4")
    p should include("LeftSemi")
    p should not include "InSubquery"
  }

  test("q_sql_q18: IN-subquery becomes a semi join") {
    plan("q_sql_q18") should include("LeftSemi")
  }

  test("q_sql_q5/q7/q8: dimension joins broadcast") {
    Seq("q_sql_q5", "q_sql_q7", "q_sql_q8").foreach { q =>
      withClue(s"$q: ") {
        val p = plan(q)
        p should include("BroadcastHashJoin")
        p should not include "BroadcastNestedLoopJoin"
        p should not include "CartesianProduct"
      }
    }
  }

  // ---- round-16 completion: the remaining analyzer surfaces ----

  test("q_sql_q6: every predicate reaches the parquet scan") {
    // read the scan's own metadata — the plan toString truncates the
    // PushedFilters list past ~100 chars
    graft.io.Tables.registerAll(spark, sf)
    val pushed = spark.sql(Extras.sqlSuite("q_sql_q6"))
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metadata("PushedFilters")
      }.mkString
    // shipdate bounds, discount band, quantity cap — all pushable
    pushed should include("GreaterThanOrEqual(l_shipdate")
    pushed should include("LessThan(l_shipdate")
    pushed should include("GreaterThanOrEqual(l_discount,0.05)")
    pushed should include("LessThanOrEqual(l_discount,0.07)")
    pushed should include("LessThan(l_quantity,24.0)")
  }

  test("q_sql_q16: NOT IN lowers to an anti join, never a per-row probe") {
    val p = plan("q_sql_q16")
    p should include("LeftAnti")
    p should not include "InSubquery"
  }

  test("q_sql_q17: correlated scalar avg decorrelates to one grouped agg") {
    val p = plan("q_sql_q17")
    // the per-part average must come back as a join against an
    // aggregate, not a subquery re-executed per outer row
    p should not include "ScalarSubquery"
    p should include("HashAggregate")
    p should not include "CartesianProduct"
  }

  test("q_sql_q21: EXISTS + NOT EXISTS both decorrelate") {
    val p = plan("q_sql_q21")
    p should include("LeftSemi")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_sql_q22: scalar threshold is a one-row subquery, anti join for the rest") {
    val p = plan("q_sql_q22")
    // the uncorrelated avg is legitimately a ScalarSubquery (executed
    // once, broadcast as a literal); the NOT EXISTS must be an anti join
    p should include("LeftAnti")
    p should not include "CartesianProduct"
  }

  test("q_sql_q13: LEFT JOIN with the non-key ON condition survives") {
    val p = plan("q_sql_q13")
    p should include("LeftOuter")
    p should not include "CartesianProduct"
  }

  // ---- round-17 completion: the partsupp-analog trio (Q2/Q11/Q20) ----

  test("q_sql_q2: correlated scalar MIN decorrelates to a grouped agg + join") {
    val p = plan("q_sql_q2")
    // the per-part regional minimum must come back as min-aggregate
    // rows joined on (cost, partkey) — never a subquery probe per
    // outer row, never a plan-less cross product
    p should include("HashAggregate")
    p should not include "ScalarSubquery"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q_sql_q11: global share threshold executes once; dims broadcast") {
    val p = plan("q_sql_q11")
    // the threshold is an UNcorrelated scalar subquery — one execution,
    // result broadcast as a literal (the q_sql_q22 contract); the
    // per-part aggregation's joins must broadcast the dims
    p should include("Subquery subquery")
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q_sql_q20: nested IN with correlated agg decorrelates fully") {
    val p = plan("q_sql_q20")
    // outer IN → semi join; the correlated 0.5·sum(qty) → a grouped
    // aggregate joined on (partkey, suppkey) with the availqty
    // comparison as the join condition — no per-row re-execution
    p should include("LeftSemi")
    p should include("HashAggregate")
    p should not include "ScalarSubquery"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  // ---- round-18: the materialized partsupp dim (r17 verdict item 8) ----

  test("partsupp queries: body-over-materialized-view ≡ the full CTE text, row for row") {
    // the production entries read the session-materialized partsupp
    // snapshot; the oracle (and this reference form) re-derives the
    // CTE — the two must agree exactly for all four ps queries
    for (name <- Seq("q_sql_q2", "q_sql_q9", "q_sql_q11", "q_sql_q20")) {
      val viaView = SparkEntry.queries(name)(spark, sf).collect().toSeq
      graft.io.Tables.registerAll(spark, sf)
      val viaCte = spark.sql(Extras.sqlSuite(name)).collect().toSeq
      withClue(s"$name: ") { viaView shouldBe viaCte }
    }
  }

  test("partsupp entries scan the materialized dim, not a per-query lineitem derive") {
    // Q11 touches no fact table at all once the dim is materialized:
    // its plan reads the partsupp snapshot (twice — outer + the global
    // scalar subquery) and never opens lineitem; this is what collapses
    // the fixture's double-derivation cost (LLMBASELINE.md note)
    val p = SparkEntry.queries("q_sql_q11")(spark, sf)
      .queryExecution.executedPlan.toString
    p should include("graft_partsupp_")
    p should not include "lineitem.parquet"
  }
}
