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
}
