package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.Tables

/** The SQL front-end is part of the engine surface: the same session
  * serves `spark.sql` text over registered views, and the result must be
  * identical to the DataFrame-built plan (both lower to the same
  * Catalyst operators). */
class SqlFrontendSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("TPC-H Q1-ish as SQL text ≡ the DataFrame-built q_groupby_agg") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDf = ops.Relational.qGroupbyAgg(spark, sf).collect()
    viaSql shouldBe viaDf
  }

  test("events view (nanos shim) is SQL-queryable") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= timestamp'2024-01-01 00:00:00'")
      .head.getLong(0)
    n should be > 0L
  }
}
