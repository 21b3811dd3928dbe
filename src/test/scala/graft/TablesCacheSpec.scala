package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.Tables

/** Tables' per-session read cache: repeated reads of the same table in
  * one session must return the SAME DataFrame instance (no re-listing /
  * footer re-reads — this is what keeps warm bench runs cheap), while
  * different scale-factor paths stay distinct. */
class TablesCacheSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("same (session, path, table) returns the identical DataFrame instance") {
    val a = Tables.lineitem(spark, sf)
    val b = Tables.lineitem(spark, sf)
    (a eq b) shouldBe true
    val e1 = Tables.events(spark, sf)
    val e2 = Tables.events(spark, sf)
    (e1 eq e2) shouldBe true
  }

  test("different sfDir paths are cached separately") {
    val small = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val bigger = Tables.lineitem(spark, "/root/testdata/sf0.01")
    (small eq bigger) shouldBe false
    small.count() should be < bigger.count()
  }
}
