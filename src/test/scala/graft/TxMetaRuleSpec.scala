package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** Pins the TxMetadataCount optimizer rule (plans/TxMetadataCount.scala):
  * an unfiltered count(*) over a tx relation must optimize to a one-row
  * LocalRelation (no scan at all), while every shape the manifest
  * cannot answer — filters, grouping, deletion vectors, other
  * aggregates — must keep the ordinary scan plan and stay correct. */
class TxMetaRuleSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val dir = s"/tmp/graft_metarule_p${ProcessHandle.current.pid}"

  private lazy val root: String = {
    val r = s"$dir/plain"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    TxTable.create(spark, r,
      spark.range(0, 500).select(col("id").as("k"),
        (col("id") % 9).cast("double").as("v")), "k", nFiles = 4)
    r
  }

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collectFirst { case l: LocalRelation => l }.isDefined &&
      opt.collectFirst { case r: LogicalRelation => r }.isEmpty
  }

  test("count(*) over the relation collapses to a LocalRelation, right value") {
    val df = TxRelation.read(spark, root).groupBy().count()
    isMetadataOnly(df) shouldBe true
    df.head.getLong(0) shouldBe 500L
  }

  test("SQL count(*) through a temp view collapses too") {
    TxRelation.read(spark, root).createOrReplaceTempView("tx_meta_v")
    val df = spark.sql("SELECT count(*) AS n FROM tx_meta_v")
    isMetadataOnly(df) shouldBe true
    df.head.getLong(0) shouldBe 500L
  }

  test("min/max of the cluster key answer from the manifest; mixes work") {
    val df = TxRelation.read(spark, root)
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
    isMetadataOnly(df) shouldBe true
    val r = df.head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((500L, 0L, 499L))
    // min/max of a NON-key column needs real data → scan plan kept
    val other = TxRelation.read(spark, root).agg(min("v").as("mv"))
    isMetadataOnly(other) shouldBe false
    other.head.getDouble(0) shouldBe 0.0
  }

  test("filter, grouping, and non-count aggregates all block the rewrite") {
    val filtered = TxRelation.read(spark, root)
      .filter(col("k") < 100).groupBy().count()
    isMetadataOnly(filtered) shouldBe false
    filtered.head.getLong(0) shouldBe 100L
    val grouped = TxRelation.read(spark, root)
      .groupBy(col("v")).count()
    isMetadataOnly(grouped) shouldBe false
    grouped.count() shouldBe 9L
    val other = TxRelation.read(spark, root)
      .agg(count(lit(1)).as("n"), sum("k").as("s"))
    isMetadataOnly(other) shouldBe false
    other.head.getLong(1) shouldBe (0L until 500L).sum
  }

  test("deletion vectors block the rewrite; the scan count stays exact") {
    val r = s"$dir/mor"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    TxTable.create(spark, r,
      spark.range(0, 200).select(col("id").as("k"), lit(1.0).as("v")),
      "k", nFiles = 2)
    TxTable.deleteMor(spark, r, 50L, 59L)
    val df = TxRelation.read(spark, r).groupBy().count()
    isMetadataOnly(df) shouldBe false // anti-join in the plan
    df.head.getLong(0) shouldBe 190L
    // …and the manifest API agrees (dv rows subtracted)
    TxTable.countRows(r) shouldBe 190L
  }
}
