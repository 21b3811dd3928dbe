package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops._

/** Per-operator data tests on sf0.001 with hand-computed / independently
  * derived expectations (SURVEY §5.2.2) — distinct from the DuckDB oracle
  * gate, which runs at sf0.01 via Verify. */
class OperatorSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")

  test("B4: scan filter count equals the raw-Spark count") {
    Relational.qScanFilter(spark, sf).head.getLong(0) shouldBe
      li.filter(col("l_quantity") > 25).count()
  }

  test("B9: groupby aggregate partitions all rows exactly once") {
    val r = Relational.qGroupbyAgg(spark, sf)
    r.agg(F.sum("cnt")).head.getLong(0) shouldBe li.count()
  }

  test("B5/B6: left join row count = matched orders + orderless customers; semi+anti partition customers") {
    val matched = orders.join(customer,
      col("o_custkey") === col("c_custkey")).count()
    val orderless = customer.join(orders,
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    Joins.qJoinLeft(spark, sf).count() shouldBe (matched + orderless)

    val semiP = customer.join(orders.filter(col("o_orderstatus") === "P"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    Joins.qJoinAnti(spark, sf).count() shouldBe (customer.count() - semiP)
  }

  test("B8: as-of join — every purchase appears exactly once; err_ts <= ts") {
    val asof = Joins.qJoinAsof(spark, sf)
    val purchases = graft.io.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    asof.count() shouldBe purchases.count()
    asof.filter(col("err_ts") > col("ts")).count() shouldBe 0L
  }

  test("B21: explode round-trips the nested view back to the flat table") {
    Nested.qExplode(spark, sf).count() shouldBe li.count()
  }

  test("B14: except + intersect partition the distinct custkey set") {
    val allC = orders.select("o_custkey").distinct().count()
    val fC = orders.filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    Scalar.qExcept(spark, sf).count() shouldBe (allC - fC)
  }

  test("B23: exact-dedup keepers cover every distinct text exactly once") {
    val d = LlmOps.qDedupExact(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    d.agg(F.sum("n_dups")).head.getLong(0) shouldBe docs.count()
    d.select("keeper").distinct().count() shouldBe d.count()
  }

  test("B23: MinHash-LSH candidates are a subset of (and here equal to) exact Jaccard pairs") {
    val exact = LlmOps.qNgramJaccard(spark, sf).select("da", "db").collect().toSet
    val lsh = LlmOps.qMinhashLsh(spark, sf).select("da", "db").collect().toSet
    lsh.subsetOf(exact) shouldBe true
  }

  test("B24: cosine top-k returns k rows per query, cosine within [-1, 1]") {
    val r = LlmOps.qSimTopk(spark, sf)
    val counts = r.groupBy("qid").count().collect()
    all(counts.map(_.getLong(1))) shouldBe 10L
    r.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() shouldBe 0L
  }

  test("B28: UDAF sum-of-squares equals the expression form") {
    val viaUdaf = Analytic.qUdaf(spark, sf).collect()
    val viaExpr = li.groupBy("l_returnflag")
      .agg(F.sum(col("l_quantity") * col("l_quantity")).as("sum_sq_qty"))
      .orderBy("l_returnflag").collect()
    viaUdaf shouldBe viaExpr
  }

  test("B12: analytic window — quartiles in range, running total monotone per customer") {
    val r = Analytic.qWindowAnalytic(spark, sf)
    r.filter(col("quartile") < 1 || col("quartile") > 4).count() shouldBe 0L
    // exactly one window-edge row (null lag / null lead) per customer
    val nCust = r.select("o_custkey").distinct().count()
    r.filter(col("prev_price").isNull).count() shouldBe nCust
    r.filter(col("next_price").isNull).count() shouldBe nCust
  }
}
