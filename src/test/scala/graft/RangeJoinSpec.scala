package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GraftRangeJoinExec (plans.RangeJoin): the injected strategy plans the
  * two-sided band predicate as the custom broadcast+binary-search
  * operator; results are identical to Spark's BroadcastNestedLoopJoin on
  * real data and on crafted tie/overlap/null cases; near-miss conditions
  * fall through to Spark's own planning. */
class RangeJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // doubles compared via their bit pattern: NaN == NaN must hold for
  // row equality (Scala's == on Double NaN is false), and -0.0 vs 0.0
  // differences stay visible
  private def sortedRows(df: DataFrame): Array[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }).sortBy(_.mkString("|"))

  /** Evaluate with the strategy disabled via its kill switch, so the
    * SAME condition plans through Spark's BroadcastNestedLoopJoin. (A
    * `&& lit(true)` decoy conjunct does NOT work — constant folding
    * removes it and the strategy fires anyway.) */
  private def withoutRangeJoin[T](body: => T): T = {
    spark.conf.set(graft.plans.RangeJoinStrategy.EnabledKey, "false")
    try body finally spark.conf.unset(graft.plans.RangeJoinStrategy.EnabledKey)
  }

  test("q_join_range plans through GraftRangeJoin") {
    val df = SparkEntry.queries("q_join_range")(spark, sf)
    df.collect()
    val p = plan(df)
    p should include("GraftRangeJoin")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("custom operator result equals the nested-loop fallback on real data") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_acctbal")
    val cond = col("c_acctbal") >= col("s_acctbal") - 100 &&
      col("c_acctbal") <= col("s_acctbal") + 100
    val custom = cust.join(supp, cond)
    plan(custom) should include("GraftRangeJoin")
    val (fallbackPlan, fallbackRows) = withoutRangeJoin {
      val f = cust.join(supp, cond)
      (plan(f), sortedRows(f))
    }
    fallbackPlan should include("BroadcastNestedLoopJoin")
    sortedRows(custom) shouldBe fallbackRows
    custom.count() should be > 0L
  }

  test("ties, overlapping intervals, strict bounds and NULLs match the fallback") {
    import spark.implicits._
    // points include exact bound hits and a NULL; intervals overlap,
    // share identical lo values, and have hi out of lo order (exercising
    // the prefix-max early-exit), plus a NULL bound that never matches
    val points = Seq(Some(1.0), Some(5.0), Some(10.0), Some(5.0), None,
      Some(Double.NaN), Some(0.0), Some(-0.0))
      .toDF("p").select(monotonically_increasing_id().as("pid"), col("p"))
    val ivals = Seq(
      (1L, Some(0.0), Some(20.0)),   // covers everything
      (2L, Some(5.0), Some(5.0)),    // degenerate [5,5] — tie semantics
      (3L, Some(5.0), Some(7.0)),    // same lo as #2
      (4L, Some(0.0), Some(4.0)),    // hi smaller than #1's despite equal lo
      (5L, Some(6.0), None),         // NULL hi: never matches
      (6L, None, Some(9.0)),         // NULL lo: never matches
      (7L, Some(Double.NaN), Some(Double.NaN)), // Spark: NaN largest, NaN = NaN
      (8L, Some(-0.0), Some(0.0))    // -0.0 must compare equal to 0.0
    ).toDF("iid", "lo", "hi")
    for ((loCmp, hiCmp) <- Seq(
      (col("p") >= col("lo"), col("p") <= col("hi")),
      (col("p") > col("lo"), col("p") < col("hi")),
      (col("lo") <= col("p"), col("hi") >= col("p")))) {
      val cond = loCmp && hiCmp
      val custom = points.join(broadcast(ivals), cond)
      val fallback = withoutRangeJoin {
        val f = points.join(broadcast(ivals), cond)
        plan(f) should include("BroadcastNestedLoopJoin")
        sortedRows(f)
      }
      withClue(s"cond=$cond:") {
        plan(custom) should include("GraftRangeJoin")
        sortedRows(custom) shouldBe fallback
      }
    }
  }

  test("randomized parity sweep vs the fallback (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    // clustered values force many ties and boundary hits
    def v() = (rnd.nextInt(40) - 20) / 2.0
    val points = (1 to 200).map(i => (i.toLong, v())).toDF("pid", "p")
    val ivals = (1 to 60).map { i =>
      val a = v(); val b = v()
      (i.toLong, math.min(a, b), math.max(a, b))
    }.toDF("iid", "lo", "hi")
    val cond = col("p") >= col("lo") && col("p") <= col("hi")
    val custom = points.join(broadcast(ivals), cond)
    plan(custom) should include("GraftRangeJoin")
    val fallback = withoutRangeJoin { sortedRows(points.join(broadcast(ivals), cond)) }
    fallback.length should be > 0
    sortedRows(custom) shouldBe fallback
  }

  test("near-miss shapes fall through to Spark's planning") {
    import spark.implicits._
    val a = Seq((1L, 2.0)).toDF("ak", "av")
    val b = Seq((1L, 1.0, 3.0)).toDF("bk", "lo", "hi")
    // equi conjunct present → not a pure range join
    val equi = a.join(b, col("ak") === col("bk") &&
      col("av") >= col("lo") && col("av") <= col("hi"))
    (plan(equi) should not).include("GraftRangeJoin")
    // two lower bounds, no upper → not an interval
    val twoLo = a.join(b, col("av") >= col("lo") && col("av") > col("hi"))
    (plan(twoLo) should not).include("GraftRangeJoin")
    // bounds on different left expressions → not one point
    val twoPoints = a.join(b, col("av") >= col("lo") && col("ak") <= col("hi"))
    (plan(twoPoints) should not).include("GraftRangeJoin")
    equi.count() shouldBe 1L
  }
}
