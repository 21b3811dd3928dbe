package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.plans.RangeJoinOp

/** GraftShuffledRangeJoinExec (plans.RangeJoin, partitioned tier):
  * explicit-API results match the broadcast tier and the nested-loop
  * fallback — including ties, NaN/-0.0, NULL bounds, strict bounds,
  * all-bucket-spanning intervals and empty sides — and the automatic
  * tiering picks the partitioned exec when the build side cannot
  * broadcast. */
class ShuffledRangeJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def sortedRows(df: DataFrame): Array[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }).sortBy(_.mkString("|"))

  private def withoutRangeJoin[T](body: => T): T = {
    spark.conf.set(graft.plans.RangeJoinStrategy.EnabledKey, "false")
    try body finally spark.conf.unset(graft.plans.RangeJoinStrategy.EnabledKey)
  }

  test("q_join_range_part plans through GraftShuffledRangeJoin and equals q_join_range") {
    val part = SparkEntry.queries("q_join_range_part")(spark, sf)
    val p = plan(part)
    p should include("GraftShuffledRangeJoin")
    (p should not).include("BroadcastNestedLoopJoin")
    sortedRows(part) shouldBe sortedRows(SparkEntry.queries("q_join_range")(spark, sf))
  }

  test("partitioned tier matches the nested-loop fallback on tie/NaN/null cases") {
    import spark.implicits._
    val points = Seq(Some(1.0), Some(5.0), Some(10.0), Some(5.0), None,
      Some(Double.NaN), Some(0.0), Some(-0.0))
      .toDF("p").select(monotonically_increasing_id().as("pid"), col("p"))
    val ivals = Seq(
      (1L, Some(0.0), Some(20.0)),   // covers the whole domain → every bucket
      (2L, Some(5.0), Some(5.0)),    // degenerate [5,5]
      (3L, Some(5.0), Some(7.0)),
      (4L, Some(0.0), Some(4.0)),
      (5L, Some(6.0), None),         // NULL hi never matches
      (6L, None, Some(9.0)),         // NULL lo never matches
      (7L, Some(Double.NaN), Some(Double.NaN)), // NaN largest, NaN = NaN
      (8L, Some(-0.0), Some(0.0))    // -0.0 equals 0.0
    ).toDF("iid", "lo", "hi")
    val custom = RangeJoinOp.rangePartitioned(points, ivals,
      points("p"), ivals("lo"), ivals("hi"))
    plan(custom) should include("GraftShuffledRangeJoin")
    val fallback = withoutRangeJoin {
      val f = points.join(broadcast(ivals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      plan(f) should include("BroadcastNestedLoopJoin")
      sortedRows(f)
    }
    sortedRows(custom) shouldBe fallback
  }

  test("strict bounds through the explicit API match the fallback") {
    import spark.implicits._
    val points = Seq(1.0, 5.0, 5.0, 7.0, 10.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val ivals = Seq((1L, 5.0, 7.0), (2L, 0.0, 5.0), (3L, 7.0, 10.0))
      .toDF("iid", "lo", "hi")
    val custom = RangeJoinOp.rangePartitioned(points, ivals,
      points("p"), ivals("lo"), ivals("hi"), strictLo = true, strictHi = true)
    val fallback = withoutRangeJoin {
      sortedRows(points.join(broadcast(ivals),
        col("p") > col("lo") && col("p") < col("hi")))
    }
    sortedRows(custom) shouldBe fallback
  }

  test("randomized parity sweep vs the fallback (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(987)
    def v() = (rnd.nextInt(40) - 20) / 2.0
    val points = (1 to 300).map(i => (i.toLong, v())).toDF("pid", "p")
    val ivals = (1 to 80).map { i =>
      val a = v(); val b = v()
      (i.toLong, math.min(a, b), math.max(a, b))
    }.toDF("iid", "lo", "hi")
    val custom = RangeJoinOp.rangePartitioned(points, ivals,
      points("p"), ivals("lo"), ivals("hi"))
    val fallback = withoutRangeJoin {
      sortedRows(points.join(broadcast(ivals),
        col("p") >= col("lo") && col("p") <= col("hi")))
    }
    fallback.length should be > 0
    sortedRows(custom) shouldBe fallback
  }

  test("degenerate point distribution (all values equal) still matches the fallback") {
    import spark.implicits._
    // every sampled quantile is identical → boundaries collapse via
    // .distinct to a single split; correctness must survive the
    // one-bucket degenerate case
    val points = (1 to 500).map(i => (i.toLong, 7.5)).toDF("pid", "p")
    val ivals = Seq((1L, 7.0, 8.0), (2L, 7.5, 7.5), (3L, 8.0, 9.0))
      .toDF("iid", "lo", "hi")
    val custom = RangeJoinOp.rangePartitioned(points, ivals,
      points("p"), ivals("lo"), ivals("hi"))
    val fallback = withoutRangeJoin {
      sortedRows(points.join(broadcast(ivals),
        col("p") >= col("lo") && col("p") <= col("hi")))
    }
    fallback.length shouldBe 1000 // 500 points × intervals 1 and 2
    sortedRows(custom) shouldBe fallback
  }

  test("empty sides produce empty results, not failures") {
    import spark.implicits._
    val noPoints = Seq.empty[(Long, Double)].toDF("pid", "p")
    val ivals = Seq((1L, 0.0, 9.0)).toDF("iid", "lo", "hi")
    RangeJoinOp.rangePartitioned(noPoints, ivals,
      noPoints("p"), ivals("lo"), ivals("hi")).count() shouldBe 0L
    val points = Seq((1L, 1.0)).toDF("pid", "p")
    val noIvals = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    RangeJoinOp.rangePartitioned(points, noIvals,
      points("p"), noIvals("lo"), noIvals("hi")).count() shouldBe 0L
  }

  test("SQL metrics: output and replicated-row counts are recorded") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val points = (1 to 100).map(i => (i.toLong, i / 10.0)).toDF("pid", "p")
      val ivals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi") // spans all buckets
      val df = RangeJoinOp.rangePartitioned(points, ivals,
        points("p"), ivals("lo"), ivals("hi"))
      df.collect().length shouldBe 100
      val node = df.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GraftShuffledRangeJoinExec => g
      }.get
      node.metrics("numOutputRows").value shouldBe 100L
      // the one interval replicates to every bucket the sampled
      // boundaries produced (>= 1)
      node.metrics("replicatedRows").value should be >= 1L
      // broadcast tier records build rows + outputs too
      val b = points.join(broadcast(ivals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      b.collect().length shouldBe 100
      val bn = b.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GraftRangeJoinExec => g
      }.get
      bn.metrics("numOutputRows").value shouldBe 100L
      bn.metrics("buildRows").value shouldBe 1L
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("auto-tier: over-threshold build side plans the partitioned exec") {
    import spark.implicits._
    val points = (1 to 50).map(i => (i.toLong, i / 2.0)).toDF("pid", "p")
    val ivals = (1 to 20).map(i => (i.toLong, i - 1.0, i + 1.0)).toDF("iid", "lo", "hi")
    val cond = col("p") >= col("lo") && col("p") <= col("hi")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = points.join(ivals, cond)
      plan(df) should include("GraftShuffledRangeJoin")
      // kill switch for the partitioned tier falls back to Spark planning
      spark.conf.set(graft.plans.RangeJoinStrategy.ShuffledEnabledKey, "false")
      val off = points.join(ivals, cond)
      (plan(off) should not).include("GraftShuffledRangeJoin")
      spark.conf.unset(graft.plans.RangeJoinStrategy.ShuffledEnabledKey)
      // and the partitioned result still matches the fallback
      val fallback = withoutRangeJoin { sortedRows(points.join(ivals, cond)) }
      sortedRows(df) shouldBe fallback
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(graft.plans.RangeJoinStrategy.ShuffledEnabledKey)
    }
  }
}
