package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The skewed-JOIN scale story (q_skew_join's doc): when the dim side
  * can't broadcast, AQE's OptimizeSkewedJoin must split the hot
  * partition at runtime — otherwise one task drags the whole stage (the
  * classic 100×-scale surprise). This spec FORCES that shape (sort-merge
  * join, broadcast disabled, thresholds scaled down to local data sizes)
  * and pins (a) the split actually firing in the finalized adaptive plan
  * and (b) exact result equality with the unforced broadcast plan. */
class SkewJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  /** Set session confs for the block, restoring previous values after —
    * the suite shares one session (same discipline as HotBandSpec). */
  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE OptimizeSkewedJoin splits the hot partition of a skewed sort-merge join") {
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local data is KBs, not the 256 MB production default — scale the
      // skew detector down so the same machinery fires
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      // 90% of 200k rows share key 0; payload gives the hot partition
      // real shuffle bytes
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload-"), col("id"), lit("-"), md5(col("id").cast("string")))
          .as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan a separate
      // aggregate query and leave this one un-finalized)
      joined.collect().length shouldBe 200000
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("isFinalPlan=true")
      plan should include("skew=true")
    }
  }

  test("q_skew_join: forced non-broadcast skewed plan ≡ the shipped broadcast plan") {
    val shipped = SparkEntry.queries("q_skew_join")(spark, sf).collect().toSeq
    val forced = withConfs(Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      // same logical query, broadcast hint dropped + threshold off →
      // shuffled join path
      graft.ops.Extras.skewJoinFrom(spark, sf, bcast = false).collect().toSeq
    }
    forced shouldBe shipped
    shipped.size should be > 0
  }
}
