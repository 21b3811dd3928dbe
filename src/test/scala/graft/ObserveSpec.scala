package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `df.observe` + QueryExecutionListener: per-run data-quality metrics
  * collected DURING the pass — no second scan. At 100 TB a pipeline
  * cannot afford a separate `count()`/`agg()` job just to validate a
  * stage's output; observe rides the existing job for free. */
class ObserveSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("observed metrics arrive with the job, values match a direct agg") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        qe.observedMetrics.get("quality_gate").foreach(r => seen = Some(r))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val observed = li.observe("quality_gate",
        count(lit(1)).as("rows"),
        count(when(col("l_quantity").isNull, 1)).as("null_qty"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      // one real pass over the data (a write-shaped action)
      val total = observed.filter(col("l_quantity") > 0).count()
      total should be > 0L
      // listener delivery is asynchronous — bounded wait
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val row = seen.getOrElse(fail("observed metrics never arrived"))
      row.getAs[Long]("rows") shouldBe li.count()
      row.getAs[Long]("null_qty") shouldBe 0L
      row.getAs[Double]("revenue") shouldBe
        li.agg(round(sum("l_extendedprice"), 2)).head.getDouble(0)
    } finally spark.listenerManager.unregister(listener)
  }
}
