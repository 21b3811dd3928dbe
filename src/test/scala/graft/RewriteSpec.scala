package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Auto-vectorization rule (plans.VecDotRewrite, injected by
  * GraftExtensions): the declarative aggregate(zip_with(...)) dot product
  * is rewritten to the native kernels; near-miss shapes are left alone;
  * the rewrite is value-exact vs the genuine un-rewritten HOF execution
  * (toggled via spark.sql.optimizer.excludedRules). */
class RewriteSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val RuleName = "graft.plans.VecDotRewrite"

  private def hofDotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def hofDotQ8(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules", RuleName)
    try body finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("declarative float dot is rewritten to the native vec_dot kernel") {
    val df = emb.select(hofDotF(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.optimizedPlan.toString
    plan should include("vec_dot")
    (plan should not).include("aggregate(zip_with")
  }

  test("declarative int8 dot is rewritten to vec_dot_i8") {
    val q = emb.select(transform(col("embedding"),
      x => round(x.cast("double") * 10, 0).cast("byte")).as("qv"))
    val df = q.select(hofDotQ8(col("qv"), col("qv")).as("d"))
    df.queryExecution.optimizedPlan.toString should include("vec_dot_i8")
  }

  test("excludedRules disables the rewrite (HOF plan executes as written)") {
    withRuleDisabled {
      val df = emb.select(hofDotF(col("embedding"), col("embedding")).as("d"))
      (df.queryExecution.optimizedPlan.toString should not).include("vec_dot")
    }
  }

  test("rewrite is value-exact vs the un-rewritten HOF execution") {
    def run() = emb.orderBy("vec_id")
      .select(hofDotF(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    val rewritten = run()
    val plain = withRuleDisabled { run() }
    rewritten.length shouldBe plain.length
    rewritten.zip(plain).foreach { case (a, b) =>
      // bit-exact, not approximate — same widening, same fold order
      java.lang.Double.doubleToLongBits(a) shouldBe
        java.lang.Double.doubleToLongBits(b)
    }
  }

  test("near-miss shapes are left alone") {
    // wrong zero
    val wrongZero = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, x) => acc + x).as("d"))
    (wrongZero.queryExecution.optimizedPlan.toString should not)
      .include("vec_dot")
    // not a product of the two variables (sum of squares of LEFT only)
    val notProduct = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, _) => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d"))
    (notProduct.queryExecution.optimizedPlan.toString should not)
      .include("vec_dot")
    // double arrays (no float kernel applies)
    val dbl = emb.select(transform(col("embedding"),
      x => x.cast("double")).as("dv"))
      .select(aggregate(zip_with(col("dv"), col("dv"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d"))
    (dbl.queryExecution.optimizedPlan.toString should not).include("vec_dot")
    // non-left-fold merge (x + acc) — addition order is part of the
    // float contract, the rule must not assume commutativity of the fold
    val swapped = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => x + acc).as("d"))
    (swapped.queryExecution.optimizedPlan.toString should not)
      .include("vec_dot")
  }
}
