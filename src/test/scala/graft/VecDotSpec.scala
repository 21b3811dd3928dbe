package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.expressions.FloatVectorDot

/** Native vec_dot Expression: value parity with the HOF formulation
  * (bit-exact — same accumulation order), null handling, SQL registration
  * via both the runtime registry and SparkSessionExtensions builder. */
class VecDotSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** The session under test injects plans.VecDotRewrite, which would
    * rewrite `hofDot` itself into vec_dot and make native-vs-HOF parity
    * vacuous (kernel compared against kernel). Exclude the rule so the
    * HOF side executes as written (RewriteSpec proves the exclusion
    * switch actually works). */
  private def withGenuineHof[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.VecDotRewrite")
    try body finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("vec_dot is bit-identical to the zip_with/aggregate form on real data") {
    withGenuineHof {
      FloatVectorDot.register(spark)
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val both = e.select(
        FloatVectorDot.vecDot(col("embedding"), col("embedding")).as("native"),
        hofDot(col("embedding"), col("embedding")).as("hof"))
      both.queryExecution.optimizedPlan.toString should include("zip_with")
      both.filter(col("native") =!= col("hof")).count() shouldBe 0L
      both.filter(col("native") <= 0.0).count() shouldBe 0L // nonzero vectors
    }
  }

  test("vec_dot null propagation and SQL registration") {
    import spark.implicits._
    FloatVectorDot.register(spark)
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (None, Some(Seq(1f, 1f)))).toDF("a", "b")
    val out = df.selectExpr("vec_dot(a, b) AS d").collect()
    out(0).getDouble(0) shouldBe 11.0
    out(1).isNullAt(0) shouldBe true
  }

  test("vec_dot matches zip_with parity on mismatched lengths and null elements") {
    import spark.implicits._
    FloatVectorDot.register(spark)
    withGenuineHof {
    // zip_with null-pads the shorter array → NULL sum; a NULL element
    // poisons the sum → NULL. vec_dot must agree in both cases (r2 ADVICE).
    val df = Seq(
      (Seq[Option[Float]](Some(1f), Some(2f), Some(3f)), Seq[Option[Float]](Some(1f), Some(1f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(2f), Some(2f))),
      (Seq[Option[Float]](Some(2f), Some(3f)), Seq[Option[Float]](Some(4f), Some(5f)))
    ).toDF("a", "b")
    val out = df.select(
      FloatVectorDot.vecDot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out(0).isNullAt(0) shouldBe true; out(0).isNullAt(1) shouldBe true
    out(1).isNullAt(0) shouldBe true; out(1).isNullAt(1) shouldBe true
    out(2).getDouble(0) shouldBe 23.0; out(2).getDouble(1) shouldBe 23.0
    }
  }

  test("vec_dot rejects wrong input types at analysis time") {
    import spark.implicits._
    FloatVectorDot.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b") // double arrays
    val e = intercept[Exception] { df.selectExpr("vec_dot(a, b)").collect() }
    e.getMessage.toLowerCase should include("vec_dot")
  }
}
