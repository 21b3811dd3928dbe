package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The typed Dataset[T] surface (case-class Encoders): read `.as[T]`,
  * lambda filters, typed groupByKey + Aggregator — the SURVEY §1.2
  * "type safety where it helps" path. Typed lambdas deserialize rows
  * (no codegen'd predicate pushdown), so the engine's ops catalog stays
  * Column-based; this spec documents that the typed door is open and
  * agrees with the untyped plan. */
case class Item(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedApiSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("typed read, filter and groupByKey agree with the Column plan") {
    import spark.implicits._
    val ds = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Item]
    val sumQty = new Aggregator[Item, Double, Double] {
      def zero = 0.0
      def reduce(b: Double, a: Item) = b + a.l_quantity
      def merge(a: Double, b: Double) = a + b
      def finish(b: Double) = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val typed = ds.filter(_.l_quantity > 25)
      .groupByKey(_.l_returnflag)
      .agg(sumQty.toColumn.name("qty"))
      .collect().toMap
    val untyped = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 25)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    typed.keySet shouldBe untyped.keySet
    typed.foreach { case (k, v) => v shouldBe untyped(k) +- 1e-6 }
  }
}
