package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.Df
import graft.compile.Compiler
import graft.io.Tables

/** Nested-collection semantics — the reference's signature hierarchical
  * model (`d.jets[d.jets.pt > 30]`, SURVEY §2 A3/A4 via B19, B21).
  *
  * The testdata is relational, so we first build the event→collection
  * shape the reference assumes: orders as rows, their lineitems as an
  * array-of-struct column (`items`). All per-collection work then runs as
  * higher-order array functions — per-row, no explode/regroup round-trip,
  * inside whole-stage codegen (SURVEY §2 rule of thumb).
  *
  * Scale (100 TB): building the view is ONE shuffle on l_orderkey (the
  * natural key); on a real deployment the table would be bucketed by
  * orderkey making this shuffle-free. Everything downstream of the view
  * is per-row and embarrassingly parallel. `sort_array` gives the
  * collection a deterministic intra-row order (struct compare starts at
  * l_linenumber) so results are reproducible across runs and engines.
  */
object Nested {

  /** Array-of-struct view: one row per order, lineitems nested. */
  def nestedOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")))).as("items"))

  /** A3 (DSL end-to-end): `d.items[d.items.l_quantity > 30]` — count and
    * quantity-sum of the filtered sub-collection, per order. The sums are
    * over integral-valued doubles, so they are order-independent and
    * exact vs the oracle. */
  def qNestedFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Compiler(spark, sfDir).register("nested_orders", nestedOrders(spark, sfDir))
    val d = Df.root("nested_orders")
    val items = d.items
    val big = items(items.l_quantity > 30.0)
    c.toDF(Seq(
      d.l_orderkey,
      big.count().as("n_big"),
      big.l_quantity.sum().as("sum_big_qty")))
      .orderBy("l_orderkey").limit(100000)
  }

  /** A7-over-collections (DSL end-to-end): elementwise arithmetic on
    * nested leaves — `items.price * (1 - items.discount)` lowers to
    * zip_with/transform — then per-order max (order-independent → exact
    * parity). This is the reference's `d.jets.px / d.jets.pt`
    * hierarchical elementwise model. */
  def qNestedTransform(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.dsl.Df.NumericLhs
    val c = Compiler(spark, sfDir).register("nested_orders", nestedOrders(spark, sfDir))
    val d = Df.root("nested_orders")
    val items = d.items
    val rev = items.l_extendedprice * (1.0 - items.l_discount)
    c.toDF(Seq(
      d.l_orderkey,
      graft.dsl.Funcs.round(rev.max(), 4).as("max_rev")))
      .orderBy("l_orderkey").limit(100000)
  }

  /** B21 explode/unnest: flatten the nested view back to rows —
    * round-trips nest∘unnest ≡ identity against the flat oracle. */
  def qExplode(spark: SparkSession, sfDir: String): DataFrame =
    nestedOrders(spark, sfDir)
      .select(col("l_orderkey"), explode(col("items")).as("item"))
      .select(
        col("l_orderkey"),
        col("item.l_linenumber").as("l_linenumber"),
        col("item.l_quantity").as("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber").limit(1000000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nested_filter" -> (qNestedFilter _),
    "q_nested_transform" -> (qNestedTransform _),
    "q_explode" -> (qExplode _),
  )

  val oracle: Map[String, String] = Map(
    // n_big counts per order INCLUDING orders whose items all fail the
    // mask (nested filter keeps the row, empties the collection) — hence
    // FILTER-clause aggregation, not a WHERE.
    "q_nested_filter" ->
      """SELECT l_orderkey,
        | count(*) FILTER (WHERE l_quantity > 30) AS n_big,
        | coalesce(sum(l_quantity) FILTER (WHERE l_quantity > 30), 0.0) AS sum_big_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100000""".stripMargin,
    "q_nested_transform" ->
      """SELECT l_orderkey,
        | round(max(l_extendedprice * (1.0 - l_discount)), 4) AS max_rev
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100000""".stripMargin,
    "q_explode" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000000""".stripMargin,
  )
}
