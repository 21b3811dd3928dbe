package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.dsl.{Df, Funcs, UserFuncs}
import graft.compile.Compiler
import graft.io.Tables

/** Window-function breadth (B12), full outer join (B5), UDF/UDAF surface
  * (B28 / A12), math registry (B18), and tf-idf (B22 tail).
  *
  * Scale notes: window queries shuffle once on their partition key
  * (o_custkey — high cardinality, low skew); the UDAF is a partial+final
  * typed aggregate (map-side combine like any built-in); tf-idf is two
  * hash aggregations + a broadcast-joined doc-count — no all-pairs
  * anything.
  */
object Analytic {

  /** B12 breadth: lag/lead/ntile + a running-sum frame, per customer
    * ordered by order date (tie-broken by orderkey for determinism). */
  def qWindowAnalytic(spark: SparkSession, sfDir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(byDate).as("prev_price"),
        lead("o_totalprice", 1).over(byDate).as("next_price"),
        ntile(4).over(byDate).as("quartile"),
        round(sum("o_totalprice").over(running), 2).as("run_total"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(100000)
  }

  /** B12 tail: the rank-statistic windows — percent_rank / cume_dist
    * (exact rationals: one division each, bit-identical cross-engine for
    * the same total order) and first/last/nth_value over an explicit
    * unbounded frame (the default running frame would make last_value
    * row-dependent). Ordering tie-broken by o_orderkey. */
  def qWindowRankStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first_value(col("o_orderkey")).over(full).as("cheapest_ok"),
        last_value(col("o_orderkey")).over(full).as("dearest_ok"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(100000)
  }

  /** B5 full outer: open-order customers vs finished-order customers —
    * nulls appear on BOTH sides. */
  def qJoinFull(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val open = o.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ck_open")).agg(count(lit(1)).as("n_open"))
    val fin = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck_fin")).agg(count(lit(1)).as("n_fin"))
    open.join(fin, col("ck_open") === col("ck_fin"), "full")
      .select(
        coalesce(col("ck_open"), col("ck_fin")).as("custkey"),
        col("n_open"), col("n_fin"))
      .orderBy("custkey")
  }

  /** B28 + A12: an oracled query THROUGH a registered user_func — the
    * placeholder is declared in DSL code and realized as a Spark UDF at
    * compile time (discounted price; SQL-expressible so the oracle can
    * mirror it). */
  def qUdf(spark: SparkSession, sfDir: String): DataFrame = {
    UserFuncs.register("disc_price",
      udf((price: Double, disc: Double) => price * (1.0 - disc)))
    val c = Compiler(spark, sfDir)
    val d = Df.root("lineitem")
    c.toDF(Seq(
      d.l_orderkey, d.l_linenumber,
      Funcs.round(UserFuncs.call("disc_price", d.l_extendedprice, d.l_discount), 4)
        .as("disc_price")))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(10000)
  }

  /** B28 UDAF: typed Aggregator (sum of squares — integral doubles, so
    * exact vs the oracle), partial+final like any built-in aggregate. */
  private object SumSq extends Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: Double): Double = b + a * a
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def qUdaf(spark: SparkSession, sfDir: String): DataFrame = {
    val sumsq = udaf(SumSq)
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(sumsq(col("l_quantity")).as("sum_sq_qty"))
      .orderBy("l_returnflag")
  }

  /** B18 math registry through the DSL (A9): only functions with exact
    * IEEE semantics in both engines (sqrt is correctly rounded; abs/
    * floor/ceil/sign/x*x are exact) — exp/log differ in the last ulp
    * between libm implementations and are exercised in tests instead. */
  def qMathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Compiler(spark, sfDir)
    val d = Df.root("lineitem")
    c.toDF(Seq(
      d.l_orderkey, d.l_linenumber,
      Funcs.round(Funcs.sqrt(d.l_extendedprice), 6).as("sqrt_price"),
      Funcs.abs(d.l_discount - 0.05).as("abs_disc_ctr"),
      Funcs.floor(d.l_quantity / 7.0).cast("long").as("qty_div7"),
      Funcs.ceil(d.l_tax * 100.0).cast("long").as("tax_pct_ceil"),
      Funcs.sign(d.l_quantity - 25.0).as("qty_sign"),
      (d.l_quantity * d.l_quantity).as("qty_sq")))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(10000)
  }

  /** B22 tf-idf (rational form): score = tf × N / df — integer-derived
    * single division so both engines agree exactly (ln-based idf differs
    * in the last ulp across libms). Top-3 terms per doc. */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count() // driver-side scalar: one tiny count, broadcast as literal
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // df (docs containing the token) derived FROM tf — tf's key set is
    // exactly the distinct (doc_id, token) pairs — so the token stream is
    // exploded and shuffled once, not twice (at 100 TB the second full
    // scan+explode is the dominant cost this avoids). The always-true
    // `tf >= 1` keeps the tf column referenced in this branch; without it
    // column pruning rewrites the shared aggregate to a keys-only shape
    // and the two exchange subtrees stop being identical — which is what
    // lets Spark's exchange reuse materialize the shuffle ONCE.
    val df_ = tf.filter(col("tf") >= 1).groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(df_), "token")
      .select(col("doc_id"), col("token"),
        round(col("tf") * lit(n.toDouble) / col("df"), 6).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "token", "score", "rn")
      .orderBy("doc_id", "rn")
  }

  /** B9 tail: exact interpolated percentiles (median + p90) per group —
    * Spark `percentile` and DuckDB `quantile_cont` share the same
    * interpolation definition. The approximate path for 100 TB is
    * `percentile_approx` (bench-only, engine-specific values). */
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"))
      .orderBy("l_returnflag")

  /** Event-funnel analysis (product-analytics workload over `events`):
    * per user, the earliest strictly-ordered view → click → purchase
    * chain, aggregated to per-stage user counts. Each stage is a
    * filtered aggregate joined on user_id (shuffles on the natural key);
    * deterministic because stage times are minima. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame =
    funnel(Tables.events(spark, sfDir))

  /** Transform core, parameterized by the events frame (unit-tested on
    * synthetic data in FunnelRetentionSpec). */
  def funnel(ev: DataFrame): DataFrame = {
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    // stages nest (s3 ⊆ s2 ⊆ s1): left-join the stage times onto the
    // widest stage and count non-nulls in ONE aggregation — no 1×1
    // cross joins of scalar counts
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .agg(count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after_view"),
        count(col("t3")).as("n_purchase_after_click"))
  }

  /** Cohort retention (the other canonical product-analytics shape):
    * users grouped by first-active day, counted per day-offset of later
    * activity. Two hash aggregates + one join on user_id. */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame =
    retention(Tables.events(spark, sfDir))

  /** Transform core (see [[funnel]]). */
  def retention(ev: DataFrame): DataFrame = {
    val cohort = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "offset_days")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_percentile" -> (qPercentile _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_window_analytic" -> (qWindowAnalytic _),
    "q_window_rank_stats" -> (qWindowRankStats _),
    "q_join_full" -> (qJoinFull _),
    "q_udf" -> (qUdf _),
    "q_udaf" -> (qUdaf _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_tfidf" -> (qTfidf _),
  )

  val oracle: Map[String, String] = Map(
    // ts comparisons on the µs-truncated timestamps on both sides
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_view,
        |  (SELECT count(*) FROM s2) AS n_click_after_view,
        |  (SELECT count(*) FROM s3) AS n_purchase_after_click""".stripMargin,
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT cohort_day,
        |  date_diff('day', cohort_day, day) AS offset_days,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | ntile(4) OVER w AS quartile,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS UNBOUNDED PRECEDING), 2) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey LIMIT 100000""".stripMargin,
    "q_window_rank_stats" ->
      """SELECT o_custkey, o_orderkey,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd,
        | first_value(o_orderkey) OVER w2 AS cheapest_ok,
        | last_value(o_orderkey) OVER w2 AS dearest_ok,
        | nth_value(o_orderkey, 2) OVER w2 AS second_ok
        |FROM orders
        |WINDOW
        | w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        | w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey LIMIT 100000""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(ck_open, ck_fin) AS custkey, n_open, n_fin FROM (
        |  SELECT o_custkey AS ck_open, count(*) AS n_open FROM orders
        |  WHERE o_orderstatus = 'O' GROUP BY 1) a
        |FULL JOIN (
        |  SELECT o_custkey AS ck_fin, count(*) AS n_fin FROM orders
        |  WHERE o_orderstatus = 'F' GROUP BY 1) b
        |ON ck_open = ck_fin
        |ORDER BY custkey""".stripMargin,
    "q_udf" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice * (1.0 - l_discount), 4) AS disc_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10000""".stripMargin,
    "q_udaf" ->
      """SELECT l_returnflag, sum(l_quantity * l_quantity) AS sum_sq_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sqrt(l_extendedprice), 6) AS sqrt_price,
        | abs(l_discount - 0.05) AS abs_disc_ctr,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7,
        | CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_pct_ceil,
        | CASE WHEN l_quantity - 25.0 > 0 THEN 1.0
        |      WHEN l_quantity - 25.0 < 0 THEN -1.0 ELSE 0.0 END AS qty_sign,
        | l_quantity * l_quantity AS qty_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10000""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    round(tf.tf * (SELECT n FROM n) * 1.0 / df.df, 6) AS score
        |  FROM tf JOIN df USING (token))
        |SELECT doc_id, token, score, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token) AS rn FROM scored)
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
  )
}
