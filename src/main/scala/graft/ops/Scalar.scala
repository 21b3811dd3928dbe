package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scalar-function and set-operation breadth (SURVEY §2 B10, B14–B17,
  * B20). All plans are scan→project or scan→partial-agg→final-agg shapes:
  * filters/projections reach the parquet scan, set ops and grouping
  * flavors shuffle once on their keys; nothing here degrades at 100 TB.
  */
object Scalar {

  /** B16 string functions over `part`. `split_part`-equivalent via
    * element_at(split(...)); regex kept engine-portable. */
  def qStrFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        element_at(split(col("p_name"), " "), 1).as("first_token"))
      .orderBy("p_partkey").limit(100000)

  /** B17 date/time functions over `orders` (dayofweek intentionally
    * omitted: Spark is 1=Sunday, DuckDB 0=Sunday — engine-specific). */
  def qDateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey").limit(100000)

  /** B20 JSON: parse `events.props` (a JSON string like {"k": 87}) and
    * aggregate the extracted value per event type. */
  def qJsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** B14 union + B15 distinct rowset: nation keys present in either
    * customer or supplier. */
  def qUnion(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
      .unionByName(
        Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  /** B14 except: customers who ordered, minus those with a finished
    * order — i.e. customers whose orders are all unfinished. */
  def qExcept(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** B14 intersect: customers having both an open and a finished order. */
  def qIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** B15 true distinct rowset (dropDuplicates on a projection — fixes
    * round-1 "q_distinct mislabels its coverage"). */
  def qDedupRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).cast("long").as("ship_yr"))
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "ship_yr")

  /** B10 rollup: subtotals + grand total over (returnflag, linestatus).
    * Sums are integral-valued doubles → order-independent, exact. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** B10 cube over (returnflag, shipyear). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_yr", year(col("l_shipdate")).cast("long"))
      .cube(col("l_returnflag"), col("ship_yr"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("ship_yr").asc_nulls_first)

  /** B10 grouping sets via SQL: per-flag and per-status marginals in one
    * pass. */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** B9/B10 pivot: linestatus counts spread into columns per returnflag
    * (`Dataset.pivot` with explicit values → single hash aggregate, no
    * extra shuffle vs the flat groupBy; explicit value list avoids the
    * driver-side distinct-scan pivot otherwise needs at scale). Pivoted
    * counts are coalesced to 0: Spark's pivot yields NULL for a
    * (flag, status) cell with no rows while `count(*) FILTER` semantics
    * (and the oracle) yield 0 — coalesce makes the two agree on any data
    * distribution, not just ones where every cell is populated. */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("O"), lit(0L)).as("cnt_o"))
      .orderBy("l_returnflag")

  /** B9 statistical moments with EXACT cross-engine parity: sample
    * variance/stddev computed as a single division of order-independent
    * integer-valued sums ((n·Σx² − (Σx)²) / (n(n−1)) — all operands exact
    * in double at any SF where Σx² < 2^53, then one correctly-rounded
    * sqrt), rather than the engines' streaming `var_samp` implementations
    * whose intermediate rounding differs. Matches Spark's own var_samp to
    * ~1e-9 (StatsMomentsSpec). */
  def qStatsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val n = count(lit(1))
    val s = sum(col("l_quantity"))
    val ss = sum(col("l_quantity") * col("l_quantity"))
    val variance = (n * ss - s * s) / (n * (n - lit(1.0)))
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(n.as("n"),
        round(variance, 6).as("var_qty"),
        round(sqrt(variance), 6).as("std_qty"))
      .orderBy("l_returnflag")
  }

  /** B9 bivariate statistics with EXACT cross-engine parity: Pearson
    * correlation and sample covariance of (quantity, discount) per
    * returnflag. Both variables are integer-valued after scaling
    * (quantity is whole, discount is 2 decimal places → ×100), so all
    * five sums are exact in BIGINT; corr/cov are then a fixed written
    * sequence of IEEE ops (one division, correctly-rounded sqrt) —
    * identical doubles on both engines, one rounding at the end. Same
    * exact-sum technique as [[qStatsMoments]]. */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    val d = round(col("l_discount") * 100, 0).cast("long")
    val n = count(lit(1))
    val sq = sum(q); val sd = sum(d)
    val sqq = sum(q * q); val sdd = sum(d * d); val sqd = sum(q * d)
    val corr = (n * sqd - sq * sd) /
      (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd))
    val cov = (n * sqd - sq * sd) / (n * (n - lit(1.0))) / 100.0
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(n.as("n"), round(corr, 6).as("corr_qd"), round(cov, 6).as("cov_qd"))
      .orderBy("l_returnflag")
  }

  /** B9/B18 histogram binning: fixed-width value histogram of extended
    * price (floor(x/width) buckets — one hash aggregate; the binning is
    * a scan-side projection, so at any scale this is a partial+final
    * count per bucket with bucket-count-sized shuffle). IEEE division
    * then floor evaluates identically on both engines; exact-boundary
    * prices (k·1000.00) are exact doubles, so no boundary flicker. */
  def qHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(floor(col("l_extendedprice") / 1000).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** B11 approx distinct (HLL++) — bench/demo path; the oracle entry is
    * intentionally the EXACT variant per SURVEY §2 B11 (approx values are
    * engine-specific). */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .agg(countDistinct(col("l_partkey")).as("n_exact"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> (qStrFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_json_props" -> (qJsonProps _),
    "q_union" -> (qUnion _),
    "q_except" -> (qExcept _),
    "q_intersect" -> (qIntersect _),
    "q_dedup_rows" -> (qDedupRows _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_pivot" -> (qPivot _),
    "q_stats_moments" -> (qStatsMoments _),
    "q_corr" -> (qCorr _),
    "q_histogram" -> (qHistogram _),
    "q_approx_distinct" -> (qApproxDistinct _),
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey, lower(p_type) AS type_lc, upper(p_brand) AS brand_uc,
        | length(p_name) AS name_len, substring(p_name, 1, 8) AS name_pfx,
        | p_brand || '#' || p_type AS brand_type,
        | regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | split_part(p_name, ' ', 1) AS first_token
        |FROM part ORDER BY p_partkey LIMIT 100000""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
        | date_trunc('month', o_orderdate) AS month_start,
        | epoch(o_orderdate)::BIGINT AS epoch_s
        |FROM orders ORDER BY o_orderkey LIMIT 100000""".stripMargin,
    // DuckDB sum(BIGINT) yields HUGEINT (int128), which the driver's
    // pandas-side hash sees as float64 while Spark writes int64 — cast the
    // sum back to BIGINT so both engines emit the same dtype (r2 ADVICE).
    "q_json_props" ->
      """SELECT event_type, count(CAST(props->>'$.k' AS BIGINT)) AS n,
        | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_dedup_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, year(l_shipdate) AS ship_yr
        |FROM lineitem ORDER BY l_returnflag, l_linestatus, ship_yr""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, ship_yr, count(*) AS cnt FROM (
        |  SELECT l_returnflag, year(l_shipdate) AS ship_yr FROM lineitem)
        |GROUP BY CUBE (l_returnflag, ship_yr)
        |ORDER BY l_returnflag NULLS FIRST, ship_yr NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_approx_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS n_exact FROM lineitem",
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bucket,
        | count(*) AS cnt
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        | count(*) FILTER (l_linestatus = 'F') AS cnt_f,
        | count(*) FILTER (l_linestatus = 'O') AS cnt_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // all five sums exact in BIGINT (both variables integer-valued after
    // scaling), then corr/cov are the same written IEEE op sequence as
    // the Spark query — identical doubles, one rounding
    "q_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |    CAST(sum(CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) AS sd,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sqq,
        |    CAST(sum(CAST(round(l_discount*100, 0) AS BIGINT)
        |           * CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) AS sdd,
        |    CAST(sum(CAST(l_quantity AS BIGINT)
        |           * CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) AS sqd
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n*sqd - sq*sd) / (sqrt(n*sqq - sq*sq) * sqrt(n*sdd - sd*sd)), 6) AS corr_qd,
        |  round((n*sqd - sq*sd) / (n * (n - 1.0)) / 100.0, 6) AS cov_qd
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q_stats_moments" ->
      """SELECT l_returnflag, count(*) AS n,
        | round((count(*) * sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity))
        |   / (count(*) * (count(*) - 1.0)), 6) AS var_qty,
        | round(sqrt((count(*) * sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity))
        |   / (count(*) * (count(*) - 1.0))), 6) AS std_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
