package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Table-maintenance / warehouse semantics (SURVEY §2 B2/B5/B17
  * adjacent) — the two operations every lakehouse pipeline runs between
  * queries: applying a change batch to a snapshot (MERGE INTO) and
  * deriving a slowly-changing-dimension history from an event log
  * (SCD2). Both are expressed as ONE declarative plan — a full outer
  * join + CASE for the merge, two window passes for the history — so
  * Catalyst plans them like any other relational query; neither needs a
  * transactional table format, which is exactly the point: the MERGE
  * result is a relation you can write wherever the sink is.
  *
  * Scale: the merge shuffles snapshot and changes once on the join key
  * (with a bucketed snapshot only the change batch moves — same
  * standing-index argument as the incremental dedup); SCD2 shuffles the
  * log once on user_id and both window passes ride that one partition
  * (same-key windows reuse the exchange).
  */
object Maintenance {

  /** MERGE INTO: apply a change batch (delete / update / insert) to the
    * orders snapshot in one full-outer-join pass. The change batch is
    * derived deterministically from the snapshot itself (keys % 10 = 0
    * delete, = 1 update price +1000, = 2 insert under a fresh negated
    * key) so the op is reproducible and every action class is
    * exercised non-vacuously. `src` labels each surviving row's
    * provenance. */
  def qMergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val m = col("o_orderkey") % 10
    val c = Tables.orders(spark, sfDir)
      .filter(m < 3)
      .select(
        when(m === 2, -col("o_orderkey")).otherwise(col("o_orderkey")).as("k"),
        when(m === 0, lit("D")).when(m === 1, lit("U")).otherwise(lit("I"))
          .as("action"),
        when(m === 1, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice"))
          .as("c_price"),
        when(m === 2, lit("N")).otherwise(col("o_orderstatus")).as("c_status"))
    s.join(c, col("o_orderkey") === col("k"), "full_outer")
      .filter(col("action").isNull || col("action") =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("k")).as("okey"),
        when(col("action").isNotNull, col("c_status"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("action").isNotNull, col("c_price"))
          .otherwise(col("o_totalprice")).as("price"),
        when(col("action") === "I", lit("inserted"))
          .when(col("action") === "U", lit("updated"))
          .otherwise(lit("kept")).as("src"))
      .orderBy("okey")
  }

  /** SCD2 history: collapse each user's event log into validity
    * intervals of consecutive same-event_type runs (gaps-and-islands).
    * valid_to is the next run's start (NULL for the open current run);
    * n_events counts the run's rows. Two window passes over ONE
    * user_id partitioning: change-flag + running sum to number runs,
    * then lead() over the per-run starts. */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTs).isNull ||
          lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    // run_id breaks intra-tick ties: two consecutive runs can START in
    // the same timestamp tick (valid_to == valid_from), so valid_from
    // alone is not a total order and the lead() assignment would be
    // engine/partitioning-dependent; run_id is per-user sequential by
    // construction, making the order total in both engines
    runs
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy("user_id").orderBy("valid_from", "run_id")))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"))
      .orderBy("user_id", "valid_from")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_scd2" -> (qScd2 _),
  )

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH s AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |c AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 10 = 2 THEN -o_orderkey
        |         ELSE o_orderkey END AS k,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |         WHEN o_orderkey % 10 = 1 THEN 'U' ELSE 'I' END AS action,
        |    CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS c_price,
        |    CASE WHEN o_orderkey % 10 = 2 THEN 'N'
        |         ELSE o_orderstatus END AS c_status
        |  FROM orders WHERE o_orderkey % 10 < 3)
        |SELECT coalesce(o_orderkey, k) AS okey,
        |  CASE WHEN action IS NOT NULL THEN c_status
        |       ELSE o_orderstatus END AS status,
        |  CASE WHEN action IS NOT NULL THEN c_price
        |       ELSE o_totalprice END AS price,
        |  CASE WHEN action = 'I' THEN 'inserted'
        |       WHEN action = 'U' THEN 'updated'
        |       ELSE 'kept' END AS src
        |FROM s FULL OUTER JOIN c ON o_orderkey = k
        |WHERE action IS NULL OR action <> 'D'
        |ORDER BY okey""".stripMargin,
    "q_scd2" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id, ts
        |  FROM flagged),
        |grouped AS (
        |  SELECT user_id, run_id, event_type,
        |    CAST(min(ts) AS TIMESTAMP) AS valid_from,
        |    count(*) AS n_events
        |  FROM runs GROUP BY user_id, run_id, event_type)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY valid_from, run_id) AS valid_to,
        |  n_events
        |FROM grouped ORDER BY user_id, valid_from""".stripMargin,
  )
}
