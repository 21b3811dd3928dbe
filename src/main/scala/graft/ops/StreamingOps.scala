package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.io.Tables

/** Streaming semantics (SURVEY §2 B25–B27) — Structured Streaming
  * transforms written as plain DataFrame functions so the SAME code runs
  * on a static read (batch parity, oracled below) and on `readStream`
  * (exercised with MemoryStream in StreamingSpec).
  *
  * Scale: windowed aggregations shuffle on (key, window) — bounded state
  * per watermark; session windows use Spark's session-merge state store.
  * Nothing here holds unbounded state once a watermark is set
  * (`withLateDataHandling`).
  */
object StreamingOps {

  /** B25 tumbling: 10-minute windows, count + value sum. Same function
    * serves batch (oracle parity) and streaming input. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("ws"), col("n_events"), col("sum_value"))

  /** B25 sliding: 10-minute windows every 5 minutes (each event lands in
    * two windows). */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("ws"), col("n_events"))

  /** B26 session windows: per-user sessions closed by a 30-minute gap;
    * end = last event + gap (Spark session_window semantics, mirrored in
    * the oracle's lag/cumsum formulation). */
  def sessionAgg(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** B27 watermark: 10-minute-late tolerance; in streaming mode rows
    * older than (max ts seen − 10 min) are dropped from state. Batch runs
    * ignore watermarks, so this is exercised by StreamingSpec's
    * late-data replay, not by an oracle. */
  def withLateDataHandling(events: DataFrame): DataFrame =
    tumblingAgg(events.withWatermark("ts", "10 minutes"))

  /** B27 stateful dedup: drop event_id duplicates arriving within the
    * watermark (state is pruned as the watermark advances — bounded
    * memory at any scale, unlike an unbounded dropDuplicates). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** B27 arbitrary state (`flatMapGroupsWithState`): running per-user
    * event counter with a processing-time idle timeout — the custom-state
    * escape hatch for semantics windows can't express. Emits one row per
    * input event with the count-so-far. */
  def runningCountsPerUser(events: Dataset[(Long, Long)]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.map { case (_, eventId) =>
            n += 1
            (user, eventId, n)
          }.toList
          state.update(n)
          out.iterator
      }
  }

  /** Typed event for [[asofAttribution]]; timestamps as exact µs longs. */
  final case class Ev(event_id: Long, user_id: Long, ts_us: Long, is_err: Boolean)
  final case class AsofAtt(event_id: Long, user_id: Long, ts_us: Long,
      err_event_id: Option[Long], err_us: Option[Long])
  final case class ErrState(id: Long, us: Long)

  /** B27/B8 STREAMING as-of attribution — the streaming twin of the
    * round-6 sort-merge as-of: each purchase is attributed to the
    * latest same-user error at-or-before it, with ONE (err_id, err_ts)
    * pair of state per user — O(1) state, no retained event history, so
    * the state store stays bounded without any watermark at all.
    *
    * Each trigger's per-user slice is sorted by (ts, err-first, id)
    * before the state walk, so equal-ts semantics match the batch as-of
    * exactly (error at equal ts matches; among equal-ts errors the
    * largest id wins); the state-update guard keeps a late (older)
    * error from overwriting a newer one across triggers, degrading late
    * data to best-effort attribution — the standard streaming trade,
    * vs dropping it at a watermark. In BATCH mode the same code sees
    * each user's full history as one group (the per-group sort is the
    * hot-key caveat there) and reproduces q_join_asof's relation
    * row-for-row — oracled as q_stream_asof below; streaming execution
    * over MemoryStream micro-batches is pinned in StreamingSpec. */
  def asofAttribution(events: Dataset[Ev]): Dataset[AsofAtt] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ErrState, AsofAtt](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[ErrState]) =>
          val sorted = rows.toIndexedSeq.sortBy(e =>
            (e.ts_us, if (e.is_err) 0 else 1, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AsofAtt]
          sorted.foreach { e =>
            if (e.is_err) {
              // monotone guard: only a strictly newer (ts, id) replaces
              if (st == null || e.ts_us > st.us ||
                (e.ts_us == st.us && e.event_id > st.id))
                st = ErrState(e.event_id, e.ts_us)
            } else {
              out += (if (st == null) AsofAtt(e.event_id, uid, e.ts_us, None, None)
              else AsofAtt(e.event_id, uid, e.ts_us, Some(st.id), Some(st.us)))
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** B27 stream-stream interval join: purchases attributed to the same
    * user's clicks in the preceding 10 minutes. Both sides watermarked
    * and the join condition time-bounds c_ts relative to p_ts, so the
    * streaming join's state store holds only ~10 minutes of either
    * stream per user — bounded at any scale. In batch mode watermarks
    * are a no-op and the same code is a shuffled equi-join on user_id
    * with the interval as a residual predicate (oracled below). Lag is
    * exact integer microseconds. */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  def qStreamTumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumblingAgg(Tables.events(spark, sfDir)).orderBy("ws")

  def qStreamSliding(spark: SparkSession, sfDir: String): DataFrame =
    slidingAgg(Tables.events(spark, sfDir)).orderBy("ws")

  def qStreamSession(spark: SparkSession, sfDir: String): DataFrame =
    sessionAgg(Tables.events(spark, sfDir))
      .orderBy("user_id", "session_start")

  def qStreamJoin(spark: SparkSession, sfDir: String): DataFrame =
    clickAttribution(Tables.events(spark, sfDir))
      .orderBy("user_id", "purchase_id", "click_id")

  /** Batch-parity run of [[asofAttribution]] — same relation (and
    * oracle) as q_join_asof: the third physical shape under that
    * oracle, after the window and sort-merge forms. */
  def qStreamAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val s = spark
    import s.implicits._
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "error").as("is_err")).as[Ev]
    asofAttribution(ev)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("err_event_id"),
        timestamp_micros(col("err_us")).as("err_ts"))
      .orderBy("event_id").limit(100000)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_stream_session" -> (qStreamSession _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_asof" -> (qStreamAsof _),
  )

  val oracle: Map[String, String] = Map(
    // the streaming as-of computes the SAME relation as the batch as-of
    // forms — the fourth query under that one oracle
    "q_stream_asof" -> Joins.oracle("q_join_asof"),
    "q_stream_join" ->
      """WITH e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, purchase_id, click_id,
        |  epoch_us(p_ts) - epoch_us(c_ts) AS lag_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c_ts >= p_ts - INTERVAL '10 minutes' AND c_ts <= p_ts
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS ws,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY ws""".stripMargin,
    "q_stream_sliding" ->
      """SELECT ws, count(*) AS n_events FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS ws
        |  FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
        |    - INTERVAL '5 minutes' AS ws
        |  FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
    // session = gap > 30 min starts a new one; end = last ts + gap.
    // (Exact-30-minute gaps would diverge — Spark splits, this merges —
    // but ns-precision timestamps make that a measure-zero case.)
    "q_stream_session" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
