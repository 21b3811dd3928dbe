package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B1 scan/source layer (SURVEY.md §2 B1, §7.6).
  *
  * All testdata tables are plain parquet; Spark's vectorized reader handles
  * them natively. The `events.ts` column's physical layout has varied
  * across driver-generated testdata revisions — INT64 TIMESTAMP(NANOS)
  * (readable only under `spark.sql.legacy.parquet.nanosAsLong=true`, as
  * Long nanoseconds) and native timestamp[us] without UTC-adjustment
  * metadata (read as TIMESTAMP_NTZ when `spark.sql.parquet.
  * inferTimestampNTZ.enabled` is on, TIMESTAMP otherwise). [[normalizeTs]]
  * dispatches on the READ schema, so every layout lands on the same
  * session-UTC TimestampType column and downstream operators never see the
  * difference. Graft-owned sessions set nanosAsLong=true and
  * inferTimestampNTZ=false in their builders (SURVEY §7.6).
  *
  * At 100 TB these readers stay valid: a parquet directory scan is
  * partition-parallel, filter/column pushdown applies (the conversion is a
  * projection on top of the scan, so pushdown on other columns still
  * reaches the scan), and nothing here forces a shuffle.
  */
object Tables {

  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize an events-shaped frame's `ts` column to TimestampType
    * whatever the parquet layout delivered:
    *  - `Long` — INT64 TIMESTAMP(NANOS) under nanosAsLong: integer-divide
    *    ns→µs (DIV, not `/`: ns-since-epoch ≈ 1.7e18 > 2^53 breaks doubles);
    *  - `TimestampNTZType` — native timestamp[us] read by a session with
    *    NTZ inference on: reinterpret as a UTC instant (graft sessions run
    *    `spark.sql.session.timeZone=UTC`, making the cast micros-exact);
    *  - `TimestampType` — already the target type (graft sessions read this
    *    directly because their builders disable NTZ inference).
    */
  private[graft] def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  private val names =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")

  /** Per-session read cache: `spark.read.parquet` lists files and reads
    * footers every call; a bench/verify session touches each table many
    * times, so reuse the (immutable) source DataFrame. Keyed weakly by
    * session so a stopped session's entries don't pin its plans. */
  private val readCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private def cached(spark: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    val perSession = readCache.synchronized {
      var m = readCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        readCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(key, mk)
  }

  /** Plain parquet table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached(spark, s"$sfDir/$name")(spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `events` with `ts` normalized to a microsecond TimestampType column
    * via [[normalizeTs]] (layout-adaptive — see the object doc). Any
    * truncation is deterministic and matches the oracle side (DuckDB reads
    * the same parquet; oracled queries truncate identically).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, s"$sfDir/events#shim") {
      // Graft-owned sessions (Verify/Bench/tests) set nanosAsLong in the
      // builder; this call-site set covers only alien driver sessions.
      // It is runtime-settable and only affects reads of ns-typed
      // columns, but IS process-global — hence builder-first policy.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    }

  /** Register every table as a temp view so spark.sql(...) queries and the
    * DuckDB oracle share one naming scheme. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
