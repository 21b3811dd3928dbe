package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B1 scan/source layer (SURVEY.md §2 B1, §7.6).
  *
  * All testdata tables are plain parquet; Spark's vectorized reader handles
  * them natively except `events`, whose `ts` column is INT64
  * TIMESTAMP(NANOS) — illegal for the Spark 4.x parquet reader unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` is set, after which it
  * arrives as Long nanoseconds. We convert with integer division (DIV) to
  * avoid double-precision loss (ns-since-epoch ≈ 1.7e18 > 2^53).
  *
  * At 100 TB these readers stay valid: a parquet directory scan is
  * partition-parallel, filter/column pushdown applies (the conversion is a
  * projection on top of the scan, so pushdown on other columns still
  * reaches the scan), and nothing here forces a shuffle.
  */
object Tables {

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

  /** `events` with `ts` normalized to a microsecond TimestampType column.
    * The nanos→micros truncation is deterministic and matches the oracle
    * side (DuckDB reads ns natively; oracled queries truncate identically).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, s"$sfDir/events#shim") {
      // Graft-owned sessions (Verify/Bench/tests) set nanosAsLong in the
      // builder; this call-site set covers only alien driver sessions.
      // It is runtime-settable and only affects reads of ns-typed
      // columns, but IS process-global — hence builder-first policy.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    }

  /** Register every table as a temp view so spark.sql(...) queries and the
    * DuckDB oracle share one naming scheme. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
