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

  /** Plain parquet table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
  def events(spark: SparkSession, sfDir: String): DataFrame = {
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
