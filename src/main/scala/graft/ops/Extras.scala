package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Coverage tails: string-distance functions (B16), positional explode
  * (B21), structured JSON + map functions (B20), and range-frame windows
  * (B12). All scan→project / one-shuffle shapes. */
object Extras {

  /** B16 tail: levenshtein, replace, lpad. */
  def qStrDist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        levenshtein(lower(col("p_brand")), lower(col("p_type"))).cast("long").as("lev"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"))
      .orderBy("p_partkey").limit(100000)

  /** B21 positional explode: first 8 components of each embedding with
    * their index. */
  def qPosexplode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(col("pos") < 8)
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("v"))
      .orderBy("vec_id", "pos").limit(1000000)

  /** B20 tail: from_json into a typed struct AND a map, plus map_keys —
    * the schema-full JSON path next to q_json_props' get_json_object. */
  def qJsonStruct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").cast("long").as("k"),
        element_at(map_keys(from_json(col("props"), lit("MAP<STRING, INT>"))), 1)
          .as("first_key"))
      .orderBy("event_id").limit(1000000)

  /** B12 range frame: orders by the same customer within the preceding
    * 30 days (inclusive), counted per order. Count (not sum) keeps the
    * frame aggregate integer-exact across engines. */
  def qWindowRange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("epoch_s"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
      .withColumn("n_30d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("n_30d"))
      .orderBy("o_custkey", "o_orderkey").limit(100000)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_dist" -> (qStrDist _),
    "q_posexplode" -> (qPosexplode _),
    "q_json_struct" -> (qJsonStruct _),
    "q_window_range" -> (qWindowRange _),
  )

  val oracle: Map[String, String] = Map(
    "q_str_dist" ->
      """SELECT p_partkey,
        | levenshtein(lower(p_brand), lower(p_type)) AS lev,
        | replace(p_name, ' ', '_') AS snake_name,
        | lpad(p_brand, 12, '*') AS brand_pad
        |FROM part ORDER BY p_partkey LIMIT 100000""".stripMargin,
    "q_posexplode" ->
      """SELECT vec_id, i - 1 AS pos, embedding[i] AS v
        |FROM embeddings, unnest(range(1, 9)) AS t(i)
        |ORDER BY vec_id, pos LIMIT 1000000""".stripMargin,
    "q_json_struct" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k,
        | json_keys(props)[1] AS first_key
        |FROM events ORDER BY event_id LIMIT 1000000""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        | count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100000""".stripMargin,
  )
}
