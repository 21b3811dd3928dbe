package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.qGroupbyAgg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Nested.queries ++ ops.Joins.queries ++
      ops.Scalar.queries ++ ops.LlmOps.queries ++ ops.StreamingOps.queries ++
      ops.Multimodal.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Nested.oracle ++ ops.Joins.oracle ++
      ops.Scalar.oracle ++ ops.LlmOps.oracle ++ ops.StreamingOps.oracle ++
      ops.Multimodal.oracle
}
