package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the as-of join formulations (SURVEY §2 B8) head-to-head:
  * the union+last single-shuffle window form (q_join_asof), the native
  * catalyst AsOfJoin node lowered by RewriteAsOfJoin to join+aggregate
  * (q_join_asof_native), and the partitioned sort-merge form
  * (q_join_asof_merge). Warm best-of-2 each, same session. */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the native variants are spec-only (demoted from SparkEntry.queries
    // round 11) but stay measurable here — this bench is exactly the
    // instrument that documents WHY they are not production entries
    val picks: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "q_join_asof" -> graft.SparkEntry.queries("q_join_asof"),
      "q_join_asof_native" -> (graft.ops.Joins.qJoinAsofNative _),
      "q_join_asof_merge" -> graft.SparkEntry.queries("q_join_asof_merge"),
      "q_join_asof_tol" -> graft.SparkEntry.queries("q_join_asof_tol"),
      "q_join_asof_native_tol" -> (graft.ops.Joins.qJoinAsofNativeTol _),
      "q_join_asof_merge_tol" -> graft.SparkEntry.queries("q_join_asof_merge_tol"),
      "q_stream_asof" -> graft.SparkEntry.queries("q_stream_asof"))
    val qs = picks
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case scala.util.control.NonFatal(_) => () }
    }
    val results = qs.map { case (name, fn) =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[asof-bench] $name failed: ${e.getMessage}"); -1.0 }
      }
      name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"asof","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
