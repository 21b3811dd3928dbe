package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of named queries to
  * `plans/r21/<name>_<suffix>.txt` — the optimization round's
  * before/after plan evidence. Args: <suffix> <name1,name2,...>. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("/root/repo/plans/r21"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val s = s"# ${suffix.toUpperCase} plan for $name — " +
        s"graft.tools.PlanSnap, $sfDir, formatted mode\n\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"/root/repo/plans/r21/${name}_$suffix.txt"), s)
      println(s"WROTE plans/r21/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
