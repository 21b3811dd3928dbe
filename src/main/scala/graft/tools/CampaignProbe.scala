package graft.tools
import org.apache.spark.sql.SparkSession
/** Cross-SF exponent campaign: time each named query at each SF dir
  * (args: comma-names sfDir1 sfDir2 ... ; reps via SPARK_GRAFT_REPS).
  * One JVM, min-of-reps per (query, SF) — rep 1 pays any standing-store
  * build, the min is the steady-state read (the SCALING.md method). */
object CampaignProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDirs = args.drop(1).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfDir <- sfDirs; name <- names) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.Ckpt.releaseAll(spark)
        dt
      }
      println(f"[campaign] $name ${sfDir.split('/').last} " +
        f"min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
