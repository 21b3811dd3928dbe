package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch probe: time one query standalone (args: name sfDir reps). */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
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
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
      println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.ops.Ckpt.releaseAll(spark)
    }
    spark.stop()
  }
}
