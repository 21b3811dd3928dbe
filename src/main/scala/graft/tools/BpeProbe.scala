package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: sequential vs batched BPE trainer wall time at sf0.1 (the
  * measured ≥3× claim in [[graft.ops.Pipeline.bpeTrainBatched]]'s doc). */
object BpeProbe {
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
    def time(name: String, fn: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = fn
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.ops.Ckpt.releaseAll(spark)
    }
    // warm-up scan
    graft.SparkEntry.queries("q_bpe_merges")(spark, sfDir).count()
    graft.ops.Ckpt.releaseAll(spark)
    time("q_bpe_merges50p", graft.SparkEntry.queries("q_bpe_merges50p")(spark, sfDir).count())
    time("q_bpe_merges50", graft.SparkEntry.queries("q_bpe_merges50")(spark, sfDir).count())
    time("q_bpe_merges50p(2)", graft.SparkEntry.queries("q_bpe_merges50p")(spark, sfDir).count())
    spark.stop()
  }
}
