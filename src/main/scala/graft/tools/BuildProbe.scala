package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TEMPORARY r21 probe (deleted after use, the r20 PairCountProbe
  * precedent): split the knn-graph build's wall time into (a) one
  * banded-candidate evaluation, (b) the edges0 first cut whose union
  * references the candidate subtree twice, (c) a variant that
  * materializes the candidate pairs once before the union — to decide
  * whether the mirror branch re-evaluates or exchange-reuses. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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

    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[buildprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    {
      val pairs = graft.ops.GraphAnn.graphCandidates(spark, sfDir)
      val s = pairs.queryExecution.executedPlan.toString
      println("[buildprobe] VECDOT_COUNT=" + "vec_dot".r.findAllIn(s).size)
      println("[buildprobe] AGGZIP_COUNT=" +
        "aggregate\\(zip_with".r.findAllIn(s).size)
      println("[buildprobe] SORTMERGE=" + s.contains("SortMergeJoin") +
        " SHJ=" + s.contains("ShuffledHashJoin") + " BHJ=" + s.contains("BroadcastHashJoin"))
      println("[buildprobe] pairs rows=" + pairs.count())
      val e = graft.io.Tables.embeddings(spark, sfDir)
      val bits = 6
      val bk = graft.ops.LlmOps.bandedKeysStrided(e, 6, bits, 26,
        graft.ops.LlmOps.lshPlanesExt(6 * 26))
      println("[buildprobe] band rows=" + bk.count())
      val occ = bk.groupBy("bkey").count()
        .agg(sum(col("count") * (col("count") - 1) / 2), max(col("count")))
        .collect()(0)
      println("[buildprobe] sum-pairs-with-mult=" + occ.get(0) +
        " max-bucket=" + occ.get(1))
    }
    val e = graft.io.Tables.embeddings(spark, sfDir)
    val bk = graft.ops.LlmOps.bandedKeysStrided(e, 6, 6, 26,
      graft.ops.LlmOps.lshPlanesExt(6 * 26))
    import graft.ops.VectorForms.dot
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("bandkeys only (noop)") { noop(bk) }
      val joinIds = bk.as("a").join(bk.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      time("join ids only (noop)") { noop(joinIds) }
      val joinScored = bk.as("a").join(bk.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          round(dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      time("join scored (noop)") { noop(joinScored) }
      time("join scored + distinct (noop)") { noop(joinScored.distinct()) }
      graft.ops.Ckpt.releaseAll(spark)
    }
    spark.stop()
  }
}
