package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: dump physical-plan red flags for every SparkEntry query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // AQE defers WholeStageCodegen insertion to stage materialization,
      // so the pre-execution plan string would always read codegen=0;
      // audit the statically-prepared plan instead (the audit is about
      // plan SHAPE — production runs keep AQE on)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoop"),
          "globalSort" -> (plan.contains("Sort [") && plan.contains("Exchange rangepartitioning")),
          "udf" -> plan.toLowerCase.contains("batchevalpython"),
          // a standing-store literal probe whose bucketed scan the
          // planner downgraded: informational — manifest-level bucket
          // pruning (TxFileIndex) still bounds the IO, but the serve
          // paths are expected to keep the bucketed scan (r18 item 1)
          "bucketScanDisabled" -> (plan.contains("Bucketed: false")
            && plan.contains("TxFileIndex")),
        ).collect { case (k, true) => k }
        val nExchanges = "Exchange ".r.findAllIn(plan).length
        // codegen stages appear as `*(n)` operator prefixes in the tree
        // string (the literal "WholeStageCodegen" label only shows in
        // formatted explain) — count distinct stage ids
        val nCodegen = """\*\((\d+)\)""".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        println(f"AUDIT $name%-22s exch=$nExchanges%2d codegen=$nCodegen%2d flags=${flags.mkString(",")}")
      } catch { case scala.util.control.NonFatal(e) => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
