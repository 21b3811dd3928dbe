package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
// temp scratch main — deleted after the k=32 trained-IVF recall measurement
object KmIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.FloatVectorDot.register(spark)
    import graft.ops.VectorForms.{dot, sumSq}
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.io.Tables.embeddings(spark, sf)
      val k = 32
      val cent = graft.ops.LlmOps.kmeansExact(e, k, 64, 2)
        .collect().groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getLong(1)).map(_.getLong(2)).toIndexedSeq) }
      val centArr = array(cent.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cv"))
      }: _*)
      val qvCol = transform(col("embedding"),
        x => floor(x.cast("double") * lit(10000.0)).cast("long"))
      val scoredArr = transform(centArr, en =>
        struct(aggregate(zip_with(qvCol, en.getField("cv"),
          (x, c) => (x - c) * (x - c)), lit(0L), (a, y) => a + y).as("d2"),
          en.getField("cid").as("cid")))
      val assigned = e.select(col("vec_id"), col("embedding"),
        array_min(scoredArr).getField("cid").as("cid"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      val probePred = col("vec_id") % 20 === 0
      val probes0 = e.filter(probePred)
        .select(col("vec_id").as("pid"), col("embedding").as("pv"))
      val wP = Window.partitionBy("pid").orderBy(col("cos_sim").desc, col("nbr"))
      val truth = e.join(broadcast(probes0), col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id").as("nbr"),
          round(dot(col("embedding"), col("pv")) /
            (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("pv")))), 6).as("cos_sim"))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") <= 5)
        .select(col("pid"), col("nbr").as("true_nbr")).cache()
      val tp = truth.count()
      for (np <- Seq(2, 4, 8, 16)) {
        val probes = e.filter(probePred)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            explode(slice(array_sort(scoredArr), 1, np)).as("p"),
            sqrt(sumSq(col("embedding"))).as("qnrm"))
          .select(col("qid"), col("qv"), col("p.cid").as("cid"), col("qnrm"))
        val cos = round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6)
        val wR = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
        val res = assigned.join(broadcast(probes), "cid")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), cos.as("cos_sim"))
          .withColumn("rn", row_number().over(wR)).filter(col("rn") <= 5)
        val cand = assigned.join(broadcast(probes.select("qid", "cid")), "cid")
          .filter(col("vec_id") =!= col("qid")).count()
        val hits = truth.join(res,
          col("pid") === col("qid") && col("true_nbr") === col("vec_id")).count()
        println(f"$sf k=$k np=$np recall=${hits.toDouble / tp}%.3f cand=$cand")
      }
    }
    spark.stop()
  }
}
