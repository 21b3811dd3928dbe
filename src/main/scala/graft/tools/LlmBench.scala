package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: timings for the LLM-pipeline operators (dedup, similarity,
  * text analysis) — the BASELINE.md suite covers only the 9 relational
  * headliners, so this gives the data-pipeline ops their own numbers.
  * Same methodology: warm-up pass, then best-of-2 timed runs. */
object LlmBench {
  private val picks = Seq(
    "q_dedup_exact", "q_dedup_rows", "q_ngram_jaccard", "q_minhash_lsh",
    "q_simhash", "q_dedup_cosine", "q_sim_topk", "q_ann_buckets",
    "q_ann_ivf", "q_text_tokens", "q_tfidf", "q_lang_id",
    "q_quality_score", "q_fingerprint", "q_pipeline_corpus",
    "q_doc_chunks", "q_mixture_sample", "q_decontam", "q_bm25",
    "q_pack_bins", "q_repetition", "q_sim_topk_q8", "q_simhash_dedup",
    "q_token_gini", "q_chunk_dedup", "q_emb_slice", "q_hard_negatives",
    "q_dedup_keep")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = picks.map(n => n -> graft.SparkEntry.queries(n))
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case scala.util.control.NonFatal(_) => () }
    }
    val results = qs.map { case (name, fn) =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case scala.util.control.NonFatal(_) => -1.0 }
      }
      name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"llm_total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
