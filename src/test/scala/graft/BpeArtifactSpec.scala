package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Pipeline

/** The BPE vocabulary ARTIFACT round trip (ShardRoundTripSpec idiom):
  * what lands on disk IS the vocabulary — reading the parquet back
  * reproduces the merge table exactly, saving again bumps the version
  * and latest-read follows it, and applying from the artifact ALONE
  * equals applying from the trainer's in-memory state. */
class BpeArtifactSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def cleanDir(p: String): String = {
    val f = new java.io.File(p)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
    p
  }

  // a corpus with clear repeated pairs so several merges fire
  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat ran to the cat"),
    (2L, "a dog sat on a mat"),
    (3L, "the cat sat on a dog"),
    (4L, "on the mat sat the cat")).toDF("doc_id", "text")

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  test("save → latest read round-trips the merge table exactly; versions bump") {
    val base = cleanDir("/tmp/graft_artifacts_spec/vocab_rt")
    val merges = Pipeline.bpeTrainBatchedFrom(spark, corpus,
      rounds = 5, cand = 4, cap = 10)
    mergeRows(merges).length should be > 2

    val p1 = Pipeline.bpeSaveVocab(merges, base)
    p1 should endWith("/v1")
    mergeRows(Pipeline.bpeLatestVocab(spark, base)) shouldBe mergeRows(merges)

    // version bump: a second save lands v2 and latest-read follows it
    val truncated = merges.filter(org.apache.spark.sql.functions.col("step") <= 2)
    val p2 = Pipeline.bpeSaveVocab(truncated, base)
    p2 should endWith("/v2")
    mergeRows(Pipeline.bpeLatestVocab(spark, base)) shouldBe
      mergeRows(merges).take(2)
  }

  test("artifact-only apply equals trainer-state apply") {
    import org.apache.spark.sql.functions.{col, split, trim, round}
    import org.apache.spark.sql.functions.{size => asize}
    val base = cleanDir("/tmp/graft_artifacts_spec/vocab_apply")
    val (merges, state) = Pipeline.bpeTrainBatchedState(spark, corpus,
      rounds = 5, cand = 4, cap = 10, needState = true)
    Pipeline.bpeSaveVocab(merges, base)

    // the trainer-state report (the pre-artifact q_bpe_apply50p shape)
    val raw = corpus.select(col("doc_id"), asize(split(col("text"), " "))
      .cast("long").as("n_raw"))
    val fromState = raw.join(state.select(col("doc_id"),
        asize(split(trim(col("state")), "  ")).cast("long").as("n_merged")),
        "doc_id")
      .select(col("doc_id"), col("n_raw"), col("n_merged"),
        round(col("n_merged") / col("n_raw"), 6).as("ratio"))
      .orderBy("doc_id").collect()

    val fromArtifact = Pipeline.bpeApplyVocab(corpus,
      Pipeline.bpeLatestVocab(spark, base)).collect()
    fromArtifact shouldBe fromState
    // merges actually compressed something
    fromArtifact.exists(r => r.getLong(2) < r.getLong(1)) shouldBe true
  }
}
