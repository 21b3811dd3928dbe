package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.DataFrame

import graft.ops.Pipeline

/** The one-pass tokenizer-apply tier (q_bpe_apply_fast) against its
  * replay twin: [[Pipeline.bpeApplyVocabFast]]'s broadcast-rank-map
  * greedy loop must be BIT-EQUAL to [[Pipeline.bpeApplyVocab]]'s
  * step-order replay — that equality is what lets the fast tier share
  * the replay oracle. Pins:
  *   - frame equality on a trained vocabulary over a real-ish corpus;
  *   - the BIRTH-GUARD adversarial case: a lower-rank pair whose left
  *     token is minted by a HIGHER-rank merge must NOT be merged (the
  *     replay already passed that step) — the GPT-2-style unguarded
  *     greedy loop gets this wrong;
  *   - a property sweep: random small-alphabet corpora, vocabulary
  *     trained by the exact sequential trainer, fast ≡ replay on every
  *     doc. */
class BpeFastApplySpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat ran to the cat"),
    (2L, "a dog sat on a mat"),
    (3L, "the cat sat on a dog"),
    (4L, "on the mat sat the cat"),
    (5L, "x"),
    (6L, "x x x x x"),
    // trailing/leading whitespace: Spark's split(col, " ") and DuckDB's
    // string_split keep the empty tokens, so n_raw counts them — the
    // fast tier's JVM-side tokenization must match (review r16: the
    // char-overload String.split(' ') silently dropped trailing ones)
    (7L, "the cat sat "),
    (8L, " the  cat")).toDF("doc_id", "text")

  test("fast apply equals step-order replay on a trained vocabulary") {
    val vocab = Pipeline.bpeTrainBatchedFrom(spark, corpus,
      rounds = 6, cand = 4, cap = 12)
    rows(Pipeline.bpeApplyVocabFast(corpus, vocab)) shouldBe
      rows(Pipeline.bpeApplyVocab(corpus, vocab))
  }

  test("birth guard: an adjacency minted by a higher-rank merge is not " +
    "re-merged by a lower-rank pair") {
    // vocab: step1 = (a, b_c) — at replay step 1 no 'b_c' token exists,
    // so the rewrite is a no-op; step2 = (b, c) then mints 'b_c'.
    // Replay final state of "a b c" is "a b_c" (2 tokens). The
    // unguarded greedy loop would see the freshly-minted (a, b_c)
    // rank-1 adjacency and merge to 1 token.
    val vocab = Seq((1, 1, "a", "b_c", 1L), (2, 1, "b", "c", 1L))
      .toDF("step", "round", "l_tok", "r_tok", "cnt")
    val doc = Seq((0L, "a b c")).toDF("doc_id", "text")
    val replay = rows(Pipeline.bpeApplyVocab(doc, vocab))
    replay.head._3 shouldBe 2L // the replay truth: guard target
    rows(Pipeline.bpeApplyVocabFast(doc, vocab)) shouldBe replay
  }

  test("property: fast ≡ replay on random small-alphabet corpora") {
    val rnd = new scala.util.Random(41)
    val alpha = Array("a", "b", "c", "d")
    for (trial <- 1 to 4) {
      val docs = (0L until 12L).map { id =>
        val len = 3 + rnd.nextInt(18)
        val body = Array.fill(len)(alpha(rnd.nextInt(alpha.length)))
          .mkString(" ")
        // quarter of the docs carry boundary whitespace (empty raw
        // tokens — the review-r16 trim-semantics edge)
        val text = rnd.nextInt(4) match {
          case 0 => body + " "
          case 1 => " " + body
          case _ => body
        }
        (id, text)
      }.toDF("doc_id", "text")
      // the exact sequential trainer: deepest merge nesting per step
      val vocab = Pipeline.bpeTrainFrom(spark, docs,
        steps = 6, needState = false)._1
        .withColumn("round", org.apache.spark.sql.functions.lit(1))
      withClue(s"trial $trial: ") {
        rows(Pipeline.bpeApplyVocabFast(docs, vocab)) shouldBe
          rows(Pipeline.bpeApplyVocab(docs, vocab))
      }
    }
  }

  test("one-pass loop handles single-token and vocab-miss documents") {
    val vocab = Seq((1, 1, "q", "q", 1L))
      .toDF("step", "round", "l_tok", "r_tok", "cnt")
    val doc = Seq((0L, "z"), (1L, "a b c")).toDF("doc_id", "text")
    val out = rows(Pipeline.bpeApplyVocabFast(doc, vocab))
    out.map(r => (r._1, r._2, r._3)) shouldBe
      Seq((0L, 1L, 1L), (1L, 3L, 3L))
  }
}
