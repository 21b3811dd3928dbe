package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** The positional prefix filter behind q_ngram_jaccard (AllPairs /
  * PPJoin lineage) is LOSSLESS at the Jaccard threshold: its output
  * must equal the shared-shingle baseline's exactly (a pair with
  * J ≥ 0.2 > 0 necessarily shares a shingle, so the shared-key join is
  * itself exhaustive truth) — while generating a fraction of the
  * candidates on boilerplate-heavy corpora, which is the whole point
  * of the df-ascending canonical order. */
class PrefixFilterSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered output equals the shared-shingle baseline on the real corpus") {
    val prefix = pairsOf(LlmOps.qNgramJaccard(spark, sf))
    val brute = pairsOf(LlmOps.ngramJaccardSharedKey(
      graft.io.Tables.documents(spark, sf)))
    prefix shouldBe brute
    prefix.size should be > 0
  }

  test("property: equality holds on seeded random corpora with heavy shingle collisions") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      // tiny vocabulary => many cross-doc shingle collisions, docs of
      // varying length incl. < 5 tokens (the whole-text shingle branch)
      val docs = (0L until 40L).map { id =>
        val len = 2 + rnd.nextInt(30)
        val toks = Seq.fill(len)("w" + rnd.nextInt(8))
        (id, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val ds = LlmOps.docShinglesFrom(docs)
      val prefix = pairsOf(LlmOps.ngramJaccardPrefix(ds))
      val brute = pairsOf(LlmOps.ngramJaccardSharedKey(docs))
      withClue(s"seed $seed: ") { prefix shouldBe brute }
    }
  }

  test("boilerplate corpus: prefix filter kills the hot-shingle candidate blowup") {
    import spark.implicits._
    // every doc shares a 10-token boilerplate header (6 hot shingles,
    // df = n) plus 36 unique tokens (df = 1 shingles). True Jaccard of
    // any pair is 6/78 < 0.2, so the correct output is EMPTY — but the
    // shared-key join still materializes all C(n,2) candidate pairs
    // through the hot shingles. The df-ascending prefix puts the hot
    // shingles in the un-indexed suffix: zero candidates.
    val n = 60
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val docs = (0L until n.toLong).map { id =>
      (id, boiler + " " + (0 until 36).map(j => s"u${id}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val ds = LlmOps.docShinglesFrom(docs)
    val prefixCands = LlmOps.ngramPrefixCandidates(ds).count()
    prefixCands shouldBe 0L
    // the baseline's candidate volume through the same corpus: every
    // pair collides on each of the 6 boilerplate shingles
    val sh = ds.select(col("doc_id"), explode(col("shs")).as("sh"))
    val bruteCands = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    bruteCands shouldBe (n.toLong * (n - 1) / 2)
    // and equality of the (empty) verified output
    LlmOps.ngramJaccardPrefix(ds).count() shouldBe 0L
    LlmOps.ngramJaccardSharedKey(docs).count() shouldBe 0L
  }

  test("a genuine near-dup pair still surfaces through the prefix (recall = 1 witness)") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"t$i").mkString(" ")
    val edited = ((0 until 38).map(i => s"t$i") ++ Seq("x", "y")).mkString(" ")
    val noise = (0 until 40).map(i => s"n$i").mkString(" ")
    val docs = Seq((0L, base), (1L, edited), (2L, noise)).toDF("doc_id", "text")
    val out = LlmOps.ngramJaccardPrefix(LlmOps.docShinglesFrom(docs)).collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((0L, 1L))
    out.head.getDouble(2) should be > 0.2
  }
}
