package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Organize

/** Invariants for the corpus-organization operators on the real
  * sf0.001 tables: split assignment is exhaustive and hash-stable,
  * shard positions are dense ranks, perplexity terciles balance within
  * the ntile contract and order head ≥ middle ≥ tail, the data card
  * conserves corpus totals, and embedding outliers are valid bounded
  * cosines per label. */
class OrganizeSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val sf = TestSpark.sf
  private lazy val nDocs =
    graft.io.Tables.documents(spark, sf).count()

  test("q_split partitions every doc exactly once, ~90/5/5") {
    val rows = Organize.qSplit(spark, sf).collect()
    rows.map(_.getString(1)).toSet should contain theSameElementsAs
      rows.map(_.getString(1)).toSet.intersect(Set("train", "val", "test"))
    rows.map(_.getLong(2)).sum shouldBe nDocs
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    // hash split at n=500: expect the train share within a loose band
    val train = bySplit.getOrElse("train", 0L).toDouble / nDocs
    train should be > 0.8
    train should be < 0.97
  }

  test("q_split is stable: same assignment on re-run") {
    val a = Organize.qSplit(spark, sf).collect().toSeq
    val b = Organize.qSplit(spark, sf).collect().toSeq
    a shouldBe b
  }

  test("q_shuffle_shards covers every doc with dense per-shard positions") {
    val rows = Organize.qShuffleShards(spark, sf).collect()
    rows.length shouldBe nDocs
    rows.map(_.getLong(0)).toSet.size shouldBe nDocs
    all(rows.map(_.getLong(1))) should (be >= 0L and be < 8L)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      rs.map(_.getLong(2)).sorted shouldBe (1L to rs.length.toLong)
    }
  }

  test("q_ppl_buckets: terciles balance within 1 and order by fluency") {
    val rows = Organize.qPplBuckets(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getString(1)).toSet shouldBe Set("head", "middle", "tail")
      val counts = rs.map(_.getLong(2))
      (counts.max - counts.min) should be <= 1L
      val byB = rs.map(r => r.getString(1) -> r).toMap
      // head holds the highest scores: its min clears middle's max
      byB("head").getLong(3) should be >= byB("middle").getLong(4)
      byB("middle").getLong(3) should be >= byB("tail").getLong(4)
      rs.foreach { r =>
        r.getLong(5) should (be >= r.getLong(3) and be <= r.getLong(4))
      }
    }
  }

  test("q_data_card conserves corpus totals per source") {
    val rows = Organize.qDataCard(spark, sf).collect()
    rows.map(_.getLong(1)).sum shouldBe nDocs
    rows.foreach { r =>
      r.getLong(6) should be <= r.getLong(1) // top_lang_docs <= n_docs
      r.getLong(7) should be <= r.getLong(1) // dup_docs <= n_docs
      r.getLong(4) should be >= 1L           // n_langs
    }
    val chars = graft.io.Tables.documents(spark, sf)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    rows.map(_.getLong(3)).sum shouldBe chars
  }

  test("q_quality_cut keeps ~3/4 of every source, threshold inside range") {
    val rows = Organize.qQualityCut(spark, sf).collect()
    rows.map(_.getLong(1)).sum shouldBe nDocs
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      // ntile(4) drops tile 1: ceil splits mean the dropped share is
      // between 1/4 and (1/4 + 1/n) of the source
      kept should be >= (n * 3) / 4
      kept should be < n
      r.getDouble(3) should be <= r.getDouble(4)
    }
  }

  test("q_train_prep: manifest reconciles with the stages it composes") {
    val rows = SparkEntry.queries("q_train_prep")(spark, sf).collect()
    rows.foreach { r =>
      Set("train", "val", "test") should contain(r.getString(0))
      r.getLong(1) should (be >= 0L and be < 8L)
      // docs are >= 10 tokens in the corpus
      r.getLong(3) should be >= r.getLong(2) * 10
    }
    val total = rows.map(_.getLong(2)).sum
    val dedupKept = graft.ops.LlmOps.qDedupKeep(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    val qualityKept = Organize.qQualityCut(spark, sf).collect()
      .map(_.getLong(2)).sum
    // survivors = dedup-kept ∩ quality-kept: bounded above by each
    // stage alone, below by inclusion–exclusion
    total should be <= math.min(dedupKept, qualityKept)
    total should be >= dedupKept + qualityKept - nDocs
  }

  test("q_emb_outliers: at most 5 valid bounded cosines per label, ascending") {
    val rows = Organize.qEmbOutliers(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.length should be <= 5
      val sorted = rs.sortBy(_.getLong(3))
      sorted.map(_.getLong(3)) shouldBe (1L to rs.length.toLong)
      val cs = sorted.map(_.getDouble(2))
      cs shouldBe cs.sorted
      all(cs) should (be >= -1.0 and be <= 1.0)
    }
  }
}
