package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The standing-dedup-index scale story (SURVEY §2 B23, ingestion tier):
  * q_incr_dedup_idx reads the corpus fingerprint/band/signature relations
  * from BUCKETED TX TABLES (ACID standing indexes whose scans report a
  * real BucketSpec), so a daily increment shuffles ONLY the batch —
  * corpus rows arrive pre-partitioned on their join keys and never
  * cross the wire. Pins both the physical plan (zero Exchange above
  * the corpus-side scans) and the output contract (≡ the from-scratch
  * q_incr_dedup). */
class BucketedIndexSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("indexed incremental dedup ≡ from-scratch incremental dedup") {
    val idx = SparkEntry.queries("q_incr_dedup_idx")(spark, sf).collect().toSeq
    val scratch = SparkEntry.queries("q_incr_dedup")(spark, sf).collect().toSeq
    idx shouldBe scratch
    idx.size should be > 0
  }

  test("band-index join: corpus side reads bucketed, only the batch shuffles") {
    val (_, bandT, _) = graft.ops.Incremental.buildIndexes(spark, sf)
    val batch = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
    val bBands = graft.ops.Incremental.bandsOf(
      graft.ops.Incremental.signatures(batch))
    // force sort-merge: the point is the fact⋈fact shape where the batch
    // is too big to broadcast — exactly the 100 TB daily-ingest plan
    val joined = graft.io.TxRelation.read(spark, bandT).as("c").hint("merge")
      .join(bBands.as("b"), col("c.bkey") === col("b.bkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // exactly ONE shuffle — the batch side; the bucketed corpus scan
    // feeds the join directly
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    // and the single Exchange sits on the batch subtree, not above the
    // bucketed table scan: the corpus scan reports its bucket layout
    plan should include("SelectedBucketsCount")
    joined.count() should be > 0L
  }

  test("a selective band probe bucket-prunes the index scan") {
    // index-aware FILE pruning for the band join: a probe carrying
    // literal bucket-key predicates makes FileSourceScanExec select
    // only the bucket whose hash matches — at 100 TB a selective batch
    // touches a handful of buckets, not the standing index's file set
    val (_, bandT, _) = graft.ops.Incremental.buildIndexes(spark, sf)
    // a bare filter has no distribution requirement, so the planner's
    // DisableUnnecessaryBucketedScan would read the files unbucketed;
    // pin autoBucketedScan off for the probe — the standard knob — so
    // the bucket-set pruning the selective path relies on is visible
    val prev = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val idx = graft.io.TxRelation.read(spark, bandT)
      val one = idx.head
      val probe = idx.filter(col("bkey") === one.getAs[Long]("bkey"))
      val plan = probe.queryExecution.executedPlan.toString
      plan should include regex
        "SelectedBucketsCount: 1 \\(out of 8\\)|SelectedBucketsCount: 1 out of 8"
      probe.count() should be > 0L
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("phash-index join: corpus image bands read bucketed, only the batch shuffles") {
    // the multimodal standing index (r16 verdict item 3) carries the
    // same physical contract as the text band index above: the corpus
    // side of the near-dup candidate join arrives pre-bucketed on the
    // folded band key — zero Exchange above the index scan, so a daily
    // image batch shuffles only itself (and corpus images are never
    // re-decoded)
    val root = graft.ops.Multimodal.buildPhashIndex(spark, sf)
    val batch = graft.ops.Multimodal.phashBandsFolded(
      SparkEntry.queries("q_mm_phash_dedup")(spark, sf)
        .select(col("doc_id"), col("phash_hi"), col("phash_lo"))
        .filter(col("doc_id") % 10 >= 8))
    val joined = graft.io.TxRelation.read(spark, root).as("c").hint("merge")
      .join(batch.as("b"), col("c.bkey") === col("b.bkey"))
    val plan = joined.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    plan should include("SelectedBucketsCount")
    joined.count() should be > 0L
  }

  test("fingerprint-index join: corpus fingerprints arrive bucketed on the join key") {
    val (fpT, _, _) = graft.ops.Incremental.buildIndexes(spark, sf)
    val batchFp = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val joined = graft.io.TxRelation.read(spark, fpT).hint("merge")
      .join(batchFp, col("cfp") === col("fp"))
    val plan = joined.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    plan should include("SelectedBucketsCount")
  }
}
