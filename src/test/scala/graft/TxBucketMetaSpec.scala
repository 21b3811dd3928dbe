package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Bucket-spec survival across schema-change commits. Every
  * meta-carrying commit after v0 must re-serialize the FULL snapshot
  * meta (metaLineOf's own invariant) — a schema evolution, rename, or
  * drop that omitted bucket_by would silently de-bucket the table:
  * later appends would route through the range writer, reads would
  * lose the BucketSpec/zero-Exchange contract, and the COW refusals
  * guarding bucket placement would stop firing. Pins all four schema
  * paths plus the bucket-column guards. */
class TxBucketMetaSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val base = s"/tmp/graft_txbucketmeta_p${ProcessHandle.current.pid}"

  private def fresh(name: String): String = {
    val root = s"$base/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.createBucketed(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") % 7).as("bkey"),
        (col("id") * 10).cast("double").as("v")),
      "k", bucketBy = Seq("bkey"), nBuckets = 4)
    root
  }

  test("ALTER ADD COLUMNS keeps the bucket spec; appends stay bucketed") {
    val root = fresh("evolve")
    TxTable.evolveSchema(root,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    val s = TxTable.snapshot(root)
    s.bucketBy shouldBe Seq("bkey")
    s.nBuckets shouldBe 4
    // the next append must still route through the bucketed writer:
    // ≤ nBuckets files per batch, and the read keeps its BucketSpec
    TxTable.append(spark, root,
      spark.range(101, 121).select(col("id").as("k"),
        (col("id") % 7).as("bkey"),
        (col("id") * 10).cast("double").as("v"), col("id").as("extra")))
    TxTable.snapshot(root).bucketBy shouldBe Seq("bkey")
    val grouped = graft.io.TxRelation.read(spark, root)
      .groupBy("bkey").count()
    val plan = grouped.queryExecution.executedPlan.toString
    plan should not include "Exchange hashpartitioning"
    grouped.count() shouldBe 7
  }

  test("schema-evolving append keeps the bucket spec") {
    val root = fresh("evolve_append")
    TxTable.append(spark, root,
      spark.range(101, 121).select(col("id").as("k"),
        (col("id") % 7).as("bkey"),
        (col("id") * 10).cast("double").as("v"),
        concat(lit("t"), col("id")).as("tag")),
      mergeSchema = true)
    val s = TxTable.snapshot(root)
    s.bucketBy shouldBe Seq("bkey")
    s.nBuckets shouldBe 4
    s.schema.fieldNames should contain("tag")
    TxTable.read(spark, root).count() shouldBe 120
  }

  test("RENAME of a non-bucket column keeps the bucket spec") {
    val root = fresh("rename_other")
    TxTable.renameColumn(root, "v", "value")
    val s = TxTable.snapshot(root)
    s.bucketBy shouldBe Seq("bkey")
    s.nBuckets shouldBe 4
  }

  test("RENAME of a bucket column follows the rename; appends still hash it") {
    val root = fresh("rename_bucket")
    TxTable.renameColumn(root, "bkey", "bucket_key")
    val s = TxTable.snapshot(root)
    s.bucketBy shouldBe Seq("bucket_key")
    s.nBuckets shouldBe 4
    // bucket placement hashed the VALUES, which didn't change — a
    // post-rename append under the new logical name must land rows in
    // the same buckets as the original files (same hash input)
    TxTable.append(spark, root,
      spark.range(101, 121).select(col("id").as("k"),
        (col("id") % 7).as("bucket_key"),
        (col("id") * 10).cast("double").as("v")))
    val grouped = graft.io.TxRelation.read(spark, root)
      .groupBy("bucket_key").count()
    grouped.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
    grouped.agg(sum("count")).head.getLong(0) shouldBe 120
  }

  test("DROP of a bucket column is refused; DROP of another keeps the spec") {
    val root = fresh("drop")
    val e = intercept[IllegalArgumentException] {
      TxTable.dropColumn(root, "bkey")
    }
    e.getMessage should include("bucket column")
    TxTable.dropColumn(root, "v")
    val s = TxTable.snapshot(root)
    s.bucketBy shouldBe Seq("bkey")
    s.nBuckets shouldBe 4
    s.schema.fieldNames shouldBe Array("k", "bkey")
  }
}
