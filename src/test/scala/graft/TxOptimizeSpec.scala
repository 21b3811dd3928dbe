package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** Pins OPTIMIZE-with-ZORDER (TxTable.optimize) and the history API:
  * optimize must be content-identical (empty CDF), absorb tombstones,
  * flip the layout so a NON-key dimension starts pruning, and declare
  * its z columns as the table's stats columns for future writers;
  * history must tally every commit from log metadata alone. */
class TxOptimizeSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_optspec_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  /** 4096 rows: key k, independent dims a (cycles fast) and b. */
  private def seed(root: String): Unit =
    TxTable.create(spark, root,
      spark.range(4096).select(col("id").as("k"), (col("id") % 64).as("a"),
        expr("id DIV 64").as("b"), (col("id") % 5).cast("double").as("v")),
      "k", nFiles = 16)

  test("optimize re-clusters by z-value: the `a` dimension starts pruning") {
    val root = freshRoot("zopt")
    seed(root)
    // pre-optimize: linear-on-k layout has no `a` stats at all
    TxTable.snapshot(root).statsCols shouldBe empty
    TxTable.deleteMor(spark, root, 100L, 149L) // live tombstones to absorb
    val vPre = TxTable.snapshot(root).version
    TxTable.optimize(spark, root, Seq("a", "b"), nFiles = 16)
    val s = TxTable.snapshot(root)
    s.statsCols shouldBe Seq("a", "b")
    s.dvs shouldBe empty // tombstones materialized
    // content-identical through the MOR lens: CDF across OPTIMIZE is empty
    TxTable.changes(spark, root, vPre, s.version).count() shouldBe 0L
    TxTable.countRows(root) shouldBe 4046L
    // the non-key dimension now stats-prunes through the Catalyst path
    val df = TxRelation.read(spark, root).filter(col("a") === 7)
    df.count() shouldBe 64L - 1L // one a=7 row (k=135) was tombstoned
    val idx = df.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
        org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          i: graft.io.TxFileIndex, _, _, _, _, _), _, _, _, _) => i
    }.get
    idx.lastListedFiles should be < 16
    // appends after OPTIMIZE keep collecting the declared stats
    TxTable.append(spark, root, spark.range(9000, 9010).select(
      col("id").as("k"), lit(77L).as("a"), lit(0L).as("b"),
      lit(0.0).as("v")), nFiles = 1)
    TxTable.snapshot(root).files.filter(_.minK >= 9000)
      .head.stats("a") shouldBe ((77.0, 77.0))
  }

  test("compactBuckets: one file per bucket, placement + txns preserved") {
    val root = freshRoot("bcompact")
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") % 7).as("bk"),
        (col("id") * 2).cast("double").as("v"))
    TxTable.createBucketed(spark, root, batch(0, 200), "k", Seq("bk"), 4)
    TxTable.append(spark, root, batch(200, 300))
    TxTable.appendBatch(spark, root, "bc_app", 3L, batch(300, 350))
    TxTable.deleteMor(spark, root, 10L, 19L) // live tombstones to absorb
    TxTable.snapshot(root).files.size should be > 4
    val vPre = TxTable.snapshot(root).version

    TxTable.compactBuckets(spark, root)

    val s = TxTable.snapshot(root)
    s.version shouldBe vPre + 1
    s.files.size should be <= 4 // one file per non-empty bucket
    s.dvs shouldBe empty // tombstones physically absorbed
    s.bucketBy shouldBe Seq("bk")
    TxTable.countRows(root) shouldBe 340L
    // placement preserved: the scan still reports its BucketSpec, so a
    // groupBy on the bucket column runs with ZERO Exchange — this only
    // holds if every row landed back in its hash bucket
    val grouped = TxRelation.read(spark, root).groupBy("bk").count()
    grouped.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
    grouped.agg(sum("count")).head.getLong(0) shouldBe 340L
    // txn watermarks survive the rewrite: a replayed streaming batch
    // is still absorbed
    TxTable.appendBatch(spark, root, "bc_app", 3L, batch(300, 350))
    TxTable.snapshot(root).version shouldBe s.version
    // and the refusal narrowed, not dropped: range-layout COW still
    // refuses, naming the sanctioned path
    val e = intercept[IllegalArgumentException] {
      TxTable.compact(spark, root)
    }
    e.getMessage should include("compactBuckets")
    // the inverse guard: per-bucket compaction refuses a range table
    val rroot = freshRoot("bcompact_range")
    seed(rroot)
    intercept[IllegalArgumentException] {
      TxTable.compactBuckets(spark, rroot)
    }.getMessage should include("not a bucketed table")
  }

  test("compactBuckets with a prune: the graph edge store sheds " +
      "out-ranked rows, read-time top-M unchanged") {
    val base = s"/tmp/graft_optspec_p${ProcessHandle.current.pid}/gshed"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val e = graft.io.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding"))
    val eroot = s"$base/edges"
    val broot = s"$base/bands"
    graft.ops.GraphAnn.buildAnnStores(spark,
      e.filter(col("vec_id") % 10 < 8), eroot, broot)
    graft.ops.GraphAnn.admitVectors(spark,
      e.filter(col("vec_id") % 10 >= 8), eroot, broot)
    val before = graft.ops.GraphAnn.readGraph(spark, eroot, TestSpark.sf)
      .orderBy("src", "rank").collect()
    val rowsBefore = TxTable.countRows(eroot)

    graft.ops.GraphAnn.compactEdgeStore(spark, eroot)

    // out-ranked candidate rows are physically gone…
    TxTable.countRows(eroot) should be < rowsBefore
    TxTable.snapshot(eroot).files.size should be <= 8
    // …and the read-time graph is row-identical (the tier's exactness
    // argument: a row below rank M can never re-enter any top-M)
    graft.ops.GraphAnn.readGraph(spark, eroot, TestSpark.sf)
      .orderBy("src", "rank").collect() shouldBe before
    // the store still admits after compaction (scheme sidecar intact)
    // and the result stays rebuild-identical through the next append
    val probe = TxRelation.read(spark, eroot).groupBy("src").count()
    probe.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
  }

  test("history tallies every commit from log metadata") {
    val root = freshRoot("hist")
    seed(root) // v0: 16 adds
    TxTable.deleteMor(spark, root, 0L, 9L) // v1: 1 adddv
    TxTable.appendBatch(spark, root, "app", 0L,
      spark.range(5000, 5020).select(col("id").as("k"), lit(0L).as("a"),
        lit(0L).as("b"), lit(0.0).as("v")), nFiles = 2) // v2: txn + 2 adds
    TxTable.optimize(spark, root, Seq("a"), nFiles = 4) // v3: rewrite
    val h = TxTable.history(spark, root).orderBy("version").collect()
    h.map(_.getLong(0)) shouldBe Array(0L, 1L, 2L, 3L)
    h(0).getLong(1) shouldBe 16L // create: adds
    h(0).getLong(5) shouldBe 4096L // rows_added
    h(1).getLong(3) shouldBe 1L // MOR delete: one dv action
    h(1).getLong(6) shouldBe 10L // dv_rows
    h(2).getLong(4) shouldBe 1L // streaming append: txn action
    h(2).getLong(5) shouldBe 20L
    h(3).getLong(2) shouldBe (16L + 2L + 1L) // optimize removed all + dv
    h(3).getLong(1) shouldBe 4L
    h(3).getBoolean(7) shouldBe true // carries the stats-cols meta
  }

  test("compactBuckets on a fully-deleted table commits an empty pack, " +
      "not a crash; the table stays bucketed and appendable") {
    val root = freshRoot("bempty")
    TxTable.createBucketed(spark, root,
      spark.range(0, 40).select(col("id").as("k"), (col("id") % 3).as("bk"),
        col("id").cast("double").as("v")),
      "k", Seq("bk"), 4)
    TxTable.deleteMor(spark, root, 0L, 39L) // every row tombstoned
    TxTable.countRows(root) shouldBe 0L

    // pre-fix this died in writeBucketedFiles on "unable to infer
    // schema" reading back an all-_SUCCESS staging dir
    TxTable.compactBuckets(spark, root)

    val s = TxTable.snapshot(root)
    s.files shouldBe empty // pure file removal commit
    s.dvs shouldBe empty
    s.bucketBy shouldBe Seq("bk") // still a bucketed table
    TxTable.countRows(root) shouldBe 0L
    // and the table is still writable + bucket-contracted afterwards
    TxTable.append(spark, root,
      spark.range(100, 130).select(col("id").as("k"), (col("id") % 3).as("bk"),
        col("id").cast("double").as("v")))
    val grouped = TxRelation.read(spark, root).groupBy("bk").count()
    grouped.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
    grouped.agg(sum("count")).head.getLong(0) shouldBe 30L
  }
}
