package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** Pins merge-on-read deletion vectors (TxTable.deleteMor): a MOR
  * delete must change NO data file, give the same content as the
  * copy-on-write path, keep the manifest row arithmetic exact
  * (countRows answers count(*) from metadata alone), surface in the
  * change data feed without a table diff, survive COW rewrites of
  * neighboring ranges, and be absorbed by compaction. */
class TxDvSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_dvspec_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  /** 100 rows, keys 1..100, 4 range-clustered files. */
  private def seed(root: String): Unit =
    TxTable.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v"), lit("seed").as("tag")),
      "k", nFiles = 4)

  test("MOR delete rewrites zero data files; content equals COW delete") {
    val root = freshRoot("mor_basic")
    seed(root)
    val before = TxTable.snapshot(root).files.map(_.path).toSet
    TxTable.deleteMor(spark, root, 30L, 40L)
    val s = TxTable.snapshot(root)
    s.files.map(_.path).toSet shouldBe before // untouched data files
    s.dvs should have size 1
    s.dvs.head.rows shouldBe 11L
    val got = TxTable.read(spark, root)
    got.count() shouldBe 89L
    got.filter(col("k").between(30, 40)).count() shouldBe 0L
    // the Catalyst relation path subtracts tombstones too
    TxRelation.read(spark, root).count() shouldBe 89L
    // time travel to v0 still sees all 100 (tombstones are versioned)
    TxTable.read(spark, root, Some(0L)).count() shouldBe 100L
  }

  test("countRows answers from the manifest alone, exactly") {
    val root = freshRoot("mor_count")
    seed(root)
    TxTable.countRows(root) shouldBe 100L
    TxTable.deleteMor(spark, root, 10L, 19L) // v1: −10
    TxTable.countRows(root) shouldBe 90L
    // overlapping second MOR delete must not double-count the overlap:
    // keys 15..19 are already dead, so the new dv holds only 20..25
    TxTable.deleteMor(spark, root, 15L, 25L) // v2: −6 more
    val s = TxTable.snapshot(root)
    s.dvs.map(_.rows).sum shouldBe 16L
    TxTable.countRows(root) shouldBe 84L
    TxTable.read(spark, root).count() shouldBe 84L
    TxTable.countRows(root, Some(1L)) shouldBe 90L
    TxTable.countRows(root, Some(0L)) shouldBe 100L
  }

  test("CDF surfaces MOR deletes from untouched files as delete rows") {
    val root = freshRoot("mor_cdf")
    seed(root)
    TxTable.deleteMor(spark, root, 30L, 40L) // v1: no file add/remove at all
    val cdf = TxTable.changes(spark, root, 0L, 1L).collect()
    cdf.length shouldBe 11
    cdf.map(_.getAs[String]("change_type")).distinct shouldBe Array("delete")
    cdf.map(_.getLong(0)).sorted shouldBe (30L to 40L).toArray
    // full-row payload came from the (stats-pruned) pre-image read
    cdf.map(_.getAs[String]("tag")).distinct shouldBe Array("seed")
  }

  test("COW rewrite over a tombstoned range keeps manifest arithmetic exact") {
    val root = freshRoot("mor_cow")
    seed(root)
    TxTable.deleteMor(spark, root, 30L, 40L) // v1 tombstones
    // COW delete overlapping the same file(s) as the tombstoned range:
    // the rewrite reads through the MOR lens (keys 30..40 must not
    // reappear) AND shrinks the dv set in the same commit — those keys
    // are physically gone, so a live tombstone for them would make
    // countRows double-subtract
    TxTable.delete(spark, root, 45L, 50L, nFiles = 1) // v2 rewrite
    val got = TxTable.read(spark, root)
    got.count() shouldBe 83L // 100 − 11 MOR − 6 COW
    got.filter(col("k").between(30, 40)).count() shouldBe 0L
    // every dv key of the rewritten file was materialized away
    TxTable.snapshot(root).dvs shouldBe empty
    TxTable.countRows(root) shouldBe 83L
    // and time travel still sees the pre-rewrite tombstone state
    TxTable.countRows(root, Some(1L)) shouldBe 89L
  }

  test("COW rewrite drops only the rewritten files' tombstones") {
    val root = freshRoot("mor_cow_partial")
    seed(root) // 4 files: 1..25, 26..50, 51..75, 76..100
    TxTable.deleteMor(spark, root, 30L, 40L) // in file 2
    TxTable.deleteMor(spark, root, 80L, 85L) // in file 4
    TxTable.delete(spark, root, 45L, 50L, nFiles = 1) // rewrites file 2 only
    val s = TxTable.snapshot(root)
    // file 4's tombstones survive (their rows are still physical)
    s.dvs.map(_.rows).sum shouldBe 6L
    TxTable.countRows(root) shouldBe (100L - 11 - 6 - 6)
    TxTable.read(spark, root).count() shouldBe (100L - 11 - 6 - 6)
    TxTable.read(spark, root).filter(col("k").between(80, 85))
      .count() shouldBe 0L
  }

  test("CDF across a COW rewrite with surviving tombstones has no spurious deletes") {
    val root = freshRoot("mor_cow_cdf")
    seed(root) // 4 files: 1..25, 26..50, 51..75, 76..100
    TxTable.deleteMor(spark, root, 30L, 40L) // v1: dv in file 2's range
    TxTable.deleteMor(spark, root, 80L, 85L) // v2: dv in file 4's range
    // v3: COW-rewrites file 2 only; dvRewriteActions drops the 30..40
    // tombstones (physically gone) and RESTAGES the surviving 80..85
    // tombstones under a fresh dv path — the path changed, the dead
    // keys did not
    TxTable.delete(spark, root, 45L, 50L, nFiles = 1)
    // the interval's only real change is the COW delete of 45..50;
    // the restaged 80..85 tombstones must NOT re-announce as deletes
    val cdf = TxTable.changes(spark, root, 2L, 3L).collect()
    cdf.map(_.getAs[String]("change_type")).distinct shouldBe Array("delete")
    cdf.map(_.getLong(0)).sorted shouldBe (45L to 50L).toArray
    // a wider interval spanning both MOR deletes and the rewrite
    // reports each dead key exactly once
    val wide = TxTable.changes(spark, root, 0L, 3L).collect()
    wide.map(_.getAs[String]("change_type")).distinct shouldBe Array("delete")
    wide.map(_.getLong(0)).sorted shouldBe
      ((30L to 40L) ++ (45L to 50L) ++ (80L to 85L)).toArray
  }

  test("racing overlapping MOR deletes never double-count tombstones") {
    val root = freshRoot("mor_race")
    seed(root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = Seq((10L, 25L), (20L, 30L)).map { case (lo, hi) =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxTable.deleteMor(spark, root, lo, hi)
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // keys 10..30 dead exactly once each, whatever the interleaving
    TxTable.read(spark, root).count() shouldBe 79L
    TxTable.countRows(root) shouldBe 79L
    TxTable.snapshot(root).dvs.map(_.rows).sum shouldBe 21L
  }

  test("compaction absorbs tombstones; vacuum then reclaims the dv file") {
    val root = freshRoot("mor_compact")
    seed(root)
    TxTable.deleteMor(spark, root, 30L, 40L) // v1
    val v = TxTable.compact(spark, root, nFiles = 2) // v2: materializes
    val s = TxTable.snapshot(root)
    s.dvs shouldBe empty
    TxTable.read(spark, root).count() shouldBe 89L
    TxTable.countRows(root) shouldBe 89L
    // compaction is content-preserving through the MOR lens
    TxTable.changes(spark, root, 1L, 2L).count() shouldBe 0L
    // dv parquet still on disk for time travel; vacuum at the new
    // horizon reclaims it together with the seed data files
    val dead = TxTable.vacuum(root, retainFrom = v, minAgeMs = 0L)
    dead.count(_.startsWith("dv-")) shouldBe 1
    dead.count(_.startsWith("part-")) shouldBe 4
    TxTable.read(spark, root).count() shouldBe 89L
  }

  test("predicate MOR delete: non-key condition, exact arithmetic, idempotent") {
    val root = freshRoot("mor_where")
    seed(root) // v column = k*10 as double
    // the compliance shape: delete by a NON-key predicate
    TxTable.deleteMorWhere(spark, root,
      col("v") >= 200.0 && col("v") < 300.0) // keys 20..29
    TxTable.read(spark, root).count() shouldBe 90L
    TxTable.countRows(root) shouldBe 90L
    TxTable.read(spark, root).filter(col("k").between(20, 29))
      .count() shouldBe 0L
    // zero data files touched
    TxTable.snapshot(root).files.map(_.path).toSet shouldBe
      TxTable.snapshot(root, Some(0L)).files.map(_.path).toSet
    // re-running the same predicate: dead set empty → version unchanged
    val v = TxTable.versions(root).max
    TxTable.deleteMorWhere(spark, root,
      col("v") >= 200.0 && col("v") < 300.0) shouldBe v
    // overlapping predicate delete stays disjoint (MOR lens applied)
    TxTable.deleteMorWhere(spark, root, col("v") < 250.0) // keys 1..19
    TxTable.snapshot(root).dvs.map(_.rows).sum shouldBe 29L
    TxTable.countRows(root) shouldBe 71L
    TxTable.read(spark, root).count() shouldBe 71L
    // compaction materializes everything away as usual
    TxTable.compact(spark, root, nFiles = 2)
    TxTable.snapshot(root).dvs shouldBe empty
    TxTable.countRows(root) shouldBe 71L
  }

  test("empty-range MOR delete is a no-op commit-wise") {
    val root = freshRoot("mor_empty")
    seed(root)
    TxTable.deleteMor(spark, root, 500L, 600L) shouldBe 0L // still v0
    TxTable.versions(root) shouldBe Seq(0L)
    TxTable.snapshot(root).dvs shouldBe empty
  }
}
