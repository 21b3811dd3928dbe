package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Pins the transactional-table format's ACID story (io/TxTable.scala):
  * snapshot isolation + time travel, file-level stats pruning on the
  * copy-on-write path (a narrow delete rewrites ONE file, not the
  * table), optimistic-concurrency rebase vs conflict abort, checkpoint
  * replay equivalence, crash-garbage immunity, and vacuum. The content
  * gates live in CORRECTNESS (q_tx_* vs the DuckDB oracles); this spec
  * pins the FORMAT behaviors no relational oracle can see. */
class TxTableSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_txspec_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  /** 100 rows, keys 1..100, clustered into 4 files (ranges ~25 wide). */
  private def seed(root: String): Unit = {
    val df = spark.range(1, 101).select(
      col("id").as("k"), (col("id") * 10).cast("double").as("v"),
      lit("seed").as("tag"))
    TxTable.create(spark, root, df, "k", nFiles = 4)
  }

  test("create/read round trip; clustered files carry disjoint key ranges") {
    val root = freshRoot("roundtrip")
    seed(root)
    val s = TxTable.snapshot(root)
    s.version shouldBe 0L
    s.files.size shouldBe 4
    s.files.map(_.rows).sum shouldBe 100L
    // range clustering: files sorted by minK don't overlap
    val sorted = s.files.sortBy(_.minK)
    sorted.sliding(2).foreach { case Seq(a, b) => a.maxK should be < b.minK }
    TxTable.read(spark, root).agg(sum("k")).head.getLong(0) shouldBe 5050L
  }

  test("stats-pruned read opens only intersecting files, same answer") {
    val root = freshRoot("prune_read")
    seed(root)
    val s = TxTable.snapshot(root)
    val hit = s.files.filter(f => f.maxK >= 30L && f.minK <= 40L)
    hit.size should be < s.files.size // the bound lives in 1-2 of 4 files
    val bounded = TxTable.read(spark, root, keyLo = Some(30L), keyHi = Some(40L))
      .filter(col("k").between(30, 40))
    bounded.count() shouldBe 11L
  }

  test("narrow COW delete rewrites only the overlapping file") {
    val root = freshRoot("cow_delete")
    seed(root)
    val before = TxTable.snapshot(root).files.map(_.path).toSet
    TxTable.delete(spark, root, 30L, 40L, nFiles = 1)
    val after = TxTable.snapshot(root).files.map(_.path).toSet
    // untouched files survive by identity; exactly the hit file(s) swapped
    val removed = before -- after
    removed.size should be < before.size
    (before -- removed) should be((before & after))
    TxTable.read(spark, root).filter(col("k").between(30, 40)).count() shouldBe 0L
    TxTable.read(spark, root).count() shouldBe 89L
  }

  test("time travel: v0 reconstructs bit-for-bit after later commits") {
    val root = freshRoot("travel")
    seed(root)
    val v0 = TxTable.read(spark, root, Some(0L)).orderBy("k").collect()
    TxTable.delete(spark, root, 1L, 50L)
    TxTable.append(spark, root,
      spark.range(200, 210).select(col("id").as("k"),
        lit(0.0).as("v"), lit("late").as("tag")))
    TxTable.read(spark, root, Some(0L)).orderBy("k").collect() shouldBe v0
    TxTable.read(spark, root).count() shouldBe 60L // 50 kept + 10 appended
  }

  test("lost race rebases: commit lands at the next free version") {
    val root = freshRoot("rebase")
    seed(root)
    // a racer takes version 1 between our snapshot and our commit
    TxTable.commit(root, 1L, Seq.empty)
    // our commit also expected 1 — no shared removes, so it rebases to 2
    TxTable.commit(root, 1L, Seq.empty) shouldBe 2L
    TxTable.versions(root) shouldBe Seq(0L, 1L, 2L)
  }

  test("delete/delete conflict aborts with ConcurrentModificationException") {
    val root = freshRoot("conflict")
    seed(root)
    val stale = TxTable.snapshot(root) // both writers read v0
    val victim = stale.files.head.path
    TxTable.delete(spark, root, stale.files.head.minK, stale.files.head.maxK)
    // the slower writer tries to publish a rewrite that removes the same
    // file the winner already removed — its COW premise is void
    a[java.util.ConcurrentModificationException] should be thrownBy
      TxTable.commit(root, stale.version + 1, Seq.empty, removes = Set(victim))
  }

  test("checkpoint replay equals full-log replay; compaction shrinks files") {
    val root = freshRoot("checkpoint")
    seed(root)
    TxTable.delete(spark, root, 30L, 40L, nFiles = 1)
    val v = TxTable.compact(spark, root, nFiles = 2)
    Files.exists(Paths.get(root, "_log", f"_checkpoint.$v%08d.json")) shouldBe true
    val viaCkpt = TxTable.snapshot(root, useCheckpoint = true)
    val viaLog = TxTable.snapshot(root, useCheckpoint = false)
    viaCkpt.files.toSet shouldBe viaLog.files.toSet
    viaCkpt.files.size should be <= 2
    TxTable.read(spark, root).agg(sum("k")).head.getLong(0) shouldBe
      (5050L - (30L to 40L).sum)
  }

  test("crash garbage is inert: _tmp_ droppings and stale staging dirs") {
    val root = freshRoot("garbage")
    seed(root)
    Files.write(Paths.get(root, "_log", "_tmp_crashed.json"),
      "not even json".getBytes)
    val staleDir = Paths.get(root, "staging-crashed")
    Files.createDirectories(staleDir)
    Files.write(staleDir.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    TxTable.versions(root) shouldBe Seq(0L)
    TxTable.read(spark, root).count() shouldBe 100L
  }

  test("vacuum deletes only unreferenced files; retained reads survive") {
    val root = freshRoot("vacuum")
    seed(root)
    val v = TxTable.compact(spark, root, nFiles = 2) // orphans the 4 seed files
    val dead = TxTable.vacuum(root, retainFrom = v, minAgeMs = 0L)
    dead.size shouldBe 4
    TxTable.read(spark, root).count() shouldBe 100L
    // time travel below the retention horizon is gone, as documented
    an[Exception] should be thrownBy
      TxTable.read(spark, root, Some(0L)).count()
  }

  test("vacuumed time travel fails loudly at the gate, with the reason") {
    val root = freshRoot("vacuum_gate")
    seed(root)
    TxTable.append(spark, root, spark.range(101, 111).select(
      col("id").as("k"), (col("id") * 10).cast("double").as("v"),
      lit("a1").as("tag")), nFiles = 1) // v1
    val v2 = TxTable.compact(spark, root, nFiles = 2)
    TxTable.vacuum(root, retainFrom = v2, minAgeMs = 0L)
    TxTable.retentionFloor(root) shouldBe v2
    // the refusal happens at SNAPSHOT time (before any file IO) and
    // names the vacuum as the cause — not a downstream file-not-found
    val ex = the[IllegalArgumentException] thrownBy
      TxTable.snapshot(root, Some(1L))
    ex.getMessage should include("vacuum")
    ex.getMessage should include("retention floor")
    // countRows and read go through the same gate
    an[IllegalArgumentException] should be thrownBy
      TxTable.countRows(root, Some(0L))
    // the floor is monotone: a later vacuum with a LOWER horizon must
    // not re-open versions whose files are already gone
    TxTable.vacuum(root, retainFrom = 0L, minAgeMs = 0L)
    TxTable.retentionFloor(root) shouldBe v2
    an[IllegalArgumentException] should be thrownBy
      TxTable.snapshot(root, Some(0L))
    // at-or-above the floor everything still works
    TxTable.read(spark, root, Some(v2)).count() shouldBe 110L
    // a horizon past the newest version (would unreference every live
    // file) is refused outright
    an[IllegalArgumentException] should be thrownBy
      TxTable.vacuum(root, retainFrom = v2 + 10, minAgeMs = 0L)
  }

  test("concurrency soak: 8 racing appenders all land, no lost updates") {
    val root = freshRoot("soak")
    seed(root)
    // 8 threads snapshot-then-commit concurrently: every one must land
    // (appends rebase past each other), versions must be gapless, and
    // no appended batch may be lost or doubled
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxTable.append(spark, root,
            spark.range(1000L + i * 10, 1000L + i * 10 + 5).select(
              col("id").as("k"), lit(i.toDouble).as("v"),
              lit(s"w$i").as("tag")), nFiles = 1)
        })
      }
      futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        .sorted shouldBe (1L to 8L)
    } finally pool.shutdown()
    TxTable.versions(root) shouldBe (0L to 8L)
    TxTable.read(spark, root).count() shouldBe 140L // 100 seed + 8×5
    TxTable.read(spark, root).filter(col("k") >= 1000)
      .select("k").distinct().count() shouldBe 40L
  }

  test("change data feed: delete commit emits deletes; compaction emits nothing") {
    val root = freshRoot("cdf")
    seed(root)
    TxTable.delete(spark, root, 30L, 40L, nFiles = 1) // v1
    val cdf01 = TxTable.changes(spark, root, 0L, 1L).collect()
    cdf01.length shouldBe 11
    cdf01.map(_.getAs[String]("change_type")).distinct shouldBe Array("delete")
    cdf01.map(_.getLong(0)).sorted shouldBe (30L to 40L).toArray
    TxTable.compact(spark, root, nFiles = 2) // v2: pure rewrite
    TxTable.changes(spark, root, 1L, 2L).count() shouldBe 0L
    // and an update surfaces both images
    val up = spark.range(1).select(lit(5L).as("k"), lit("U").as("action"),
      lit(999.0).as("c_v"), lit("upd").as("c_tag"))
    TxTable.merge(spark, root, up) // v3
    val cdf23 = TxTable.changes(spark, root, 2L, 3L)
      .orderBy("change_type").collect()
    cdf23.map(r => (r.getAs[String]("change_type"), r.getLong(0))) shouldBe
      Array(("update_post", 5L), ("update_pre", 5L))
    cdf23.find(_.getAs[String]("change_type") == "update_post")
      .get.getAs[Double]("v") shouldBe 999.0
  }

  test("schema evolution: widened append; old rows read null; travel keeps v0 schema") {
    val root = freshRoot("evolve")
    seed(root)
    val wide = spark.range(300, 305).select(col("id").as("k"),
      lit(1.0).as("v"), lit("w").as("tag"), lit("en").as("lang"))
    an[IllegalArgumentException] should be thrownBy
      TxTable.append(spark, root, wide) // evolution must be opted into
    TxTable.append(spark, root, wide, mergeSchema = true)
    val latest = TxTable.read(spark, root)
    latest.columns shouldBe Array("k", "v", "tag", "lang")
    latest.filter(col("lang").isNull).count() shouldBe 100L // pre-evolution rows
    latest.filter(col("lang") === "en").count() shouldBe 5L
    TxTable.read(spark, root, Some(0L)).columns shouldBe Array("k", "v", "tag")
  }

  test("merge: insert outside every file's key range still lands") {
    val root = freshRoot("merge_outside")
    seed(root)
    val changes = spark.range(1).select(
      lit(999L).as("k"), lit("I").as("action"),
      lit(9.9).as("c_v"), lit("new").as("c_tag"))
    TxTable.merge(spark, root, changes)
    val got = TxTable.read(spark, root).filter(col("k") === 999L).collect()
    got.length shouldBe 1
    got.head.getString(2) shouldBe "new"
    TxTable.read(spark, root).count() shouldBe 101L
  }
}
