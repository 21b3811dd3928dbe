package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxFileIndex, TxRelation, TxTable}

/** Pins the Catalyst-integrated read path (io/TxRelation.scala) and the
  * Z-order layout (TxTable.zorderValue): pushed data filters must reach
  * the manifest's FileIndex and prune files by per-column stats, and
  * the z-layout must make predicates on EVERY clustered dimension
  * prune, where linear clustering only serves the key. The 64×64 grid
  * is adversarial for linear layouts on purpose: `a = id % 64` cycles
  * inside every key range, so a linear table's files all contain every
  * `a` value and an `a` predicate can prune nothing. */
class TxZorderSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val dir = s"/tmp/graft_zspec_p${ProcessHandle.current.pid}"
  private val NFiles = 16

  /** 4096 rows on a 64×64 (a, b) grid; k is the unique key. */
  private def grid: DataFrame =
    spark.range(4096).select(
      col("id").as("k"),
      (col("id") % 64).as("a"),
      expr("id DIV 64").as("b"), // integer division (`/` is double in SQL)
      (col("id") * 3 % 97).as("v"))

  private lazy val zRoot: String = {
    val r = s"$dir/ztable"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    val df = grid
    TxTable.create(spark, r, df, "k", nFiles = NFiles,
      statsCols = Seq("a", "b"),
      clusterBy = Some(TxTable.zorderValue(df, Seq("a", "b"))))
    r
  }

  private lazy val linRoot: String = {
    val r = s"$dir/lintable"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    TxTable.create(spark, r, grid, "k", nFiles = NFiles,
      statsCols = Seq("a", "b"))
    r
  }

  /** The manifest FileIndex behind a TxRelation DataFrame. */
  private def indexOf(df: DataFrame): TxFileIndex =
    df.queryExecution.optimizedPlan.collectFirst {
      case LogicalRelation(HadoopFsRelation(loc: TxFileIndex, _, _, _, _, _),
        _, _, _, _) => loc
    }.get

  /** Run `df`, return (#files the scan listed, result rows). */
  private def scanned(df: DataFrame): (Int, Long) = {
    val n = df.count()
    (indexOf(df).lastListedFiles, n)
  }

  test("z-ordered content round-trips exactly (layout never alters data)") {
    val got = TxRelation.read(spark, zRoot).orderBy("k").collect()
    got should have length 4096
    got.map(_.getLong(0)) shouldBe (0L until 4096L).toArray
    // spot content: row k carries its own grid coords
    got(130).getLong(1) shouldBe (130 % 64)
    got(130).getLong(2) shouldBe (130 / 64)
  }

  test("catalyst-pushed filter on `a` prunes z-table files, full answer") {
    val (files, rows) = scanned(
      TxRelation.read(spark, zRoot).filter(col("a") === 7))
    rows shouldBe 64L // one grid column
    files should be < NFiles // stats pruning engaged via pushed filters
    files should be > 0
  }

  test("both z dimensions prune; the linear table serves only its key") {
    val (za, _) = scanned(TxRelation.read(spark, zRoot)
      .filter(col("a").between(0, 7)))
    val (zb, _) = scanned(TxRelation.read(spark, zRoot)
      .filter(col("b").between(0, 7)))
    za should be < NFiles
    zb should be < NFiles
    // the linear layout's files each contain EVERY `a` value…
    val (la, lrows) = scanned(TxRelation.read(spark, linRoot)
      .filter(col("a").between(0, 7)))
    lrows shouldBe 8 * 64L
    la shouldBe NFiles // nothing pruned
    // …but its own key still prunes (sanity: stats work, layout differs)
    val (lk, _) = scanned(TxRelation.read(spark, linRoot)
      .filter(col("k") < 256))
    lk should be < NFiles
  }

  test("conjunction on both dims prunes to the intersection, exact rows") {
    val q = TxRelation.read(spark, zRoot)
      .filter(col("a").between(16, 23) && col("b").between(16, 23))
    val (files, rows) = scanned(q)
    rows shouldBe 64L // 8×8 grid block
    files should be <= NFiles / 2
    // values, not just counts: compare against the in-memory truth
    q.select(sum(col("v"))).head.getLong(0) shouldBe
      grid.filter(col("a").between(16, 23) && col("b").between(16, 23))
        .select(sum(col("v"))).head.getLong(0)
  }

  test("unsupported predicate shapes disable pruning, never correctness") {
    // a cast/arithmetic shape the pruner doesn't understand
    val q = TxRelation.read(spark, zRoot).filter((col("a") * 2) === 14)
    val (files, rows) = scanned(q)
    files shouldBe NFiles // conservative: listed everything
    rows shouldBe 64L // …and still computed the right answer
  }

  test("appends to a stats table keep collecting stats for new files") {
    val r = s"$dir/appendstats"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    TxTable.create(spark, r, grid, "k", nFiles = 4, statsCols = Seq("a", "b"))
    TxTable.append(spark, r,
      spark.range(5000, 5064).select(col("id").as("k"), lit(99L).as("a"),
        lit(99L).as("b"), lit(0L).as("v")), nFiles = 1)
    val s = TxTable.snapshot(r)
    s.statsCols shouldBe Seq("a", "b")
    val appended = s.files.filter(_.minK >= 5000)
    appended should have size 1
    appended.head.stats("a") shouldBe ((99.0, 99.0))
    // and the appended file is the only one listed for a=99
    val (files, rows) = scanned(
      TxRelation.read(spark, r).filter(col("a") === 99))
    rows shouldBe 64L
    files shouldBe 1
  }
}
