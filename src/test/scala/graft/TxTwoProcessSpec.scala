package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** TWO-PROCESS commit contention: the in-JVM soaks (TxTableSpec,
  * TxModelSpec) race writers as threads, which shares one JVM's memory
  * model; the hard-link put-if-absent protocol's whole claim is that
  * atomicity comes from the FILESYSTEM (POSIX createLink), so this
  * spec launches a second JVM (graft.tools.TxContender) and contends
  * appends + a copy-on-write delete on one table root across process
  * boundaries. Serializable outcome asserted: no lost rows, no doubled
  * rows, gapless versions, every version's manifest replayable (no
  * torn commit). */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class TxTwoProcessSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  test("cross-process appends + COW delete serialize; no torn manifest") {
    val root = s"/tmp/graft_tx2proc_p${ProcessHandle.current.pid}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v"), lit("seed").as("tag")),
      "k", nFiles = 4)

    // child JVM: 6 appends of 50 rows at keys 10000+ once _go appears
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(
      s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.tools.TxContender", root, "child", "10000", "6", "50")).toArray
    val child = new ProcessBuilder(cmd: _*).inheritIO().start()
    try {
      // handshake: wait for the child session, then fire the gun
      val deadline = System.currentTimeMillis() + 120000
      while (!Files.exists(Paths.get(root, "_child_ready"))) {
        require(child.isAlive, "child JVM died before ready")
        require(System.currentTimeMillis() < deadline, "child never ready")
        Thread.sleep(50)
      }
      Files.write(Paths.get(root, "_go"), Array.emptyByteArray)
      // parent: 6 contending appends at keys 20000+ and, mid-stream, a
      // strict-commit COW delete of seed keys [1, 50]
      (0 until 6).foreach { i =>
        val lo = 20000L + i * 50
        TxTable.append(spark, root,
          spark.range(lo, lo + 50).select(col("id").as("k"),
            (col("id") * 10).cast("double").as("v"),
            lit("parent").as("tag")), nFiles = 1)
        if (i == 2) TxTable.delete(spark, root, 1L, 50L, nFiles = 1)
      }
      child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      child.exitValue() shouldBe 0
    } finally { if (child.isAlive) child.destroyForcibly() }

    // serializable outcome: 100 seed − 50 deleted + 300 child + 300 parent
    val got = TxTable.read(spark, root)
    got.count() shouldBe (100L - 50 + 300 + 300)
    TxTable.countRows(root) shouldBe (100L - 50 + 300 + 300)
    // every appended batch landed exactly once (no lost or doubled rows)
    got.filter(col("tag") === "child").count() shouldBe 300L
    got.filter(col("tag") === "parent").count() shouldBe 300L
    got.select("k").distinct().count() shouldBe got.count()
    // the COW delete's serializable premise held: every seed key in
    // [1,50] is gone, every one in [51,100] survives
    got.filter(col("tag") === "seed" && col("k") <= 50).count() shouldBe 0L
    got.filter(col("tag") === "seed").count() shouldBe 50L
    // versions are gapless and every manifest replays (no torn commit)
    val vs = TxTable.versions(root)
    vs shouldBe (0L to vs.max)
    // commits: 1 create + 6 child + 6 parent + 1 delete
    vs.size shouldBe 14
    vs.foreach { v => TxTable.snapshot(root, Some(v)).files should not be empty }
    // row counts per version are internally consistent manifest sums
    vs.foreach { v => TxTable.countRows(root, Some(v)) should be >= 50L }
  }
}
