package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxCatalog, TxTable}

/** Pins `spark.readStream.table("tx.<t>")` — the streaming TABLE read
  * over the tx tier ([[graft.io.TxAppendSource]], reached through the
  * catalog by the [[graft.plans.TxCatalogReads]] StreamingRelationV2
  * rewrite): initial full snapshot, pure-append commit tail,
  * checkpoint-resumed restart consuming only new commits, loud failure
  * on change commits, `skipChangeCommits` opt-out, and
  * `startingVersion` tail-only mode. */
class TxStreamReadSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val base = s"/tmp/graft_txread_p${ProcessHandle.current.pid}"

  private def fresh(name: String): String = {
    val root = s"$base/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v")),
      "k", nFiles = 4)
    registerCatalog()
    root
  }

  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.txr", classOf[TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.txr.base", base)
  }

  private def appendRange(root: String, lo: Long, hi: Long): Unit =
    TxTable.append(spark, root, spark.range(lo, hi).select(
      col("id").as("k"), (col("id") * 10).cast("double").as("v")),
      nFiles = 1)

  private def runStream(table: String, sinkName: String,
      options: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.table(s"txr.$table").writeStream.format("memory")
      .queryName(sinkName).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
  }

  /** Checkpointed drain to a parquet dir (the memory sink cannot
    * recover from a checkpoint — restart tests need a durable sink). */
  private def drainToParquet(table: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.table(s"txr.$table").writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
  }

  test("first batch is the full MOR snapshot; appends tail per commit") {
    val root = fresh("snap")
    TxTable.deleteMor(spark, root, 90L, 100L) // v1: tombstones
    appendRange(root, 101L, 111L)             // v2: append
    runStream("snap", "txread_snap")
    // snapshot (1..89 after MOR) + the appended 101..110
    val got = spark.table("txread_snap").select("k")
      .collect().map(_.getLong(0)).sorted
    got shouldBe ((1L to 89L) ++ (101L to 110L)).toArray
  }

  test("restart from checkpoint consumes ONLY new commits (exactly-once)") {
    val root = fresh("restart")
    val ckpt = s"$base/restart_ckpt"
    val out = s"$base/restart_out"
    Seq(ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    drainToParquet("restart", out, ckpt)
    spark.read.parquet(out).count() shouldBe 100L
    appendRange(root, 200L, 210L) // v1 after the first drain
    appendRange(root, 300L, 305L) // v2
    drainToParquet("restart", out, ckpt)
    // the resumed run appended exactly the two new commits' rows —
    // offsets resumed from the checkpoint, the snapshot never replayed
    val got = spark.read.parquet(out).select("k")
      .collect().map(_.getLong(0)).sorted
    got shouldBe ((1L to 100L) ++ (200L until 210L) ++
      (300L until 305L)).toArray
  }

  test("a change commit fails the stream loudly by default") {
    val root = fresh("chg")
    val ckpt = s"$base/chg_ckpt"
    val out = s"$base/chg_out"
    Seq(ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    drainToParquet("chg", out, ckpt)
    TxTable.delete(spark, root, 1L, 10L, nFiles = 1) // v1: COW delete
    appendRange(root, 400L, 405L)                    // v2: append after it
    val ex = the[Exception] thrownBy drainToParquet("chg", out, ckpt)
    ex.getMessage should include("skipChangeCommits")
    // with the option, the delete commit is skipped and the append lands
    drainToParquet("chg", out, ckpt,
      options = Map("skipChangeCommits" -> "true"))
    val got = spark.read.parquet(out).select("k")
      .collect().map(_.getLong(0)).sorted
    got shouldBe ((1L to 100L) ++ (400L until 405L)).toArray
  }

  test("startingVersion tails from a version with no initial snapshot") {
    val root = fresh("tail")
    appendRange(root, 500L, 510L) // v1
    appendRange(root, 600L, 603L) // v2
    runStream("tail", "txread_tail",
      options = Map("startingVersion" -> "1"))
    // only commits AFTER v1: the v2 rows
    spark.table("txread_tail").select("k").collect().map(_.getLong(0))
      .sorted shouldBe (600L until 603L).toArray
  }

  test("real readStream.table run equals the oracled q_tx_read_stream rows") {
    val sfDir = "/root/testdata/sf0.001"
    val root = graft.ops.Transact.ensureRBuilt(spark, sfDir)
    spark.conf.set("spark.sql.catalog.tx", classOf[TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.tx.base", "/tmp")
    val q = spark.readStream.table(s"tx.`${root.stripPrefix("/tmp/")}`")
      .writeStream.format("memory").queryName("txread_entry")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
    val got = spark.table("txread_entry").orderBy("okey")
      .collect().map(_.toSeq)
    val want = graft.ops.Transact.qTxReadStream(spark, sfDir)
      .collect().map(_.toSeq)
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) => g shouldBe w }
  }

  test("resuming below the vacuum retention floor fails with the vacuum named") {
    val root = fresh("vac")
    val ckpt = s"$base/vac_ckpt"
    val out = s"$base/vac_out"
    Seq(ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    drainToParquet("vac", out, ckpt) // checkpoint at v0
    appendRange(root, 900L, 905L)    // v1: its files will be reclaimed
    TxTable.compact(spark, root, nFiles = 2) // v2: rewrite (change commit)
    TxTable.vacuum(root, retainFrom = 2L, minAgeMs = 0L)
    // the lagging stream must fail at the floor gate, naming the
    // vacuum — never a raw file-not-found from a reclaimed append
    val ex = the[Exception] thrownBy drainToParquet("vac", out, ckpt,
      options = Map("skipChangeCommits" -> "true"))
    ex.getMessage should include("retention floor")
  }

  test("schema evolution mid-stream: meta commit skipped, wider files project down") {
    val root = fresh("evolve")
    // drive the Source API directly: the source is created (capturing
    // the NARROW schema) BEFORE the evolution lands — the true
    // mid-stream case a query-restart test cannot reach, because a
    // restarted query re-captures the widened schema
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val src = new graft.io.TxAppendSourceProvider()
      .createSource(spark.sqlContext, s"$base/evolve_meta", None,
        "tx-append", Map("root" -> root, "startingVersion" -> "0"))
      .asInstanceOf[org.apache.spark.sql.execution.streaming.Source
        with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    src.schema.fieldNames shouldBe Array("k", "v")
    TxTable.evolveSchema(root, Seq(
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType))) // v1: meta-only
    TxTable.append(spark, root, spark.range(700, 705).select(
      col("id").as("k"), (col("id") * 10).cast("double").as("v"),
      lit("wide").as("tag")), nFiles = 1)         // v2: wider append
    val end = src.latestOffset(LongOffset(0L), ReadLimit.allAvailable())
    end.asInstanceOf[LongOffset].offset shouldBe 2L
    val df = src.getBatch(Some(LongOffset(0L)), LongOffset(2L))
    // the stream keeps its creation-time schema (k, v); the meta-only
    // commit contributes no rows; the wider files project down
    df.schema.fieldNames shouldBe Array("k", "v")
    val batch = org.apache.spark.sql.GraftStreamingShim.unwrapStreamingBatch(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], df)
    batch.select("k").collect().map(_.getLong(0)).sorted shouldBe
      (700L until 705L).toArray
  }
}
