package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Pins the STREAMING change-feed source (graft.io.TxCdfStream): a real
  * `readStream.format("tx-cdf")` run must equal the batch CDF per
  * commit range — per-commit micro-batches under admission control,
  * AvailableNow draining to the start-time snapshot, checkpoint-resumed
  * restarts consuming ONLY new commits, and wide admission windows
  * still stamping every row with its own commit (per-commit
  * decomposition inside the batch). Also the streaming twin of
  * DailyLoopSpec's consumption loop: the feed's per-batch rows drive a
  * foreachBatch consumer and reconstruct the table. */
class TxCdfStreamSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_cdfstream_p${ProcessHandle.current.pid}/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    r
  }

  /** 100 rows keys 1..100 at v0, then MOR delete (v1), COW delete (v2),
    * append (v3). */
  private def history(root: String): Unit = {
    TxTable.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v"), lit("seed").as("tag")),
      "k", nFiles = 4)
    TxTable.deleteMor(spark, root, 30L, 40L)            // v1: dv only
    TxTable.delete(spark, root, 45L, 50L, nFiles = 1)   // v2: COW rewrite
    TxTable.append(spark, root, spark.range(200, 220).select(
      col("id").as("k"), (col("id") * 10).cast("double").as("v"),
      lit("a1").as("tag")), nFiles = 1)                 // v3: append
  }

  /** The batch truth: union of per-commit diffs, stamped commit_v. */
  private def batchFeed(root: String, fromV: Long, toV: Long,
      step: Long = 1L) =
    (fromV until toV by step).map { v =>
      val hi = math.min(v + step, toV)
      TxTable.changes(spark, root, v, hi).withColumn("commit_v", lit(hi))
    }.reduce(_.unionByName(_))
      .orderBy("commit_v", "k", "change_type")
      .collect().map(_.toSeq)

  private def runStream(root: String, sinkName: String,
      options: Map[String, String] = Map.empty,
      checkpoint: Option[String] = None): Unit = {
    var reader = spark.readStream.format("tx-cdf").option("root", root)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    var writer = reader.load().writeStream.format("memory")
      .queryName(sinkName).trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => writer = writer.option("checkpointLocation", c))
    val q = writer.start()
    q.awaitTermination(120000) shouldBe true
  }

  test("AvailableNow drain equals the batch CDF, commit by commit") {
    val root = freshRoot("drain")
    history(root)
    runStream(root, "cdf_drain")
    val got = spark.table("cdf_drain")
      .orderBy("commit_v", "k", "change_type").collect().map(_.toSeq)
    val want = batchFeed(root, 0L, 3L)
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) => g shouldBe w }
    // per-commit decomposition really happened: v1 (dv-only) and v2
    // (COW) each stamped with their own commit
    val byV = spark.table("cdf_drain").groupBy("commit_v").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byV(1L) shouldBe 11L // MOR deletes 30..40
    byV(2L) shouldBe 6L  // COW deletes 45..50
    byV(3L) shouldBe 20L // appended inserts
  }

  test("checkpointed restart consumes ONLY commits after the last offset") {
    val root = freshRoot("restart")
    history(root)
    val ckpt = s"$root/_stream_ckpt"
    val out = s"$root/_stream_out"
    def drainToParquet(): Unit = {
      val q = spark.readStream.format("tx-cdf").option("root", root).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000) shouldBe true
    }
    drainToParquet()
    spark.read.parquet(out).count() shouldBe 37L // 11 + 6 + 20
    // new commit AFTER the first drain
    TxTable.deleteMor(spark, root, 60L, 64L) // v4: 5 deletes
    drainToParquet()
    // the restarted query appended ONLY commit 4's rows — offsets
    // resumed from the checkpoint, nothing replayed
    val all = spark.read.parquet(out)
    all.count() shouldBe 42L
    val got = all.filter(col("commit_v") === 4L).collect()
    got.length shouldBe 5
    got.map(_.getAs[String]("change_type")).distinct shouldBe Array("delete")
    got.map(_.getAs[Long]("k")).sorted shouldBe (60L to 64L).toArray
  }

  test("from-scratch replay across a RENAME carries pre-rename data, not NULLs") {
    // r19 advice (medium): slices read under THEIR version's logical
    // names; a name-keyed alignment silently NULLed a renamed column's
    // data for every pre-rename commit on a checkpoint-loss replay.
    // Alignment is now by column id: old-name slices surface under the
    // head name with their data intact.
    val root = freshRoot("rename_replay")
    TxTable.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"), lit("seed").as("tag")),
      "k", nFiles = 1)                                   // v0 (not streamed)
    TxTable.append(spark, root, spark.range(11, 16).select(
      col("id").as("k"), lit("pre").as("tag")), nFiles = 1)  // v1: old name
    TxTable.renameColumn(root, "tag", "label")               // v2: meta-only
    TxTable.append(spark, root, spark.range(16, 21).select(
      col("id").as("k"), lit("post").as("label")), nFiles = 1) // v3: new name
    runStream(root, "cdf_rename") // fresh source+sink = checkpoint loss
    val t = spark.table("cdf_rename")
    t.columns should contain("label")
    val byV = t.select("commit_v", "label").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).distinct)
    byV(1L) shouldBe Array("pre")   // the fix: data, not null
    byV(3L) shouldBe Array("post")
  }

  test("maxVersionsPerBatch>1 still stamps each row with ITS OWN commit") {
    val root = freshRoot("ranged")
    history(root)
    runStream(root, "cdf_wide", Map("maxVersionsPerBatch" -> "2"))
    val got = spark.table("cdf_wide")
      .orderBy("commit_v", "k", "change_type").collect().map(_.toSeq)
    // batches are (0,2] and (2,3] — but rows inside the wide first
    // batch are decomposed per commit (v1's dv deletes stamped 1, v2's
    // COW deletes stamped 2), never misattributed to the range end
    // (the r11-advice fix), so the drain equals the step=1 batch truth
    // exactly
    val want = batchFeed(root, 0L, 3L)
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) => g shouldBe w }
  }

  test("startingVersion skips earlier commits") {
    val root = freshRoot("startv")
    history(root)
    runStream(root, "cdf_late", Map("startingVersion" -> "2"))
    val got = spark.table("cdf_late").collect()
    got.map(_.getAs[Long]("commit_v")).distinct shouldBe Array(3L)
    got.length shouldBe 20
  }

  test("foreachBatch consumer reconstructs the table from the feed") {
    val root = freshRoot("consume")
    history(root)
    // streaming DailyLoop shape: start from the v0 snapshot, apply each
    // micro-batch's deletes/inserts/updates in commit order
    val state = scala.collection.mutable.Map[Long, (Double, String)]()
    TxTable.read(spark, root, Some(0L)).collect().foreach { r =>
      state(r.getAs[Long]("k")) =
        (r.getAs[Double]("v"), r.getAs[String]("tag"))
    }
    val q = spark.readStream.format("tx-cdf").option("root", root).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        batch.orderBy("commit_v").collect().foreach { r =>
          val k = r.getAs[Long]("k")
          r.getAs[String]("change_type") match {
            case "delete" => state.remove(k)
            case "insert" | "update_post" =>
              state(k) = (r.getAs[Double]("v"), r.getAs[String]("tag"))
            case "update_pre" => ()
          }
        }
        ()
      }.start()
    q.awaitTermination(120000) shouldBe true
    val want = TxTable.read(spark, root).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Double]("v"), r.getAs[String]("tag"))).toMap
    state.toMap shouldBe want
  }

  test("non-leading cluster key: feed columns bind by NAME, not position") {
    // changes() emits key-first while the source schema keeps the
    // table's declared order — a positional RDD binding would silently
    // swap slots on any table whose key is not the first column
    val root = freshRoot("keyorder")
    TxTable.create(spark, root,
      spark.range(1, 51).select(lit("t").as("tag"),
        (col("id") * 10).cast("double").as("v"), col("id").as("k")),
      "k", nFiles = 2)
    TxTable.deleteMor(spark, root, 10L, 14L)
    runStream(root, "cdf_keyorder")
    val got = spark.table("cdf_keyorder").orderBy("k").collect()
    got.length shouldBe 5
    got.map(_.getAs[Long]("k")).sorted shouldBe (10L to 14L).toArray
    got.map(_.getAs[Double]("v")).sorted shouldBe
      (10L to 14L).map(_ * 10.0).toArray
    got.map(_.getAs[String]("tag")).distinct shouldBe Array("t")
  }

  test("the oracled q_tx_cdf_stream entry IS the stream's output") {
    // the batch-parity entry over the Transact history must equal a
    // real stream drain over the same table — the oracle thereby gates
    // the streaming source's content
    val sf = TestSpark.sf
    val entry = SparkEntry.queries("q_tx_cdf_stream")(spark, sf)
      .collect().map(_.toSeq)
    val root = ops.Transact.ensureBuilt(spark, sf)
    runStream(root, "cdf_entry")
    val got = spark.table("cdf_entry")
      .orderBy("commit_v", "okey", "change_type").collect().map(_.toSeq)
    got.length shouldBe entry.length
    got.zip(entry).foreach { case (g, w) => g shouldBe w }
  }
}
