package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Column-id mapping (the Iceberg idiom): RENAME/DROP COLUMN are
  * metadata-only commits — files keep their stored (phys) names
  * forever; readers re-label, writers translate back, time travel
  * below the change replays the old meta, and a dropped-then-re-added
  * name reads NULL (fresh phys) rather than resurrecting stale
  * bytes. Every write path (append, COW delete/update, merge,
  * optimize, compact, overwrite) must round-trip through an active
  * mapping. */
class TxColumnMapSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val base = s"/tmp/graft_txcolmap_p${ProcessHandle.current.pid}"

  private def fresh(name: String, n: Long = 100L): String = {
    val root = s"$base/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, n + 1).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v"),
        concat(lit("s"), col("id")).as("tag")),
      "k", nFiles = 4)
    root
  }

  test("RENAME is metadata-only: same files, data under the new name") {
    val root = fresh("rename_basic")
    val filesBefore = TxTable.snapshot(root).files.map(_.path).toSet
    TxTable.renameColumn(root, "v", "value")
    val s = TxTable.snapshot(root)
    s.files.map(_.path).toSet shouldBe filesBefore // zero rewrites
    s.schema.fieldNames shouldBe Array("k", "value", "tag")
    s.mappingActive shouldBe true
    s.physOf("value") shouldBe "v"
    TxTable.read(spark, root).filter(col("k") === 7)
      .select("value").head.getDouble(0) shouldBe 70.0
    // time travel below the rename sees the OLD schema
    TxTable.read(spark, root, Some(0L)).schema.fieldNames shouldBe
      Array("k", "v", "tag")
    TxTable.read(spark, root, Some(0L)).filter(col("k") === 7)
      .select("v").head.getDouble(0) shouldBe 70.0
  }

  test("cluster-key rename: key follows, pruning and DML still work") {
    val root = fresh("rename_key")
    TxTable.renameColumn(root, "k", "okey")
    TxTable.snapshot(root).key shouldBe "okey"
    // stats pruning still binds: the key's phys carries minK/maxK —
    // a bounded read opens only the file(s) whose range may contain
    // the bound (may-contain semantics: whole surviving files)
    val pruned = TxTable.read(spark, root, keyLo = Some(90L))
    pruned.count() should be < 100L
    pruned.filter(col("okey") >= 90).count() shouldBe 11
    // DML after the rename: COW delete + update + append round-trip
    TxTable.delete(spark, root, 1L, 10L)
    TxTable.read(spark, root).count() shouldBe 90
    TxTable.updateWhere(spark, root, col("okey") === 50L,
      Seq("v" -> lit(5555.0)))
    TxTable.read(spark, root).filter(col("okey") === 50)
      .select("v").head.getDouble(0) shouldBe 5555.0
    TxTable.append(spark, root,
      spark.range(200, 210).select(col("id").as("okey"),
        lit(0.0).as("v"), lit("x").as("tag")))
    TxTable.read(spark, root).count() shouldBe 100
    // appended rows read back under the logical name
    TxTable.read(spark, root).filter(col("okey") === 205)
      .select("tag").head.getString(0) shouldBe "x"
  }

  test("DROP retires the phys name; re-ADD reads null, not stale bytes") {
    val root = fresh("drop_readd")
    val filesBefore = TxTable.snapshot(root).files.map(_.path).toSet
    TxTable.dropColumn(root, "tag")
    val s1 = TxTable.snapshot(root)
    s1.files.map(_.path).toSet shouldBe filesBefore // metadata-only
    s1.schema.fieldNames shouldBe Array("k", "v")
    s1.retiredPhys shouldBe Seq("tag")
    // travel below the drop still reads the column
    TxTable.read(spark, root, Some(0L)).filter(col("k") === 3)
      .select("tag").head.getString(0) shouldBe "s3"
    // re-ADD the same name: fresh id + non-colliding phys → old files
    // read NULL (never the retired bytes)
    TxTable.evolveSchema(root,
      Seq(org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)))
    val s2 = TxTable.snapshot(root)
    s2.physOf("tag") should not be "tag"
    TxTable.read(spark, root).filter(col("k") === 3)
      .select("tag").head.isNullAt(0) shouldBe true
    // writes to the re-added column land under the fresh phys and
    // read back correctly
    TxTable.updateWhere(spark, root, col("k") === 3L,
      Seq("tag" -> lit("fresh")))
    TxTable.read(spark, root).filter(col("k") === 3)
      .select("tag").head.getString(0) shouldBe "fresh"
  }

  test("merge, optimize and compact round-trip an active mapping") {
    val root = fresh("map_writers")
    TxTable.renameColumn(root, "v", "value")
    // merge through the mapping: update k=1, delete k=2, insert k=500
    import spark.implicits._
    val ch = Seq(
      (1L, "U", -1.0, "u"), (2L, "D", 0.0, ""), (500L, "I", 5000.0, "i"))
      .toDF("k", "action", "c_value", "c_tag")
    TxTable.merge(spark, root, ch)
    val r = TxTable.read(spark, root)
    r.count() shouldBe 100
    r.filter(col("k") === 1).select("value").head.getDouble(0) shouldBe -1.0
    r.filter(col("k") === 500).select("tag").head.getString(0) shouldBe "i"
    // optimize (z-order over the RENAMED column) and compact keep both
    // the mapping and the content
    TxTable.optimize(spark, root, Seq("value"))
    TxTable.compact(spark, root)
    val s = TxTable.snapshot(root)
    s.mappingActive shouldBe true
    s.statsCols shouldBe Seq("value")
    val r2 = TxTable.read(spark, root)
    r2.count() shouldBe 100
    r2.filter(col("k") === 1).select("value").head.getDouble(0) shouldBe -1.0
    // stats collected post-rename are phys-keyed → SQL-pushed filters
    // on the logical name still prune through TxFileIndex
    graft.io.TxRelation.read(spark, root)
      .filter(col("value") === -1.0).count() shouldBe 1
  }

  test("SQL surface: ALTER RENAME/DROP, reads, DML, travel below") {
    val root = fresh("sql_map")
    spark.conf.set("spark.sql.catalog.txm",
      classOf[graft.io.TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.txm.base", base)
    spark.sql("ALTER TABLE txm.sql_map RENAME COLUMN v TO price")
    spark.sql("SELECT price FROM txm.sql_map WHERE k = 7")
      .head.getDouble(0) shouldBe 70.0
    spark.sql("SELECT v FROM txm.sql_map VERSION AS OF 0 WHERE k = 7")
      .head.getDouble(0) shouldBe 70.0
    spark.sql("UPDATE txm.sql_map SET price = 1.5 WHERE k = 9")
    spark.sql("SELECT price FROM txm.sql_map WHERE k = 9")
      .head.getDouble(0) shouldBe 1.5
    spark.sql("ALTER TABLE txm.sql_map DROP COLUMN tag")
    spark.sql("SELECT * FROM txm.sql_map").schema.fieldNames shouldBe
      Array("k", "price")
    // the metadata count rewrite stays exact through the mapping
    spark.sql("SELECT count(*) AS n FROM txm.sql_map")
      .head.getLong(0) shouldBe 100L
  }

  test("nested struct-field ALTER refuses loudly, naming the workaround") {
    val root = s"$base/nested_refuse"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"),
        struct(col("id").as("x"), (col("id") * 2).as("y")).as("s")),
      "k", nFiles = 2)
    spark.conf.set("spark.sql.catalog.txn0",
      classOf[graft.io.TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.txn0.base", base)
    // the first schema refactor on a struct-bearing table: must not
    // half-work (a mapped nested rename would need per-file struct
    // re-projection the column-id mapping doesn't model) — the refusal
    // names the explicit rewrite path instead
    val r = intercept[Exception] {
      spark.sql("ALTER TABLE txn0.nested_refuse RENAME COLUMN s.x TO z")
    }
    r.getMessage should include("nested field 's.x'")
    r.getMessage should include("INSERT ... SELECT")
    val d = intercept[Exception] {
      spark.sql("ALTER TABLE txn0.nested_refuse DROP COLUMN s.y")
    }
    d.getMessage should include("nested field 's.y'")
    // the table is untouched by the refused changes
    TxTable.snapshot(root).schema.fieldNames shouldBe Array("k", "s")
    spark.sql("SELECT s.x FROM txn0.nested_refuse WHERE k = 3")
      .head.getLong(0) shouldBe 3L
    // and the documented workaround actually works: rebuild the struct
    // explicitly into a new table (the CTAS shape — a schema change
    // this deep deserves a new v0, not an in-place mutation)
    val root2 = s"$base/nested_rebuilt"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root2))
    TxTable.create(spark, root2,
      graft.io.TxRelation.read(spark, root).select(col("k"),
        struct(col("s.x").as("z"), col("s.y")).as("s")),
      "k", nFiles = 2)
    spark.sql("SELECT s.z FROM txn0.nested_rebuilt WHERE k = 3")
      .head.getLong(0) shouldBe 3L
  }

  test("append stream reads a renamed table under phys names") {
    val root = fresh("stream_map", n = 10L)
    TxTable.renameColumn(root, "v", "value")
    TxTable.append(spark, root,
      spark.range(11, 21).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("value"),
        lit("late").as("tag")))
    val q = spark.readStream.format("tx-append").option("root", root)
      .load().groupBy().agg(count(lit(1)).as("n"), sum("value").as("s"))
      .writeStream.format("memory").queryName("txmap_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) shouldBe true
    val row = spark.table("txmap_stream").head
    row.getLong(0) shouldBe 20L
    row.getDouble(1) shouldBe (1 to 20).map(_ * 10.0).sum
  }
}
