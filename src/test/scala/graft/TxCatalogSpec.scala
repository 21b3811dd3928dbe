package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxCatalog, TxTable}

/** Pins the SQL/catalog surface of the tx tier ([[graft.io.TxCatalog]]):
  * identifier resolution, snapshot pinning, `VERSION AS OF` /
  * `TIMESTAMP AS OF` time travel, merge-on-read correctness through
  * SQL text, `INSERT INTO` appends, `INSERT OVERWRITE` atomic replace,
  * `ALTER TABLE ADD COLUMNS` meta-only widening, file pruning via the analyzer
  * conversion ([[graft.plans.TxCatalogReads]] — the plan must be the
  * native TxFileIndex scan, not the V1 fallback), the metadata-only
  * count rewrite firing on SQL text, and catalog DDL surface
  * (EXISTS/SHOW/DROP). */
class TxCatalogSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val base = s"/tmp/graft_txcat_p${ProcessHandle.current.pid}"

  private def freshTable(name: String, n: Long = 100L): String = {
    val root = s"$base/$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, n + 1).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("v")),
      "k", nFiles = 4)
    name
  }

  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.txt", classOf[TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.txt.base", base)
  }

  test("bare SELECT resolves the latest snapshot; VERSION AS OF travels") {
    val t = freshTable("sql_basic")
    registerCatalog()
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 100L
    TxTable.delete(spark, spark.conf.get(s"spark.sql.catalog.txt.base") +
      s"/$t", 1L, 10L) // v1: COW delete
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 90L
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 0")
      .head.getLong(0) shouldBe 100L
    spark.sql(s"SELECT sum(k) AS s FROM txt.$t VERSION AS OF 1")
      .head.getLong(0) shouldBe (11L to 100L).sum
  }

  test("TIMESTAMP AS OF resolves by commit publish time") {
    val t = freshTable("sql_ts")
    val root = s"$base/$t"
    registerCatalog()
    // commit v1 two seconds later so the mtimes are separable
    Thread.sleep(1100)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    TxTable.delete(spark, root, 1L, 50L)
    spark.sql(
      s"SELECT count(*) AS n FROM txt.$t TIMESTAMP AS OF '$between'")
      .head.getLong(0) shouldBe 100L // resolves to v0
    val after = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    spark.sql(
      s"SELECT count(*) AS n FROM txt.$t TIMESTAMP AS OF '$after'")
      .head.getLong(0) shouldBe 50L // resolves to v1
    // before the first commit: loud failure, not a silent empty table
    val early = new java.sql.Timestamp(1000L)
    an[Exception] should be thrownBy spark.sql(
      s"SELECT count(*) FROM txt.$t TIMESTAMP AS OF '$early'").collect()
  }

  test("SQL reads subtract deletion vectors (merge-on-read via text)") {
    val t = freshTable("sql_mor")
    registerCatalog()
    TxTable.deleteMor(spark, s"$base/$t", 30L, 40L)
    val got = spark.sql(s"SELECT k FROM txt.$t WHERE k BETWEEN 25 AND 45")
      .collect().map(_.getLong(0)).sorted
    got shouldBe ((25L to 29L) ++ (41L to 45L)).toArray
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 89L
  }

  test("SQL text goes through the native stats-pruning file plan") {
    val t = freshTable("sql_prune")
    registerCatalog()
    val df = spark.sql(s"SELECT k, v FROM txt.$t WHERE k BETWEEN 1 AND 5")
    // the TxCatalogReads conversion swaps the DSv2 relation for the
    // HadoopFsRelation over TxFileIndex — visible in the plan text…
    df.queryExecution.executedPlan.toString should include("TxFileIndex")
    // …and the pushed conjuncts prune: 4 range-clustered files over
    // keys 1..100, a k≤5 predicate must open exactly 1
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scans should have size 1
    scans.head.metadata("Location") should include("TxFileIndex")
    df.collect().map(_.getLong(0)).sorted shouldBe (1L to 5L).toArray
    scans.head.metrics("numFiles").value shouldBe 1L
  }

  test("bare count(*) over SQL text collapses to manifest metadata") {
    val t = freshTable("sql_metacount")
    registerCatalog()
    val df = spark.sql(s"SELECT count(*) AS n FROM txt.$t")
    // TxMetadataCount folds the scan away entirely — no file source
    df.queryExecution.optimizedPlan.collectLeaves().foreach { leaf =>
      leaf.getClass.getSimpleName should include("LocalRelation")
    }
    df.head.getLong(0) shouldBe 100L
  }

  test("INSERT INTO appends through the atomic commit path") {
    val t = freshTable("sql_insert")
    registerCatalog()
    spark.sql(s"INSERT INTO txt.$t SELECT id AS k, CAST(id AS DOUBLE) AS v " +
      "FROM range(101, 111)")
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 110L
    // the insert was a real commit: v1 exists and v0 is still intact
    TxTable.versions(s"$base/$t") shouldBe Seq(0L, 1L)
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 0")
      .head.getLong(0) shouldBe 100L
    // inserted rows carried their values
    spark.sql(s"SELECT v FROM txt.$t WHERE k = 105").head.getDouble(0) shouldBe 105.0
  }

  test("DELETE FROM via SQL: dv-only commit, zero data files rewritten") {
    val t = freshTable("sql_delete")
    registerCatalog()
    val filesBefore = TxTable.snapshot(s"$base/$t").files.map(_.path).toSet
    spark.sql(s"DELETE FROM txt.$t WHERE v >= 200.0 AND v < 300.0") // k 20..29
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 90L
    spark.sql(s"SELECT count(*) AS n FROM txt.$t WHERE k BETWEEN 20 AND 29")
      .head.getLong(0) shouldBe 0L
    val s = TxTable.snapshot(s"$base/$t")
    s.files.map(_.path).toSet shouldBe filesBefore // merge-on-read: dv only
    s.dvs.map(_.rows).sum shouldBe 10L
    TxTable.countRows(s"$base/$t") shouldBe 90L
    // time travel still sees the pre-delete content
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 0")
      .head.getLong(0) shouldBe 100L
    // an untranslatable condition fails loudly, never a silent fallback
    an[Exception] should be thrownBy
      spark.sql(s"DELETE FROM txt.$t WHERE k % 2 = 0")
  }

  test("UPDATE via SQL: copy-on-write, old-row semantics, key not assignable") {
    val t = "sql_update"
    val root = s"$base/$t"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    TxTable.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        (col("id") * 10).cast("double").as("a"),
        (col("id") * 100).cast("double").as("b")),
      "k", nFiles = 4)
    registerCatalog()
    val filesBefore = TxTable.snapshot(root).files.map(_.path).toSet
    // simultaneous swap: both assignments must see PRE-update values
    spark.sql(s"UPDATE txt.$t SET a = b, b = a WHERE k BETWEEN 10 AND 19")
    val got = spark.sql(s"SELECT a, b FROM txt.$t WHERE k = 12").head
    got.getDouble(0) shouldBe 1200.0 // a took old b
    got.getDouble(1) shouldBe 120.0  // b took old a — not the new a
    // untouched rows untouched
    val other = spark.sql(s"SELECT a, b FROM txt.$t WHERE k = 50").head
    other.getDouble(0) shouldBe 500.0
    other.getDouble(1) shouldBe 5000.0
    // copy-on-write rewrote ONLY the file whose range holds 10..19
    val s = TxTable.snapshot(root)
    (filesBefore -- s.files.map(_.path).toSet).size shouldBe 1
    // time travel to the pre-update version still byte-reconstructs
    spark.sql(s"SELECT a FROM txt.$t VERSION AS OF 0 WHERE k = 12")
      .head.getDouble(0) shouldBe 120.0
    // a no-match predicate is a version-preserving no-op
    val v = TxTable.versions(root).max
    spark.sql(s"UPDATE txt.$t SET a = 0.0 WHERE k > 10000")
    TxTable.versions(root).max shouldBe v
    // the cluster key is identity, not assignable
    val ex = the[Exception] thrownBy
      spark.sql(s"UPDATE txt.$t SET k = 0 WHERE k = 1")
    ex.getMessage should include("not assignable")
  }

  test("MERGE INTO via SQL: upsert + conditional delete, one COW commit") {
    val t = freshTable("sql_merge") // keys 1..100, v = k*10
    registerCatalog()
    // source: updates keys 1..10 (v = -1), deletes evens of 11..20,
    // inserts fresh keys 201..205
    spark.range(1, 21).select(col("id").as("sk"),
      lit(-1.0).as("sv"))
      .unionByName(spark.range(201, 206).select(col("id").as("sk"),
        (col("id") * 10).cast("double").as("sv")))
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING merge_src AS s ON tgt.k = s.sk
         |WHEN MATCHED AND s.sk > 10 AND s.sk % 2 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.sv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.sk, s.sv)
         |""".stripMargin)
    val r = spark.sql(s"SELECT k, v FROM txt.$t ORDER BY k").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.size shouldBe (100 - 5 + 5) // 5 even keys 12..20 deleted, 5 inserted
    (1L to 10L).foreach(k => r(k) shouldBe -1.0)     // matched update
    Seq(12L, 14L, 16L, 18L, 20L).foreach(k => r.contains(k) shouldBe false)
    Seq(11L, 13L, 15L, 17L, 19L).foreach(k => r(k) shouldBe -1.0) // odd: update
    (21L to 100L).foreach(k => r(k) shouldBe k * 10.0) // untouched
    (201L to 205L).foreach(k => r(k) shouldBe k * 10.0) // inserted
    // one commit for the whole statement; time travel sees the pre-state
    TxTable.versions(s"$base/$t") shouldBe Seq(0L, 1L)
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 0")
      .head.getLong(0) shouldBe 100L
    // target-side references are refused loudly, not silently wrong
    val ex = the[Exception] thrownBy spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING merge_src AS s ON tgt.k = s.sk
         |WHEN MATCHED AND tgt.v < 50 THEN UPDATE SET v = s.sv
         |""".stripMargin)
    ex.getMessage should include("target columns")
  }

  test("MERGE full surface: partial UPDATE, partial INSERT, NOT MATCHED BY SOURCE") {
    val t = freshTable("sql_merge_full") // keys 1..100, v = k*10
    registerCatalog()
    spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (tag STRING)")
    spark.range(1, 11).select(col("id").as("sk"), lit(-1.0).as("sv"))
      .unionByName(spark.range(201, 203).select(col("id").as("sk"),
        (col("id") * 10).cast("double").as("sv")))
      .createOrReplaceTempView("mf_src")
    spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING mf_src AS s ON tgt.k = s.sk
         |WHEN MATCHED THEN UPDATE SET tag = 'upd'
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.sk, s.sv)
         |WHEN NOT MATCHED BY SOURCE AND tgt.k <= 20 THEN UPDATE
         |  SET tag = 'aged'
         |""".stripMargin)
    val r = spark.sql(s"SELECT k, v, tag FROM txt.$t ORDER BY k").collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getString(2)))).toMap
    r.size shouldBe 102
    // partial matched UPDATE: v carried, tag set
    (1L to 10L).foreach(k => r(k) shouldBe ((k * 10.0, "upd")))
    // partial INSERT: tag gets the ANSI null
    (201L to 202L).foreach(k => r(k) shouldBe ((k * 10.0, null)))
    // by-source UPDATE only where its condition held
    (11L to 20L).foreach(k => r(k) shouldBe ((k * 10.0, "aged")))
    (21L to 100L).foreach(k => r(k) shouldBe ((k * 10.0, null)))

    // NOT MATCHED BY SOURCE DELETE: drop the never-tagged tail
    spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING mf_src AS s ON tgt.k = s.sk
         |WHEN NOT MATCHED BY SOURCE AND tgt.tag IS NULL AND tgt.k <= 100
         |  THEN DELETE
         |""".stripMargin)
    val keys = spark.sql(s"SELECT k FROM txt.$t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    keys shouldBe ((1L to 20L) ++ Seq(201L, 202L))

    // refusals: key assignment in UPDATE; INSERT key not the ON expr;
    // by-source expressions referencing source columns
    val ex1 = the[Exception] thrownBy spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING mf_src AS s ON tgt.k = s.sk
         |WHEN MATCHED THEN UPDATE SET k = s.sk + 1
         |""".stripMargin)
    ex1.getMessage should include("may not assign the cluster key")
    val ex2 = the[Exception] thrownBy spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING mf_src AS s ON tgt.k = s.sk
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.sk + 1, s.sv)
         |""".stripMargin)
    ex2.getMessage should include("ON clause's")
    val ex3 = the[Exception] thrownBy spark.sql(
      s"""MERGE INTO txt.$t AS tgt USING mf_src AS s ON tgt.k = s.sk
         |WHEN NOT MATCHED BY SOURCE AND s.sv < 0 THEN DELETE
         |""".stripMargin)
    ex3.getMessage should (include("source columns")
      or include("cannot resolve") or include("UNRESOLVED"))
  }

  test("CREATE TABLE and CTAS via SQL; cluster_key required") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS txt.sql_create")
    spark.sql("DROP TABLE IF EXISTS txt.sql_ctas")
    // plain CREATE: empty v0, readable, then INSERT lands as v1
    spark.sql("CREATE TABLE txt.sql_create (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('cluster_key'='k')")
    spark.sql("SELECT count(*) AS n FROM txt.sql_create")
      .head.getLong(0) shouldBe 0L
    spark.sql("INSERT INTO txt.sql_create " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(1, 11)")
    spark.sql("SELECT count(*) AS n FROM txt.sql_create")
      .head.getLong(0) shouldBe 10L
    TxTable.versions(s"$base/sql_create") shouldBe Seq(0L, 1L)
    TxTable.snapshot(s"$base/sql_create").key shouldBe "k"
    // CTAS: create-empty + first append, one statement
    spark.sql("CREATE TABLE txt.sql_ctas TBLPROPERTIES ('cluster_key'='k') " +
      "AS SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(1, 101)")
    spark.sql("SELECT count(*) AS n FROM txt.sql_ctas")
      .head.getLong(0) shouldBe 100L
    spark.sql("SELECT v FROM txt.sql_ctas WHERE k = 7").head.getDouble(0) shouldBe 14.0
    // the created table is a REAL tx table: DML + time travel work
    spark.sql("DELETE FROM txt.sql_ctas WHERE k <= 50")
    spark.sql("SELECT count(*) AS n FROM txt.sql_ctas")
      .head.getLong(0) shouldBe 50L
    // cluster_key is required, never defaulted
    val ex = the[Exception] thrownBy
      spark.sql("CREATE TABLE txt.sql_nokey (k BIGINT)")
    ex.getMessage should include("cluster_key")
  }

  test("ALTER TABLE ADD COLUMNS: meta-only widening, old rows null") {
    val t = freshTable("sql_alter")
    registerCatalog()
    val filesBefore = TxTable.snapshot(s"$base/$t").files.map(_.path).toSet
    spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (note STRING, w DOUBLE)")
    // metadata-only: same data files, one new version
    val s = TxTable.snapshot(s"$base/$t")
    s.files.map(_.path).toSet shouldBe filesBefore
    TxTable.versions(s"$base/$t") shouldBe Seq(0L, 1L)
    s.schema.fieldNames shouldBe Array("k", "v", "note", "w")
    // pre-evolution rows project through the widened schema as null
    val r0 = spark.sql(s"SELECT note, w FROM txt.$t WHERE k = 1").head
    r0.isNullAt(0) shouldBe true
    r0.isNullAt(1) shouldBe true
    // new appends carry the columns; old and new coexist in one scan
    spark.sql(s"INSERT INTO txt.$t VALUES (101, 1010.0, 'fresh', 2.5)")
    val r1 = spark.sql(s"SELECT note, w FROM txt.$t WHERE k = 101").head
    r1.getString(0) shouldBe "fresh"
    r1.getDouble(1) shouldBe 2.5
    spark.sql(s"SELECT count(*) AS n FROM txt.$t WHERE note IS NULL")
      .head.getLong(0) shouldBe 100L
    // time travel below the evolution still sees the NARROW schema
    spark.sql(s"SELECT * FROM txt.$t VERSION AS OF 0").columns shouldBe
      Array("k", "v")
    // re-adding an existing column is loud, never a silent no-op
    an[Exception] should be thrownBy
      spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (v DOUBLE)")
    // RENAME is now supported (column-id mapping, TxColumnMapSpec);
    // unsupported shapes (nested, positions) still fail loudly below
    // NOT NULL adds are refused (pre-evolution rows read null — a
    // non-nullable field would let the optimizer fold IS NULL wrong)
    val exNn = the[Exception] thrownBy
      spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (z DOUBLE NOT NULL)")
    exNn.getMessage should include("NOT NULL")
    // FIRST/AFTER positions are refused, never silently appended at the
    // end (positional INSERTs would re-bind)
    an[Exception] should be thrownBy
      spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (z DOUBLE FIRST)")
  }

  test("INSERT OVERWRITE: single-commit atomic replace, travelable past") {
    val t = freshTable("sql_overwrite")
    registerCatalog()
    TxTable.deleteMor(spark, s"$base/$t", 90L, 100L) // v1: leave tombstones
    spark.sql(s"INSERT OVERWRITE txt.$t " +
      "SELECT id AS k, CAST(id * 3 AS DOUBLE) AS v FROM range(1, 21)")
    // exactly one commit for the whole replace
    TxTable.versions(s"$base/$t") shouldBe Seq(0L, 1L, 2L)
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 20L
    spark.sql(s"SELECT v FROM txt.$t WHERE k = 7").head.getDouble(0) shouldBe 21.0
    // the old tombstones went with the old files — dv set is empty
    val s = TxTable.snapshot(s"$base/$t")
    s.dvs shouldBe empty
    // both pre-overwrite versions still travel
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 0")
      .head.getLong(0) shouldBe 100L
    spark.sql(s"SELECT count(*) AS n FROM txt.$t VERSION AS OF 1")
      .head.getLong(0) shouldBe 89L
  }

  test("t$history metadata table: DESCRIBE HISTORY as queryable SQL") {
    val t = freshTable("sql_hist")
    registerCatalog()
    spark.sql(s"INSERT INTO txt.$t VALUES (101, 1010.0)")     // v1: append
    spark.sql(s"DELETE FROM txt.$t WHERE k <= 5")             // v2: dv only
    spark.sql(s"ALTER TABLE txt.$t ADD COLUMNS (w DOUBLE)")   // v3: meta
    val h = spark.sql(
      s"SELECT version, n_add, n_remove, n_dv, rows_added, schema_change " +
        s"FROM txt.`$t$$history` ORDER BY version").collect()
    h.map(_.getLong(0)) shouldBe Array(0L, 1L, 2L, 3L)
    h(0).getLong(1) shouldBe 4L   // create wrote 4 files
    h(0).getLong(4) shouldBe 100L // seed rows
    h(1).getLong(1) shouldBe 1L   // append added a file
    h(2).getLong(3) shouldBe 1L   // dv-only commit
    h(2).getLong(1) shouldBe 0L
    h(3).getBoolean(5) shouldBe true // ALTER is a schema change
    // metadata tables are read-only: DML fails analysis, never half-works
    an[Exception] should be thrownBy
      spark.sql(s"DELETE FROM txt.`$t$$history` WHERE version = 0")
  }

  test("SQL OPTIMIZE and VACUUM via the parser extension") {
    val t = freshTable("sql_maint")
    registerCatalog()
    spark.sql(s"INSERT INTO txt.$t SELECT id AS k, CAST(id AS DOUBLE) AS v " +
      "FROM range(101, 131)") // v1: more files
    val filesBefore = TxTable.snapshot(s"$base/$t").files.size
    filesBefore should be > 2
    // OPTIMIZE = bin-pack compaction, outcome returned as a row
    val opt = spark.sql(s"OPTIMIZE txt.$t").head
    opt.getLong(0) shouldBe 2L
    opt.getString(1) shouldBe "compact"
    TxTable.snapshot(s"$base/$t").files.size should be < filesBefore
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 130L
    // OPTIMIZE ... ZORDER BY reclusters and declares stats dims
    val z = spark.sql(s"OPTIMIZE txt.$t ZORDER BY (k, v)").head
    z.getLong(0) shouldBe 3L
    z.getString(1) should include("zorder")
    TxTable.snapshot(s"$base/$t").statsCols shouldBe Seq("k", "v")
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 130L
    // VACUUM requires the explicit horizon and reclaims below it
    an[Exception] should be thrownBy spark.sql(s"VACUUM txt.$t")
    // age the files past the in-flight-writer guard (production keeps
    // the 20-minute window; the test just backdates mtimes)
    new java.io.File(s"$base/$t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(_.setLastModified(System.currentTimeMillis() - 30 * 60 * 1000))
    val dead = spark.sql(s"VACUUM txt.$t RETAIN FROM 3").head.getLong(0)
    dead should be > 0L // v0/v1/v2 files unreferenced by v3
    // content intact; travel below the floor is the documented loud fail
    spark.sql(s"SELECT count(*) AS n FROM txt.$t").head.getLong(0) shouldBe 130L
    an[Exception] should be thrownBy
      spark.sql(s"SELECT count(*) FROM txt.$t VERSION AS OF 0").collect()
    // OPTIMIZE against a non-tx catalog is refused loudly
    val ex = the[Exception] thrownBy spark.sql(s"OPTIMIZE spark_catalog.default.x")
    ex.getMessage should include("not a registered tx catalog")
    // a degenerate ZORDER list must not silently demote to compact
    val exZ = the[Exception] thrownBy spark.sql(s"OPTIMIZE txt.$t ZORDER BY (,)")
    exZ.getMessage should include("no columns")
    // single-part identifiers follow the session's current catalog
    val cm = spark.sessionState.catalogManager
    cm.setCurrentCatalog("txt")
    try spark.sql(s"OPTIMIZE $t").head.getLong(0) shouldBe 4L
    finally cm.setCurrentCatalog("spark_catalog")
    // backtick-quoted names the catalog accepts are OPTIMIZE-able too
    spark.sql("DROP TABLE IF EXISTS txt.`my-maint`")
    spark.sql("CREATE TABLE txt.`my-maint` (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('cluster_key'='k')")
    spark.sql("INSERT INTO txt.`my-maint` " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(1, 9)")
    spark.sql("OPTIMIZE txt.`my-maint`").head.getLong(0) shouldBe 2L
    // ordinary SQL still parses through the delegate untouched
    spark.sql("SELECT 1 AS one").head.getInt(0) shouldBe 1
  }

  test("catalog surface: EXISTS, SHOW TABLES, DROP; missing table is loud") {
    val t = freshTable("sql_ddl")
    registerCatalog()
    spark.sql(s"SHOW TABLES IN txt").collect()
      .map(_.getAs[String]("tableName")) should contain(t)
    spark.sql(s"DROP TABLE txt.$t")
    TxTable.versions(s"$base/$t") shouldBe empty
    an[Exception] should be thrownBy
      spark.sql(s"SELECT * FROM txt.$t").collect()
  }

  test("statement pins its snapshot: analyzed plan survives a racing commit") {
    val t = freshTable("sql_pin")
    val root = s"$base/$t"
    registerCatalog()
    val df = spark.sql(s"SELECT count(*) AS n FROM txt.$t WHERE k <= 200")
    TxTable.delete(spark, root, 1L, 50L) // commits AFTER analysis
    // the already-analyzed statement still reads the pinned v0
    df.head.getLong(0) shouldBe 100L
    // a fresh statement sees the new latest
    spark.sql(s"SELECT count(*) AS n FROM txt.$t WHERE k <= 200")
      .head.getLong(0) shouldBe 50L
  }
}
