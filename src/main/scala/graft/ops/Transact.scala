package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Tables, TxRelation, TxTable}

/** Transactional-table queries (SURVEY §2 table-maintenance tier,
  * upgraded): where [[Maintenance.qMergeUpsert]] computes MERGE
  * semantics as a single relational plan, these run the SAME change
  * batch through a real multi-version table ([[graft.io.TxTable]]) —
  * atomic commits, copy-on-write rewrites, time travel, compaction —
  * and put every version's CONTENT under the DuckDB oracle gate:
  *
  *   v0 create  → q_tx_travel   (time travel back past the merge)
  *   v1 merge   → q_tx_merge    (same oracle as q_merge_upsert —
  *                               the format applies changes exactly)
  *   v2 compact → q_tx_compact  (same oracle text as v1 — compaction
  *                               is content-preserving BY THE GATE,
  *                               not by assertion)
  *   v3 delete  → q_tx_delete   (copy-on-write range delete)
  *   v4 MOR del → q_tx_dv       (deletion vector — zero files
  *                               rewritten; latest) + q_tx_meta_count
  *                               (manifest-only count(*) vs a real one)
  *
  * plus, on a second table, q_tx_zorder: the Catalyst FileIndex read
  * path over a Z-ORDERED layout — a plain `.filter` whose pushed
  * conjuncts stats-prune files on both z dimensions, gated on content.
  *
  * The version history is built once per (process, sfDir, data stamp)
  * — the same memo discipline as [[Incremental.buildIndexes]]: pid-
  * scoped root so concurrent Bench/Verify never clobber each other,
  * data-stamped so a driver-side testdata regeneration rebuilds
  * instead of serving a stale table.
  */
object Transact {

  private val built =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private def rootFor(sfDir: String): String =
    "/tmp/graft_txtable_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  private def stamp(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/orders.parquet")
    s"${f.lastModified}:${f.length}"
  }

  /** Reap tx roots left by DEAD processes (the pid suffix makes roots
    * per-process, so crashed/finished Bench/Verify runs leave behind
    * /tmp dirs nobody will reuse). A LIVE pid's root is never touched —
    * concurrent Bench+Verify stay isolated. */
  private def gcStaleRoots(): Unit =
    Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"), "graft_txtable_")

  /** The q_merge_upsert change batch (Maintenance.scala:38) in tx-merge
    * shape: key `k`, action D/U/I, and a full replacement payload
    * `c_<col>` per non-key column — deletes every key ≡0 (mod 10),
    * updates price +1000 on ≡1, inserts a fresh negated key on ≡2. */
  private def changeBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val m = col("o_orderkey") % 10
    Tables.orders(spark, sfDir).filter(m < 3).select(
      when(m === 2, -col("o_orderkey")).otherwise(col("o_orderkey")).as("k"),
      when(m === 0, lit("D")).when(m === 1, lit("U")).otherwise(lit("I"))
        .as("action"),
      when(m === 2, lit("N")).otherwise(col("o_orderstatus")).as("c_status"),
      when(m === 1, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice"))
        .as("c_price"),
      when(m === 2, lit("inserted")).otherwise(lit("updated")).as("c_src"))
  }

  /** Range bound of the v3 copy-on-write delete (mirrored in the
    * q_tx_delete oracle). Narrow on purpose: with the table range-
    * clustered on okey, only the file(s) whose [minK, maxK] overlap
    * [100, 499] are rewritten — TxTableSpec pins that count. */
  private[graft] val DelLo = 100L
  private[graft] val DelHi = 499L

  /** Range bound of the v4 MERGE-ON-READ delete (deletion vector — no
    * data file rewritten at all; TxDvSpec pins that). Mirrored in the
    * q_tx_dv / q_tx_meta_count oracles. Chosen INSIDE the smallest
    * test SF's key range (sf0.001 has okey 0–1499): a range past it
    * (the original 2000–2999) made deleteMor a stats-proven no-op
    * there, so v4 never committed and every per-version query over the
    * history died at tiny SF — the fixture must produce the same
    * version SHAPE at every scale factor, with the oracles
    * interpolating these bounds so content parity is automatic. */
  private[graft] val DvLo = 600L
  private[graft] val DvHi = 899L

  /** Build v0..v3 once per (process, sfDir, data stamp); idempotent
    * across the repeated per-query calls of a Verify/Bench session. */
  private[graft] def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val root = rootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        gcStaleRoots()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          lit("kept").as("src"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8) // v0
        TxTable.merge(spark, root, changeBatch(spark, sfDir)) // v1
        TxTable.compact(spark, root, nFiles = 4)              // v2 + ckpt
        TxTable.delete(spark, root, DelLo, DelHi)             // v3
        TxTable.deleteMor(spark, root, DvLo, DvHi)            // v4 (DV only)
        built.add(key)
      }
    }
    root
  }

  private def at(spark: SparkSession, sfDir: String,
      v: Option[Long]): DataFrame =
    TxTable.read(spark, ensureBuilt(spark, sfDir), v).orderBy("okey")

  // ---------------------- bucketed-tier fixture (q_tx_bucket_compact)

  private def bRootFor(sfDir: String): String =
    "/tmp/graft_txbucket_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** Build-once fixture walking the WHOLE bucketed-tier lifecycle the
    * standing-index tables live on: createBucketed (v0, okey-bucketed
    * ×8) → bucketed append (v1: each batch adds ≤ nBuckets files,
    * placement value-hashed) → MOR range delete (v2, dv-only — COW is
    * refused on this tier) → exactly-once streaming-shaped appendBatch
    * (v3; immediately REPLAYED with the same (appId, batchId) — the
    * txn watermark absorbs it, no v4) → compactBuckets (v4: one file
    * per non-empty bucket, tombstones physically absorbed, BucketSpec
    * and txn watermark preserved). The oracle replays the surviving
    * content from raw orders, so the gate proves the whole chain —
    * including that compaction changed NOTHING — by exact match. */
  private val builtB = scala.collection.mutable.Set[String]()
  private[graft] def ensureBuiltBucketed(spark: SparkSession,
      sfDir: String): String = {
    val root = bRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!builtB.contains(key)) builtB.synchronized {
      if (!builtB.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txbucket_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        def rows(pred: org.apache.spark.sql.Column) =
          Tables.orders(spark, sfDir).filter(pred)
            .select(col("o_orderkey").as("okey"),
              col("o_orderstatus").as("status"),
              col("o_totalprice").as("price"))
        TxTable.createBucketed(spark, root,
          rows(col("o_orderkey") % 4 < 3), "okey", Seq("okey"), 8) // v0
        TxTable.append(spark, root, rows(col("o_orderkey") % 4 === 3)) // v1
        TxTable.deleteMor(spark, root, DelLo, DelHi) // v2 (dv only)
        val extra = rows(col("o_orderkey") < 100)
          .select((col("okey") + 1000000000L).as("okey"),
            col("status"), col("price"))
        TxTable.appendBatch(spark, root, "bfix", 0L, extra) // v3
        TxTable.appendBatch(spark, root, "bfix", 0L, extra) // replay: no-op
        TxTable.compactBuckets(spark, root) // v4
        builtB.add(key)
      }
    }
    root
  }

  /** Latest read after the full bucketed-tier lifecycle (see
    * [[ensureBuiltBucketed]]) — content must equal the oracle's
    * reconstruction from raw orders: seed ∪ append ∪ ONE copy of the
    * replayed batch, minus the MOR-deleted range. */
  def qTxBucketCompact(spark: SparkSession, sfDir: String): DataFrame =
    TxTable.read(spark, ensureBuiltBucketed(spark, sfDir)).orderBy("okey")

  /** Post-MERGE snapshot (v1) — byte-equal to what the declarative
    * q_merge_upsert computes, proving the copy-on-write application. */
  def qTxMerge(spark: SparkSession, sfDir: String): DataFrame =
    at(spark, sfDir, Some(1L))

  /** Time travel: v0 read AFTER v1–v3 committed — snapshot isolation
    * means the pre-merge seed is still byte-reconstructible. */
  def qTxTravel(spark: SparkSession, sfDir: String): DataFrame =
    at(spark, sfDir, Some(0L))

  /** Post-compaction snapshot (v2): fewer files, a checkpoint in the
    * log, and — per the shared oracle text — identical content to v1. */
  def qTxCompact(spark: SparkSession, sfDir: String): DataFrame =
    at(spark, sfDir, Some(2L))

  /** Post-COW-delete snapshot (v3). */
  def qTxDelete(spark: SparkSession, sfDir: String): DataFrame =
    at(spark, sfDir, Some(3L))

  /** Latest (v4): after the MERGE-ON-READ delete — content must equal
    * "v3 minus the DV range" with zero data files rewritten (the
    * tombstones subtract at read time). Reads with NO explicit version
    * — the default-latest path. */
  def qTxDv(spark: SparkSession, sfDir: String): DataFrame =
    at(spark, sfDir, None)

  /** count(*) at latest answered from the MANIFEST ALONE (no data file
    * opened): Σ add.rows − Σ dv.rows. The same number the oracle
    * computes by actually counting the merged-minus-deletes relation —
    * the gate proves the metadata arithmetic stays exact through
    * create/merge/compact/COW-delete/MOR-delete. */
  def qTxMetaCount(spark: SparkSession, sfDir: String): DataFrame = {
    val n = TxTable.countRows(ensureBuilt(spark, sfDir))
    import spark.implicits._
    Seq(n).toDF("n")
  }

  /** Change data feed of the MERGE commit (v0 → v1): every delete,
    * both update images, and every insert, with full-row payloads —
    * the incremental-consumption surface (TxTable.changes reads only
    * the files the commit touched, never two table scans). */
  def qTxCdf(spark: SparkSession, sfDir: String): DataFrame =
    TxTable.changes(spark, ensureBuilt(spark, sfDir), 0L, 1L)
      .orderBy("okey", "change_type")

  // ---- Z-ordered table + Catalyst FileIndex read path -----------------

  private def zRootFor(sfDir: String): String =
    "/tmp/graft_txtable_z_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** Orders as a tx table Z-ORDERED on (o_custkey, o_orderkey) with
    * per-file stats on both — the data-layout story: predicates on
    * EITHER dimension stats-prune files (TxZorderSpec pins the counts;
    * a linear layout serves only its leading key). Built once per
    * (process, sfDir, data stamp), same memo discipline as the v0..v4
    * history. */
  private[graft] def ensureZBuilt(spark: SparkSession, sfDir: String): String = {
    val root = zRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val df = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_custkey").as("ckey"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root, df, "okey", nFiles = 16,
          statsCols = Seq("ckey", "okey"),
          clusterBy = Some(TxTable.zorderValue(df, Seq("ckey", "okey"))))
        built.add(key)
      }
    }
    root
  }

  /** The Catalyst read path under the oracle gate: a plain
    * `.filter(...)` over [[graft.io.TxRelation]] — no explicit bounds
    * API — whose pushed conjuncts stats-prune the z-layout's files on
    * BOTH dimensions before any parquet is opened. Content must equal
    * DuckDB's answer over the raw orders table: pruning is proven to
    * drop only files it may drop. */
  def qTxZorder(spark: SparkSession, sfDir: String): DataFrame =
    TxRelation.read(spark, ensureZBuilt(spark, sfDir))
      .filter(col("ckey").between(10, 200) && col("okey").between(500, 20000))
      .orderBy("okey")

  /** count(*) through the OPTIMIZER's metadata rewrite
    * (plans/TxMetadataCount.scala): plain `groupBy().count()` over the
    * z-table relation — no side API — which Catalyst collapses to a
    * one-row LocalRelation from the manifest (TxMetaRuleSpec pins the
    * plan shape). The oracle COUNTS THE ACTUAL ROWS in DuckDB, so the
    * gate proves the metadata shortcut returns the true count. */
  def qTxCountRule(spark: SparkSession, sfDir: String): DataFrame =
    TxRelation.read(spark, ensureZBuilt(spark, sfDir))
      .groupBy().count().select(col("count").as("n"))

  /** min/max of the cluster key through the same optimizer rewrite —
    * the manifest's per-file long bounds fold to the global extremes
    * with no scan; the oracle computes them from the actual rows. */
  def qTxMinmaxRule(spark: SparkSession, sfDir: String): DataFrame =
    TxRelation.read(spark, ensureZBuilt(spark, sfDir))
      .agg(count(lit(1)).as("n"), min(col("okey")).as("min_k"),
        max(col("okey")).as("max_k"))

  /** The PER-COMMIT change-feed decomposition — exactly what the
    * streaming `tx-cdf` source ([[graft.io.TxCdfSourceProvider]]) emits
    * over this table's history, computed batch-side: one
    * `changes(v, v+1]` slice per commit, stamped with `commit_v`.
    * TxCdfStreamSpec pins that a real `readStream.format("tx-cdf")`
    * run over this same table produces EXACTLY these rows (per-commit
    * micro-batches, AvailableNow drain, checkpoint-resumed restarts),
    * so this oracle gates the streaming source's content too. Commit 2
    * (compaction) contributes nothing — content-preserving rewrites
    * diff empty, in the stream as in batch. */
  def qTxCdfStream(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureBuilt(spark, sfDir)
    val latest = TxTable.versions(root).max
    (0L until latest).map { v =>
      TxTable.changes(spark, root, v, v + 1)
        .withColumn("commit_v", lit(v + 1))
    }.reduce(_.unionByName(_)).orderBy("commit_v", "okey", "change_type")
  }

  // ---- SQL text over the tx catalog -----------------------------------

  private def dRootFor(sfDir: String): String =
    "/tmp/graft_txtable_d_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A dedicated table whose v1 is a SQL-text `DELETE FROM … WHERE`
    * (SupportsDelete → deleteMorWhere: a deletion-vector commit, zero
    * data files rewritten) and whose v2 is a SQL-text `UPDATE … SET …
    * WHERE` (TxUpdateCommand → updateWhere: stats-pruned copy-on-write
    * rewrite). Built once per (process, sfDir, stamp), same memo
    * discipline as the main history. */
  private[graft] def ensureDBuilt(spark: SparkSession, sfDir: String): String = {
    val root = dRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8)
        ensureCatalog(spark)
        val t = s"tx.`${root.stripPrefix("/tmp/")}`"
        spark.sql(s"DELETE FROM $t WHERE price >= 100000.0")        // v1
        spark.sql(s"UPDATE $t SET status = 'U', price = price + 1000.0 " +
          "WHERE price < 10000.0")                                  // v2
        built.add(key)
      }
    }
    root
  }

  /** Post-SQL-DELETE content (VERSION AS OF 1) through the SQL front
    * door — the oracle computes the same survivors from the raw orders
    * table, proving the pushed-filter → deleteMorWhere translation
    * deleted exactly the predicate's rows and nothing else. */
  def qSqlTxDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureDBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price
         |FROM tx.`${root.stripPrefix("/tmp/")}` VERSION AS OF 1
         |ORDER BY okey""".stripMargin)
  }

  /** Post-SQL-UPDATE content (latest): both assignments evaluated
    * against pre-update rows, applied only where the predicate held —
    * mirrored in the oracle as CASE over the raw table. */
  def qSqlTxUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureDBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  private def uRootFor(sfDir: String): String =
    "/tmp/graft_txtable_u_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A table maintained by the STREAMING-UPSERT daily loop
    * ([[TxTable.upsertBatch]] — foreachBatch + MERGE + txn watermark,
    * the recipe StreamingUpsertSpec drives through a real
    * StreamingQuery): three deterministic batches including a
    * partial-column price reprice (status CARRIES), a fresh-key insert
    * day, and a status-only flagging pass (price carries) — with batch
    * 0 REPLAYED both immediately and after progress, so the oracled
    * content proves the watermark absorbed the replays (a double-applied
    * reprice would halve twice and hash-mismatch). */
  private[graft] def ensureUBuilt(spark: SparkSession, sfDir: String): String = {
    val root = uRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8)
        val app = "upsert-loop"
        // day 0: partial-column reprice of every key ≡0 (mod 5) —
        // status absent from the batch, so it CARRIES
        val b0 = seed.filter(col("okey") % 5 === 0)
          .select(col("okey"), (col("price") * 0.5).as("price"))
        val v1 = TxTable.upsertBatch(spark, root, app, 0L, b0)
        // immediate replay (sink-side crash before checkpoint advance):
        // must be a wholesale no-op
        require(TxTable.upsertBatch(spark, root, app, 0L, b0) == v1,
          "replayed upsert batch 0 was not absorbed")
        // day 1: fresh keys only — NEGATED-shifted originals, -(okey+1)
        // (the changeBatch idiom: strictly negative, so disjoint from
        // every real okey ≥ 0 at ANY scale factor, where a fixed offset
        // would collide once max(okey) outgrew it, and plain -okey
        // collides at okey = 0) — the 'U' action's unmatched side
        // inserts
        TxTable.upsertBatch(spark, root, app, 1L,
          seed.filter(col("okey") % 97 === 0)
            .select((-(col("okey") + 1L)).as("okey"),
              lit("F").as("status"), (col("price") + 1.0).as("price")))
        // day 2: status-only flagging of every ORIGINAL key ≡0 (mod 11)
        // — price carries through the partial update
        TxTable.upsertBatch(spark, root, app, 2L,
          seed.filter(col("okey") % 11 === 0)
            .select(col("okey"), lit("Z").as("status")))
        // stale replay after progress: also absorbed
        val vTop = TxTable.versions(root).max
        require(TxTable.upsertBatch(spark, root, app, 0L, b0) == vTop,
          "stale upsert replay was not absorbed")
        built.add(key)
      }
    }
    root
  }

  /** Final content of the streaming-upsert loop's table — the oracle
    * recomputes all three days' effects from the raw orders table
    * (CASE per update day + UNION ALL of the insert day), so replay
    * absorption, partial-column carry, and insert-via-'U' semantics
    * are all under the exact-match gate. */
  def qTxUpsertStream(spark: SparkSession, sfDir: String): DataFrame =
    TxRelation.read(spark, ensureUBuilt(spark, sfDir)).orderBy("okey")

  private def mRootFor(sfDir: String): String =
    "/tmp/graft_txtable_m_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A table whose v1 is the q_tx_merge change batch applied through
    * SQL-TEXT `MERGE INTO` (TxMergeCommand → TxTable.merge) — the same
    * oracle as the Scala merge, so the SQL lowering is proven to apply
    * the identical delete/update/insert semantics. */
  private[graft] def ensureMBuilt(spark: SparkSession, sfDir: String): String = {
    val root = mRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          lit("kept").as("src"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8)
        ensureCatalog(spark)
        changeBatch(spark, sfDir).createOrReplaceTempView("tx_merge_src")
        spark.sql(
          s"""MERGE INTO tx.`${root.stripPrefix("/tmp/")}` AS t
             |USING tx_merge_src AS s ON t.okey = s.k
             |WHEN MATCHED AND s.action = 'D' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET status = s.c_status,
             |  price = s.c_price, src = 'updated'
             |WHEN NOT MATCHED THEN INSERT (okey, status, price, src)
             |  VALUES (s.k, s.c_status, s.c_price, 'inserted')
             |""".stripMargin)
        built.add(key)
      }
    }
    root
  }

  /** Post-SQL-MERGE content — byte-equal to the Scala-API q_tx_merge
    * under the shared MergedCte oracle. */
  def qSqlTxMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureMBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price, src
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  private def mfRootFor(sfDir: String): String =
    "/tmp/graft_txtable_mf_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A table whose v1 exercises the FULL SQL-MERGE surface in one
    * statement: conditional matched DELETE, PARTIAL matched UPDATE
    * (status carries its target value), partial NOT MATCHED INSERT
    * (status gets the ANSI NULL), and a conditioned NOT MATCHED BY
    * SOURCE UPDATE over target columns — the SCD-style shapes round
    * 11 refused. */
  private[graft] def ensureMfBuilt(spark: SparkSession, sfDir: String): String = {
    val root = mfRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          lit("kept").as("src"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8)
        ensureCatalog(spark)
        val m = col("o_orderkey") % 10
        Tables.orders(spark, sfDir).filter(m < 3).select(
          when(m === 2, -col("o_orderkey")).otherwise(col("o_orderkey"))
            .as("k"),
          m.as("m"), col("o_totalprice").as("p"))
          .createOrReplaceTempView("tx_mfull_src")
        spark.sql(
          s"""MERGE INTO tx.`${root.stripPrefix("/tmp/")}` AS t
             |USING tx_mfull_src AS s ON t.okey = s.k
             |WHEN MATCHED AND s.m = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET price = s.p + 1000.0,
             |  src = 'updated'
             |WHEN NOT MATCHED THEN INSERT (okey, price, src)
             |  VALUES (s.k, s.p, 'inserted')
             |WHEN NOT MATCHED BY SOURCE AND t.price >= 100000.0
             |  THEN UPDATE SET src = 'expensive'
             |""".stripMargin)
        built.add(key)
      }
    }
    root
  }

  /** Post-full-MERGE content: deleted %10=0 rows gone; %10=1 rows show
    * the partial update (status CARRIED, price bumped, src tagged);
    * fresh negative keys inserted with NULL status; every other row —
    * matched by NO source key — shows the by-source update where its
    * pre-merge price clears the bar. */
  def qSqlTxMergeFull(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureMfBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price, src
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  private def rnRootFor(sfDir: String): String =
    "/tmp/graft_txtable_rn_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A table taken through the column-mapping lifecycle via SQL text:
    * v1 RENAME COLUMN price→amount (metadata-only — files keep the
    * stored name), v2 DROP COLUMN status (phys retired), v3 an UPDATE
    * addressing the RENAMED column — so the final content proves
    * rename re-labels the original bytes, drop hides without rewrite,
    * and writers translate logical→phys. Travel-below-the-rename is
    * pinned in TxColumnMapSpec. */
  private[graft] def ensureRnBuilt(spark: SparkSession, sfDir: String): String = {
    val root = rnRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root, seed, "okey", nFiles = 8)
        ensureCatalog(spark)
        val t = s"tx.`${root.stripPrefix("/tmp/")}`"
        spark.sql(s"ALTER TABLE $t RENAME COLUMN price TO amount")
        spark.sql(s"ALTER TABLE $t DROP COLUMN status")
        spark.sql(s"UPDATE $t SET amount = amount + 100.0 WHERE okey % 7 = 0")
        built.add(key)
      }
    }
    root
  }

  /** Post-rename/drop/update content read under the NEW names. */
  def qSqlTxRename(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureRnBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, amount
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  private def rRootFor(sfDir: String): String =
    "/tmp/graft_txtable_r_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** An append-only history for the streaming TABLE read: v0 seeds the
    * even order keys, v1 and v2 append disjoint odd slices — the only
    * commit shapes `readStream.table` admits. */
  private[graft] def ensureRBuilt(spark: SparkSession, sfDir: String): String = {
    val root = rRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root,
          seed.filter(col("okey") % 2 === 0), "okey", nFiles = 8)
        TxTable.append(spark, root,
          seed.filter(col("okey") % 4 === 1), nFiles = 4)       // v1
        TxTable.append(spark, root,
          seed.filter(col("okey") % 4 === 3), nFiles = 4)       // v2
        built.add(key)
      }
    }
    root
  }

  /** The streaming TABLE read's batch decomposition, under the oracle:
    * initial MOR snapshot at v0 PLUS, per later commit, exactly the
    * files that commit's manifest entries added — the
    * [[TxTable.commitSummary]] admission + direct-file read that
    * [[graft.io.TxAppendSource]] performs per micro-batch (O(new data),
    * no diff, no table scan). TxStreamReadSpec pins that a real
    * `spark.readStream.table` run delivers these same rows; this entry
    * gates their CONTENT against DuckDB (union of the three slices ≡
    * the whole orders table, every row exactly once). */
  def qTxReadStream(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureRBuilt(spark, sfDir)
    val schema = TxTable.snapshot(root).schema
    val snap0 = TxTable.read(spark, root, Some(0L))
    TxTable.versions(root).filter(_ > 0).map { v =>
      val c = TxTable.commitSummary(root, v)
      require(c.isAppendOnly, s"fixture commit $v must be append-only")
      spark.read.schema(schema)
        .parquet(c.addedData.map(a => s"$root/${a.path}"): _*)
    }.foldLeft(snap0)(_.unionByName(_)).orderBy("okey")
  }

  private def eRootFor(sfDir: String): String =
    "/tmp/graft_txtable_e_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** A table whose whole life is SQL DDL/DML text: v0 seeds the EVEN
    * order keys; v1 is `ALTER TABLE … ADD COLUMNS (band STRING)` — a
    * METADATA-ONLY widening commit ([[TxTable.evolveSchema]]), so the
    * v0 files are never rewritten and project `band` as null; v2
    * INSERTs the ODD keys WITH a computed band, so one scan mixes
    * pre-evolution files (null band) and post-evolution files (real
    * band); v3 is `INSERT OVERWRITE` — a single-commit atomic replace
    * ([[TxTable.overwrite]]) with recomputed content. */
  private[graft] def ensureEBuilt(spark: SparkSession, sfDir: String): String = {
    val root = eRootFor(sfDir)
    val key = s"$root:${stamp(sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        val seed = Tables.orders(spark, sfDir).select(
          col("o_orderkey").as("okey"),
          col("o_totalprice").as("price"))
        TxTable.create(spark, root,
          seed.filter(col("okey") % 2 === 0), "okey", nFiles = 8)
        ensureCatalog(spark)
        seed.createOrReplaceTempView("tx_evolve_src")
        val t = s"tx.`${root.stripPrefix("/tmp/")}`"
        spark.sql(s"ALTER TABLE $t ADD COLUMNS (band STRING)")      // v1
        spark.sql(
          s"""INSERT INTO $t
             |SELECT okey, price,
             |  CASE WHEN price < 50000.0 THEN 'lo' ELSE 'hi' END AS band
             |FROM tx_evolve_src WHERE okey % 2 = 1""".stripMargin) // v2
        spark.sql(
          s"""INSERT OVERWRITE TABLE $t
             |SELECT okey, price,
             |  CASE WHEN price >= 150000.0 THEN 'big' ELSE NULL END AS band
             |FROM tx_evolve_src WHERE okey % 4 = 0""".stripMargin) // v3
        built.add(key)
      }
    }
    root
  }

  /** Post-ALTER mixed-generation scan (VERSION AS OF 2): even keys come
    * from PRE-evolution files and must project the added column as
    * null; odd keys carry the inserted band. The oracle recomputes both
    * generations from raw orders — proving the metadata-only widening
    * reads back exactly as if every file had been rewritten. */
  def qSqlTxEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureEBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, price, band
         |FROM tx.`${root.stripPrefix("/tmp/")}` VERSION AS OF 2
         |ORDER BY okey""".stripMargin)
  }

  /** Post-`INSERT OVERWRITE` content (latest): the single-commit atomic
    * replace — old generations fully gone from the live set (yet still
    * travelable, pinned in TxCatalogSpec), replacement content exact
    * under the oracle. */
  def qSqlTxOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureEBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, price, band
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  /** Register the `tx` catalog once per session (idempotent — the conf
    * keys are constants, and CatalogManager instantiates lazily on
    * first reference). Base is /tmp because the per-process table roots
    * live directly under it. */
  private def ensureCatalog(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.catalog.tx",
      classOf[graft.io.TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.tx.base", "/tmp")
  }

  /** PURE SQL TEXT over the transactional table, time travel included:
    * `SELECT … FROM tx.<table> VERSION AS OF 1` — resolved by
    * [[graft.io.TxCatalog]], pinned at analysis, and (with the graft
    * extensions) executed through the native stats-pruning file plan
    * ([[graft.plans.TxCatalogReads]]). Same oracle as q_tx_merge: the
    * SQL front door must see byte-identical v1 content. */
  def qSqlTx(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price, src
         |FROM tx.`${root.stripPrefix("/tmp/")}` VERSION AS OF 1
         |ORDER BY okey""".stripMargin)
  }

  /** Bare `SELECT … FROM tx.<table>` (no version clause): latest-
    * snapshot resolution through the catalog, INCLUDING the
    * merge-on-read deletion-vector subtraction — same oracle as
    * q_tx_dv, so the SQL surface is proven MOR-correct too. */
  def qSqlTxLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureBuilt(spark, sfDir)
    ensureCatalog(spark)
    spark.sql(
      s"""SELECT okey, status, price, src
         |FROM tx.`${root.stripPrefix("/tmp/")}`
         |ORDER BY okey""".stripMargin)
  }

  /** Change data feed of the DELETION-VECTOR commit (v3 → v4): the
    * commit added no data file and removed none, so the diff comes
    * ENTIRELY from the dv-delta path — pre-images of the tombstoned
    * keys read from the stats-pruned candidate files of the UNTOUCHED
    * snapshot. The oracle reconstructs the same deletes from the
    * merged relation, so the gate proves dv-only commits feed
    * downstream consumers exactly like rewrites do. */
  def qTxCdfDv(spark: SparkSession, sfDir: String): DataFrame =
    TxTable.changes(spark, ensureBuilt(spark, sfDir), 3L, 4L)
      .orderBy("okey", "change_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tx_merge" -> (qTxMerge _),
    "q_tx_travel" -> (qTxTravel _),
    "q_tx_compact" -> (qTxCompact _),
    "q_tx_delete" -> (qTxDelete _),
    "q_tx_cdf" -> (qTxCdf _),
    "q_tx_cdf_dv" -> (qTxCdfDv _),
    "q_tx_dv" -> (qTxDv _),
    "q_tx_meta_count" -> (qTxMetaCount _),
    "q_tx_zorder" -> (qTxZorder _),
    "q_tx_count_rule" -> (qTxCountRule _),
    "q_tx_minmax_rule" -> (qTxMinmaxRule _),
    "q_sql_tx" -> (qSqlTx _),
    "q_sql_tx_latest" -> (qSqlTxLatest _),
    "q_sql_tx_delete" -> (qSqlTxDelete _),
    "q_sql_tx_update" -> (qSqlTxUpdate _),
    "q_sql_tx_merge" -> (qSqlTxMerge _),
    "q_sql_tx_merge_full" -> (qSqlTxMergeFull _),
    "q_sql_tx_rename" -> (qSqlTxRename _),
    "q_sql_tx_evolve" -> (qSqlTxEvolve _),
    "q_sql_tx_overwrite" -> (qSqlTxOverwrite _),
    "q_tx_read_stream" -> (qTxReadStream _),
    "q_tx_cdf_stream" -> (qTxCdfStream _),
    "q_tx_bucket_compact" -> (qTxBucketCompact _),
    "q_tx_upsert_stream" -> (qTxUpsertStream _),
  )

  /** The merged-state relation, shared by the v1/v2/v3 oracles (same
    * text as q_merge_upsert's, keyed to the same change derivation). */
  private val MergedCte =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |c AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 10 = 2 THEN -o_orderkey
      |         ELSE o_orderkey END AS k,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
      |         WHEN o_orderkey % 10 = 1 THEN 'U' ELSE 'I' END AS action,
      |    CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 1000.0
      |         ELSE o_totalprice END AS c_price,
      |    CASE WHEN o_orderkey % 10 = 2 THEN 'N'
      |         ELSE o_orderstatus END AS c_status
      |  FROM orders WHERE o_orderkey % 10 < 3),
      |merged AS (
      |  SELECT coalesce(o_orderkey, k) AS okey,
      |    CASE WHEN action IS NOT NULL THEN c_status
      |         ELSE o_orderstatus END AS status,
      |    CASE WHEN action IS NOT NULL THEN c_price
      |         ELSE o_totalprice END AS price,
      |    CASE WHEN action = 'I' THEN 'inserted'
      |         WHEN action = 'U' THEN 'updated'
      |         ELSE 'kept' END AS src
      |  FROM s FULL OUTER JOIN c ON o_orderkey = k
      |  WHERE action IS NULL OR action <> 'D')
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_tx_merge" ->
      (MergedCte + "SELECT okey, status, price, src FROM merged ORDER BY okey"),
    // SQL front door, VERSION AS OF 1 — must equal the merge content
    "q_sql_tx" ->
      (MergedCte + "SELECT okey, status, price, src FROM merged ORDER BY okey"),
    // SQL front door, latest — must equal the post-MOR-delete content
    "q_sql_tx_latest" ->
      (MergedCte +
        s"""SELECT okey, status, price, src FROM merged
           |WHERE okey NOT BETWEEN $DelLo AND $DelHi
           |  AND okey NOT BETWEEN $DvLo AND $DvHi ORDER BY okey""".stripMargin),
    "q_tx_compact" ->
      (MergedCte + "SELECT okey, status, price, src FROM merged ORDER BY okey"),
    "q_tx_delete" ->
      (MergedCte +
        s"""SELECT okey, status, price, src FROM merged
           |WHERE okey NOT BETWEEN $DelLo AND $DelHi ORDER BY okey""".stripMargin),
    "q_tx_travel" ->
      """SELECT o_orderkey AS okey, o_orderstatus AS status,
        |  o_totalprice AS price, 'kept' AS src
        |FROM orders ORDER BY okey""".stripMargin,
    "q_tx_dv" ->
      (MergedCte +
        s"""SELECT okey, status, price, src FROM merged
           |WHERE okey NOT BETWEEN $DelLo AND $DelHi
           |  AND okey NOT BETWEEN $DvLo AND $DvHi ORDER BY okey""".stripMargin),
    "q_tx_meta_count" ->
      (MergedCte +
        s"""SELECT CAST(count(*) AS BIGINT) AS n FROM merged
           |WHERE okey NOT BETWEEN $DelLo AND $DelHi
           |  AND okey NOT BETWEEN $DvLo AND $DvHi""".stripMargin),
    "q_tx_count_rule" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM orders""",
    "q_tx_minmax_rule" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
        |FROM orders""".stripMargin,
    "q_tx_zorder" ->
      """SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 200
        |  AND o_orderkey BETWEEN 500 AND 20000
        |ORDER BY okey""".stripMargin,
    "q_tx_cdf_dv" ->
      (MergedCte +
        s"""SELECT okey, status, price, src, 'delete' AS change_type
           |FROM merged
           |WHERE okey NOT BETWEEN $DelLo AND $DelHi
           |  AND okey BETWEEN $DvLo AND $DvHi
           |ORDER BY okey, change_type""".stripMargin),
    // the bucketed-tier lifecycle: every surviving row from raw orders
    // (seed %4<3 ∪ append %4=3 = all), ONE copy of the replayed
    // shifted batch, minus the MOR-deleted range — replayed-batch
    // absorption and compaction-content-identity both land in the hash
    "q_tx_bucket_compact" ->
      s"""WITH allr AS (
         |  SELECT o_orderkey AS okey, o_orderstatus AS status,
         |    o_totalprice AS price
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + 1000000000 AS okey,
         |    o_orderstatus AS status, o_totalprice AS price
         |  FROM orders WHERE o_orderkey < 100)
         |SELECT okey, status, price FROM allr
         |WHERE okey NOT BETWEEN $DelLo AND $DelHi
         |ORDER BY okey""".stripMargin,
    // streaming-upsert loop: all three days recomputed from raw orders
    // (update days as CASE, the insert day as UNION ALL) — a replayed
    // batch that double-applied would halve a price twice and mismatch
    "q_tx_upsert_stream" ->
      """WITH seed AS (
        |  SELECT o_orderkey AS okey, o_orderstatus AS status,
        |    o_totalprice AS price
        |  FROM orders),
        |finals AS (
        |  SELECT okey,
        |    CASE WHEN okey % 11 = 0 THEN 'Z' ELSE status END AS status,
        |    CASE WHEN okey % 5 = 0 THEN price * 0.5 ELSE price END AS price
        |  FROM seed
        |  UNION ALL
        |  SELECT -(okey + 1) AS okey, 'F' AS status,
        |    price + 1.0 AS price
        |  FROM seed WHERE okey % 97 = 0)
        |SELECT okey, status, price FROM finals ORDER BY okey""".stripMargin,
    // SQL DML: the DELETE FROM predicate's complement, from raw orders
    "q_sql_tx_delete" ->
      """SELECT o_orderkey AS okey, o_orderstatus AS status,
        |  o_totalprice AS price
        |FROM orders WHERE NOT (o_totalprice >= 100000.0)
        |ORDER BY okey""".stripMargin,
    // SQL UPDATE on top of the delete: CASE over the raw survivors
    "q_sql_tx_update" ->
      """SELECT o_orderkey AS okey,
        |  CASE WHEN o_totalprice < 10000.0 THEN 'U'
        |       ELSE o_orderstatus END AS status,
        |  CASE WHEN o_totalprice < 10000.0 THEN o_totalprice + 1000.0
        |       ELSE o_totalprice END AS price
        |FROM orders WHERE NOT (o_totalprice >= 100000.0)
        |ORDER BY okey""".stripMargin,
    // SQL MERGE applies the same change batch as the Scala q_tx_merge —
    // identical oracle text proves the lowering is semantics-preserving
    "q_sql_tx_merge" ->
      (MergedCte + "SELECT okey, status, price, src FROM merged ORDER BY okey"),
    // the full-surface MERGE: matched delete (%10=0), PARTIAL matched
    // update (%10=1: status carried from the target), partial insert
    // (fresh -okey keys: status = ANSI NULL), and the by-source update
    // over every row no source key matched
    "q_sql_tx_merge_full" ->
      """WITH t0 AS (
        |  SELECT o_orderkey AS okey, o_orderstatus AS status,
        |    o_totalprice AS price, 'kept' AS src FROM orders)
        |SELECT okey, status, price + 1000.0 AS price, 'updated' AS src
        |  FROM t0 WHERE okey % 10 = 1
        |UNION ALL
        |SELECT -okey, CAST(NULL AS VARCHAR), price, 'inserted'
        |  FROM t0 WHERE okey % 10 = 2
        |UNION ALL
        |SELECT okey, status, price,
        |  CASE WHEN price >= 100000.0 THEN 'expensive' ELSE src END
        |  FROM t0 WHERE okey % 10 >= 2
        |ORDER BY okey""".stripMargin,
    // column-mapping lifecycle: price renamed to amount (same stored
    // bytes), status dropped (no rewrite), update addressed the NEW
    // name — recomputed from raw orders
    "q_sql_tx_rename" ->
      """SELECT o_orderkey AS okey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
        |       ELSE o_totalprice END AS amount
        |FROM orders ORDER BY okey""".stripMargin,
    // ALTER ADD COLUMNS is metadata-only: pre-evolution rows (even
    // keys) must read the added column as null, post-evolution inserts
    // (odd keys) carry it — both recomputed from raw orders
    "q_sql_tx_evolve" ->
      """SELECT o_orderkey AS okey, o_totalprice AS price,
        |  CASE WHEN o_orderkey % 2 = 1 THEN
        |    CASE WHEN o_totalprice < 50000.0 THEN 'lo' ELSE 'hi' END
        |  ELSE NULL END AS band
        |FROM orders ORDER BY okey""".stripMargin,
    // INSERT OVERWRITE atomically replaced the table with this content
    "q_sql_tx_overwrite" ->
      """SELECT o_orderkey AS okey, o_totalprice AS price,
        |  CASE WHEN o_totalprice >= 150000.0 THEN 'big' ELSE NULL END AS band
        |FROM orders WHERE o_orderkey % 4 = 0 ORDER BY okey""".stripMargin,
    // the streaming TABLE read's decomposition: snapshot + appended
    // files, every orders row exactly once
    "q_tx_read_stream" ->
      """SELECT o_orderkey AS okey, o_totalprice AS price
        |FROM orders ORDER BY okey""".stripMargin,
    // the streaming source's per-commit decomposition: commit 1 = the
    // merge CDF, commit 2 (compact) empty, commit 3 = the COW range
    // delete's pre-images, commit 4 = the dv-only delete's pre-images
    "q_tx_cdf_stream" ->
      (MergedCte +
        s""",pre AS (
           |  SELECT o_orderkey AS okey, o_orderstatus AS status,
           |    o_totalprice AS price, 'kept' AS src FROM orders)
           |SELECT okey, status, price, src, 'delete' AS change_type,
           |  CAST(1 AS BIGINT) AS commit_v
           |  FROM pre WHERE okey % 10 = 0
           |UNION ALL
           |SELECT okey, status, price, src, 'update_pre', 1 FROM pre
           |  WHERE okey % 10 = 1
           |UNION ALL
           |SELECT okey, status, price + 1000.0, 'updated', 'update_post', 1
           |  FROM pre WHERE okey % 10 = 1
           |UNION ALL
           |SELECT -okey, 'N', price, 'inserted', 'insert', 1 FROM pre
           |  WHERE okey % 10 = 2
           |UNION ALL
           |SELECT okey, status, price, src, 'delete', 3 FROM merged
           |  WHERE okey BETWEEN $DelLo AND $DelHi
           |UNION ALL
           |SELECT okey, status, price, src, 'delete', 4 FROM merged
           |  WHERE okey NOT BETWEEN $DelLo AND $DelHi
           |    AND okey BETWEEN $DvLo AND $DvHi
           |ORDER BY commit_v, okey, change_type""".stripMargin),
    "q_tx_cdf" ->
      """WITH pre AS (
        |  SELECT o_orderkey AS okey, o_orderstatus AS status,
        |    o_totalprice AS price, 'kept' AS src FROM orders)
        |SELECT okey, status, price, src, 'delete' AS change_type
        |  FROM pre WHERE okey % 10 = 0
        |UNION ALL
        |SELECT okey, status, price, src, 'update_pre' FROM pre
        |  WHERE okey % 10 = 1
        |UNION ALL
        |SELECT okey, status, price + 1000.0, 'updated', 'update_post'
        |  FROM pre WHERE okey % 10 = 1
        |UNION ALL
        |SELECT -okey, 'N', price, 'inserted', 'insert' FROM pre
        |  WHERE okey % 10 = 2
        |ORDER BY okey, change_type""".stripMargin,
  )
}
