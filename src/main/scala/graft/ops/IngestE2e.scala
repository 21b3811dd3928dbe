package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.io.{Tables, TxRelation, TxTable}

/** CROSS-TIER INGEST PROPAGATION — the GROWTH twin of
  * [[RetractE2e]]: the other event a production pipeline runs daily is
  * "these documents arrived", and it must propagate to every standing
  * artifact just like a takedown does:
  *
  *   ONE append commit on the corpus tx table
  *     → its change feed (the SAME per-commit CDF every consumer tails)
  *       → the standing dedup index   (flag the batch against the
  *                                     CURRENT index, admit the kept —
  *                                     the index-maintenance cycle)
  *       → the graph-ANN stores       (banded candidate admission)
  *       → the IVFPQ codes store      (batch-only encode under the
  *                                     corpus-trained artifacts)
  *       → the standing CMS sketch    (the day's positive cells)
  *       → the standing image index   (batch-only decode+hash bands)
  *       → the standing BM25 index    (batch-only tokenize: postings
  *                                     append + one positive stat cell)
  *
  * Each consumer lands the batch exactly-once under the shared
  * (appId, batchId = the corpus commit version) txn watermark — the
  * same replay/crash contract RetractE2eSpec proves for deletes,
  * proven for ingest in IngestE2eSpec.
  *
  * q_ingest_e2e is the POST-ADMISSION readout across all seven tiers:
  * a DAY-2 batch (never admitted) probed against every grown store.
  * The oracle composes each tier's own contract on the GROWN corpus:
  *  - corpus:    survivors are `doc_id % 10 <> 9` (split ∪ day 1);
  *  - dedup:     a TWO-PASS replay of the incremental-dedup chain —
  *               day-1 flags vs the original corpus define kept₁, and
  *               day-2 flags run against corpus ∪ kept₁ (the shared
  *               CTE body + two prefixed flags chains,
  *               [[Incremental.incrFlagsCtes]]) — the index-
  *               maintenance cycle, value-gated end to end;
  *  - ann_graph: the survivor-rebuild walk with `% 10 = 9` as the
  *               excluded slice ([[GraphAnn.annGraphDeletedSqlWhere]]
  *               — the SAME builder retraction uses, because "store
  *               holds everything but day 2" is set-wise identical);
  *  - ann_ivfpq: the IVFADC chain with day-2 codes excluded
  *               ([[LlmOps.ivfPqSurvivorSql]]);
  *  - cms:       the from-scratch sketch of `% 10 <> 9`;
  *  - phash:     day-2 images vs the grown band store
  *               ([[Multimodal.incrPhashOracleWhere]]);
  *  - bm25:      the grown-corpus top-20 of the fixed relevance query
  *               ([[LexIndex.bm25RankedSqlWhere]] over `% 10 <> 9`).
  */
object IngestE2e {

  private val App = "ingest_e2e"

  /** Day splits — ONE (modulus, day-1, day-2) triple generates both
    * the Column predicates and every oracle fragment (the r16-ADVICE
    * single-definition discipline): standing corpus % 10 < day 1,
    * ingest day 1 = 8 (THE event), probe day 2 = 9 (never admitted —
    * the readout batch). private[graft]: IngestE2eSpec derives its
    * fixture predicates from these. */
  private val DayMod = 10L
  private val Day1 = 8L
  private val Day2 = 9L
  private def isCorpus(ref: String): String = s"$ref % $DayMod < $Day1"
  private def isDay1(ref: String): String = s"$ref % $DayMod = $Day1"
  private def isDay2(ref: String): String = s"$ref % $DayMod = $Day2"
  private[graft] def corpusCol(c: String): org.apache.spark.sql.Column =
    col(c) % DayMod < Day1
  private[graft] def day1Col(c: String): org.apache.spark.sql.Column =
    col(c) % DayMod === Day1
  private[graft] def day2Col(c: String): org.apache.spark.sql.Column =
    col(c) % DayMod === Day2

  private def r(kind: String, sfDir: String): String =
    "/tmp/graft_inge2e_" + kind + "_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current.pid

  private[graft] case class Stores(corpT: String,
      fpT: String, bandT: String, sigT: String,
      eroot: String, broot: String, croot: String, cmsT: String,
      phT: String, lexT: String, lexStatsT: String)

  private val built =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private[graft] def ensureStores(spark: SparkSession, sfDir: String)
      : Stores = {
    val st = Stores(r("corp", sfDir), r("fp", sfDir), r("band", sfDir),
      r("sig", sfDir), r("ge", sfDir), r("gb", sfDir), r("pq", sfDir),
      r("cms", sfDir), r("ph", sfDir), r("lex", sfDir), r("lexst", sfDir))
    val key = s"${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet") + ":" +
      Housekeeping.contentStamp(s"$sfDir/embeddings.parquet")
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_inge2e_")
        st.productIterator.foreach { p =>
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(p.toString))
        }
        buildAllTiers(spark, sfDir, st)
        // ==== THE ingest event: ONE append commit (exactly-once
        // itself — a replayed source batch is absorbed by corpT) ====
        val vIng = TxTable.appendBatch(spark, st.corpT, s"${App}_src", 1L,
          Tables.documents(spark, sfDir).filter(day1Col("doc_id"))
            .select(col("doc_id"), col("text")))
        // ==== the fan-out: every consumer reads THE SAME feed ====
        propagateIngest(spark, sfDir, st,
          TxTable.changes(spark, st.corpT, vIng - 1, vIng), vIng)
        built.add(key)
      }
    }
    st
  }

  /** The pre-ingest standing world: every tier built on the standing
    * corpus split ONLY — day 1 arrives through the feed. */
  private[graft] def buildAllTiers(spark: SparkSession, sfDir: String,
      st: Stores): Unit = {
    val corpusDocs = Tables.documents(spark, sfDir)
      .filter(corpusCol("doc_id")).select(col("doc_id"), col("text"))
    TxTable.create(spark, st.corpT, corpusDocs, "doc_id", nFiles = 4)
    Incremental.buildIndexTables(spark, corpusDocs, st.fpT, st.bandT,
      st.sigT)
    val e = Tables.embeddings(spark, sfDir)
    val nCorpus = e.filter(corpusCol("vec_id")).count()
    val nGrown = e.filter(!day2Col("vec_id")).count()
    require(GraphAnn.bitsFor(nCorpus) == GraphAnn.bitsFor(nGrown),
      s"ingest day crosses a bitsFor boundary at $sfDir — the " +
        "admission tier's identity-with-rebuild precondition fails " +
        "(production re-bands via rebuild)")
    GraphAnn.buildAnnStores(spark, e.filter(corpusCol("vec_id")),
      st.eroot, st.broot)
    LlmOps.buildIvfPqStore(spark, sfDir, st.croot,
      seedOnly = _.filter(corpusCol("vec_id")))
    TxTable.createEmpty(st.cmsT, StructType(Seq(
      StructField("j", LongType), StructField("bucket", LongType),
      StructField("cnt", LongType))), "bucket")
    TxTable.appendBatch(spark, st.cmsT, s"${App}_seed", 0L,
      Sketches.cmsCells(corpusDocs), nFiles = 1)
    Multimodal.buildPhashTable(spark,
      Multimodal.phashFrameWhere(spark, sfDir, corpusCol("doc_id")),
      st.phT)
    LexIndex.buildLexTables(spark, corpusDocs, st.lexT, st.lexStatsT)
  }

  /** Fan ONE commit's inserts out to every consumer, exactly-once each
    * under (App, batchId). The dedup consumer runs the full
    * index-maintenance cycle — flag the arrivals against the CURRENT
    * index, admit the kept — so a replayed delivery recomputes flags
    * against the already-updated index but commits nothing (the txn
    * watermark short-circuits every admission append). Consumers read
    * ONLY the feed; vectors come from the embeddings side keyed by the
    * fed ids, images are re-hashed from the fed ids — never a base-
    * table scan. */
  private[graft] def propagateIngest(spark: SparkSession, sfDir: String,
      st: Stores, feed: DataFrame, batchId: Long): Unit = {
    val insertedC = Ckpt(feed.filter(col("change_type") === "insert")
      .select(col("doc_id"), col("text")))
    // release in finally (review r17): a consumer throwing mid-fan-out
    // must not leak the materialized slice for the session's lifetime
    try {
      val inserted = insertedC.df
      val txn = Some((App, batchId))
      // dedup: flag → admit kept (the daily cycle)
      val flags = Incremental.idxFlagsFor(inserted,
        TxRelation.read(spark, st.fpT), TxRelation.read(spark, st.bandT),
        TxRelation.read(spark, st.sigT))
      Incremental.admitBatch(spark, inserted,
        flags.filter(col("kept") === 1).select("doc_id"),
        st.fpT, st.bandT, st.sigT, txn = txn)
      // graph: the fed ids' vectors
      GraphAnn.admitVectors(spark,
        Tables.embeddings(spark, sfDir)
          .join(inserted.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding")),
        st.eroot, st.broot, txn = txn)
      // IVFPQ: batch-only encode under the corpus-trained artifacts
      LlmOps.admitPqBatch(spark, sfDir, st.croot,
        inserted.select(col("doc_id").as("vec_id")), txn = txn)
      // CMS: the day's positive cells
      TxTable.appendBatch(spark, st.cmsT, App, batchId,
        Sketches.cmsCells(inserted), nFiles = 1)
      // image index: batch-only decode + hash
      Multimodal.admitPhashBatch(spark, st.phT,
        Multimodal.phashFrameIds(inserted.select(col("doc_id"))), txn = txn)
      // BM25 index: batch-only tokenize — postings + one stat cell.
      // ALL arrivals are indexed (retrieval serves whatever the corpus
      // table holds; keep-decisions are the dedup tier's concern)
      LexIndex.admitDocs(spark, inserted, st.lexT, st.lexStatsT, txn = txn)
    } finally insertedC.release()
  }

  /** The POST-ADMISSION readout: a DAY-2 batch probed against every
    * grown store, in the capstones' uniform (tier, probe, value)
    * relation (see [[RetractE2e.qRetractE2e]] for the packing). */
  def qIngestE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val st = ensureStores(spark, sfDir)
    val live = TxRelation.read(spark, st.corpT)
    val corpusPart = live
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("s"))
      .select(explode(array(
        struct(lit("corpus").as("tier"), lit("n_docs").as("probe"),
          col("n").as("value")),
        struct(lit("corpus").as("tier"), lit("sum_ids").as("probe"),
          col("s").as("value")))).as("row"))
      .select(col("row.tier").as("tier"), col("row.probe").as("probe"),
        col("row.value").as("value"))
    val day2 = Tables.documents(spark, sfDir).filter(day2Col("doc_id"))
      .select(col("doc_id"), col("text"))
    val dedupPart = Incremental.idxFlagsFor(day2,
        TxRelation.read(spark, st.fpT), TxRelation.read(spark, st.bandT),
        TxRelation.read(spark, st.sigT))
      .select(lit("dedup").as("tier"),
        col("doc_id").cast("string").as("probe"),
        (col("exact_dup") * 4 + col("near_dup") * 2 + col("kept"))
          .cast("long").as("value"))
    val grownVecs = Tables.embeddings(spark, sfDir)
      .filter(!day2Col("vec_id"))
    val graphPart = GraphAnn.beamSearch(spark, sfDir,
        GraphAnn.readGraph(spark, st.eroot, sfDir),
        s"ing:${st.eroot}", GraphAnn.storeStamp(st.eroot),
        corpus = Some(grownVecs))
      .select(lit("ann_graph").as("tier"),
        concat(col("qid").cast("string"), lit(":"),
          col("rn").cast("string")).as("probe"),
        col("vec_id").cast("long").as("value"))
    val pqPart = LlmOps.annIvfPqResults(spark, sfDir, col("vec_id") < 3,
        Some(st.croot))
      .select(lit("ann_ivfpq").as("tier"),
        concat(col("qid").cast("string"), lit(":"),
          col("rn").cast("string")).as("probe"),
        col("vec_id").cast("long").as("value"))
    val sketch = TxRelation.read(spark, st.cmsT)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    val cmsPart = Sketches.cmsProbeReport(
        live.select(explode(split(col("text"), " ")).as("tok")), sketch)
      .select(lit("cms").as("tier"), col("tok").as("probe"),
        col("cms_est").cast("long").as("value"))
    val phashPart = Multimodal.phashNearAgainst(
        Multimodal.phashBandsFolded(
          Multimodal.phashFrameWhere(spark, sfDir, day2Col("doc_id"))),
        TxRelation.read(spark, st.phT))
      .select(lit("phash").as("tier"),
        col("doc_id").cast("string").as("probe"),
        (col("nbr") * 8 + col("hamming")).cast("long").as("value"))
    val bm25Part = LexIndex.rankedTop(
        LexIndex.servedScores(spark, st.lexT, st.lexStatsT, tombT = None))
      .select(lit("bm25").as("tier"), col("rank").cast("string").as("probe"),
        col("doc_id").cast("long").as("value"))
    corpusPart.unionByName(dedupPart).unionByName(graphPart)
      .unionByName(pqPart).unionByName(cmsPart).unionByName(phashPart)
      .unionByName(bm25Part)
      .orderBy("tier", "probe")
  }

  /** The GROWTH side's size-triggered maintenance hooks for the
    * fan-out driver ([[Propagate.runFanoutLoop]]): daily admissions
    * append ≤ nBuckets files per store per day, so the logs grow one
    * commit's files at a time — each hook re-packs its store
    * ([[graft.io.TxTable.compactBuckets]], a pure placement-preserving
    * re-pack here: no tombstones on the growth path) or folds its cell
    * log, behind a manifest-only file-count due-check. The graph tier
    * compacts through its owner-prune pass ([[GraphAnn]]'s own specs)
    * and is deliberately not re-packed blindly here. */
  private[graft] def maintenanceHooks(spark: SparkSession, st: Stores,
      maxFiles: Int = 64): Seq[Propagate.Maintenance] = Seq(
    Propagate.Maintenance("dedup",
      due = () => Seq(st.fpT, st.bandT, st.sigT)
        .exists(r => Propagate.logFilesExceed(r, maxFiles)()),
      run = () => Seq(st.fpT, st.bandT, st.sigT)
        .foreach(r => TxTable.compactBuckets(spark, r))),
    Propagate.Maintenance("ann_ivfpq",
      due = Propagate.logFilesExceed(st.croot, maxFiles),
      run = () => TxTable.compactBuckets(spark, st.croot)),
    Propagate.Maintenance("phash",
      due = Propagate.logFilesExceed(st.phT, maxFiles),
      run = () => TxTable.compactBuckets(spark, st.phT)),
    Propagate.Maintenance("cms",
      due = Propagate.logFilesExceed(st.cmsT, maxFiles),
      run = () => TxTable.overwrite(spark, st.cmsT,
        TxRelation.read(spark, st.cmsT)
          .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") =!= 0))),
    Propagate.Maintenance("bm25",
      due = () => Propagate.logFilesExceed(st.lexT, maxFiles)() ||
        Propagate.logFilesExceed(st.lexStatsT, maxFiles)(),
      run = () => {
        TxTable.compactBuckets(spark, st.lexT)
        TxTable.overwrite(spark, st.lexStatsT,
          TxRelation.read(spark, st.lexStatsT)
            .agg(sum(col("n_docs")).cast("long").as("n_docs"),
              sum(col("sum_dl")).cast("long").as("sum_dl")))
      }))

  /** Tier → the tx tables whose (App) txn actions record the last
    * corpus commit version that consumer applied (the
    * [[RetractE2e.consumerTables]] contract for the GROWTH fan-out —
    * admission watermarks live on the store tables themselves). */
  private[graft] def consumerTables(st: Stores): Seq[(String, Seq[String])] =
    Seq(
      "dedup" -> Seq(st.fpT, st.bandT, st.sigT),
      "phash" -> Seq(st.phT),
      "ann_graph" -> Seq(st.eroot, st.broot),
      "ann_ivfpq" -> Seq(st.croot),
      "cms" -> Seq(st.cmsT),
      "bm25" -> Seq(st.lexT, st.lexStatsT))

  /** The PROPAGATION LEDGER over the GROWTH capstone
    * ([[RetractE2e.fanoutStatus]] — the same manifest-only reader,
    * proving the ledger generalizes across fan-outs): each consumer's
    * applied admission watermark vs the corpus head. Fixture: create =
    * v0, THE ingest = v1, every tier applied v1. */
  def qTxFanoutIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val st = ensureStores(spark, sfDir)
    RetractE2e.fanoutStatus(spark, st.corpT, consumerTables(st), app = App)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_e2e" -> (qIngestE2e _),
    "q_tx_fanout_ingest" -> (qTxFanoutIngest _))

  /** The composed grown-corpus oracle (module scaladoc). */
  private def e2eOracle: String = {
    val grown = "doc_id % 10 <> 9"
    s"""SELECT tier, probe, value FROM (
       |SELECT 'corpus' AS tier, 'n_docs' AS probe,
       |  CAST(count(*) AS BIGINT) AS value FROM documents WHERE $grown
       |UNION ALL
       |SELECT 'corpus', 'sum_ids', CAST(sum(doc_id) AS BIGINT)
       |FROM documents WHERE $grown
       |UNION ALL
       |SELECT 'dedup', CAST(doc_id AS VARCHAR),
       |  CAST(exact_dup * 4 + near_dup * 2 + kept AS BIGINT)
       |FROM (WITH ${Incremental.incrSharedCtes},
       |${Incremental.incrFlagsCtes("p1", isCorpus("DOC"), isDay1("DOC"))},
       |k1 AS (SELECT doc_id FROM p1flags
       |  WHERE exact_dup = 0 AND near_dup = 0),
       |${Incremental.incrFlagsCtes("p2",
          s"(${isCorpus("DOC")} OR DOC IN (SELECT doc_id FROM k1))",
          isDay2("DOC"))}
       |${Incremental.incrFlagsSelect("p2")}) dd
       |UNION ALL
       |SELECT 'ann_graph',
       |  CAST(qid AS VARCHAR) || ':' || CAST(rn AS VARCHAR),
       |  CAST(vec_id AS BIGINT)
       |FROM (${GraphAnn.annGraphDeletedSqlWhere("vec_id % 10 = 9")}) gg
       |UNION ALL
       |SELECT 'ann_ivfpq',
       |  CAST(qid AS VARCHAR) || ':' || CAST(rn AS VARCHAR),
       |  CAST(vec_id AS BIGINT)
       |FROM (${LlmOps.ivfPqSurvivorSql(
                 " AND NOT (cd.vec_id % 10 = 9)")}) pp
       |UNION ALL
       |SELECT 'cms', tok, CAST(cms_est AS BIGINT)
       |FROM (${Sketches.cmsOracleWhere(s"WHERE $grown")}) cc
       |UNION ALL
       |SELECT 'phash', CAST(doc_id AS VARCHAR),
       |  CAST(nbr * 8 + hamming AS BIGINT)
       |FROM (${Multimodal.incrPhashOracleWhere("DOC % 10 <> 9",
                 isDay2("DOC"))}) ph
       |UNION ALL
       |SELECT 'bm25', CAST(rank AS VARCHAR), CAST(doc_id AS BIGINT)
       |FROM (${LexIndex.bm25RankedSqlWhere(s"WHERE $grown")}) bb
       |) u ORDER BY tier, probe""".stripMargin
  }

  /** The fixture's known commit versions ([[RetractE2e]]'s constant-
    * table device). */
  private def fanoutIngestOracle: String = {
    val rows = Seq("ann_graph", "ann_ivfpq", "bm25", "cms", "dedup", "phash")
      .map(t => s"('$t', 1, 1, 1)").mkString(",\n  ")
    s"""SELECT tier, CAST(applied_v AS BIGINT) AS applied_v,
       |  CAST(head_v AS BIGINT) AS head_v,
       |  CAST(caught_up AS BIGINT) AS caught_up
       |FROM (VALUES
       |  $rows) t(tier, applied_v, head_v, caught_up)
       |ORDER BY tier""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_ingest_e2e" -> e2eOracle,
    "q_tx_fanout_ingest" -> fanoutIngestOracle)
}
