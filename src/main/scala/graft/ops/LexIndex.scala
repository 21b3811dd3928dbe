package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.io.{Tables, TxRelation, TxTable}

/** STANDING LEXICAL (BM25) INDEX (r17 verdict item 1) — the last
  * serving family that recomputed corpus state per query gets the same
  * standing-index treatment as the dedup bands, graph edges, IVFPQ
  * codes, sketches, and image bands: persist the inverted index and the
  * global stats once, then serve every relevance query from them with
  * work ∝ the probed terms' postings, never ∝ the corpus.
  *
  * Two standing bucketed tx tables ([[graft.io.TxTable]] — atomic
  * commits, time travel, exactly-once streaming admission):
  *
  *  - POSTINGS (tk, term, doc_id, tf, dl), hash-bucketed by `term`
  *    (the probe key): the classic inverted index, denormalized with
  *    the document length so scoring never joins a doclen relation.
  *    A relevance query reads ONLY the probed terms' buckets
  *    (bucket-set pruning, LexIndexSpec pins SelectedBucketsCount);
  *    per-term df is derived from the SAME matched postings the scorer
  *    already reads (df_i = count of live postings rows for term i —
  *    zero extra corpus cost, and automatically consistent under
  *    tombstone masks).
  *  - STAT CELLS (n_docs, sum_dl): sum-mergeable deltas, one row per
  *    admission commit and one NEGATED row per retraction commit (the
  *    [[Sketches]] CMS-cell invertibility argument — counts and sums
  *    subtract exactly). The read-side merge is O(#commits), never a
  *    corpus scan; periodic compaction folds the log
  *    ([[graft.io.TxTable.overwrite]] with the summed row, the
  *    IncrSketchSpec fold-invariance discipline).
  *
  * Admission is batch-only tokenize → postings append + one positive
  * stat cell, exactly-once under the (appId, batchId) txn watermark.
  * Retraction is ONE tombstone commit + one negated stat cell computed
  * from the delete batch's PRE-IMAGE texts (they ride the change feed,
  * so no consumer reads the base table); serve-time masks anti-join the
  * tombstones on doc_id above the pruned postings scan. The stats
  * contract mirrors the tombstone uniqueness contract: callers pass
  * exact pre-image slices (a corpus-table row deletes at most once, so
  * the feed guarantees it) — the negation is keyed by batch CONTENT
  * under the txn watermark, which keeps crash-between-appends replays
  * exact where a tombstone-state-derived delta would not be.
  *
  * Served scores are BIT-IDENTICAL to the from-scratch
  * [[Pipeline.bm25Scores]]: both paths assemble the same LONGs
  * (tf, df, dl, n_docs, sum_dl) and feed the ONE score expression
  * ([[Pipeline.bm25ScoreExpr]]); docs with no probed-term hit score an
  * exact 0.0 from-scratch and are absent here — the `score > 0`
  * relevance cut both entries apply makes the two result sets equal
  * (every hit doc's score is strictly positive: the rational idf is
  * > 0 while df ≤ n_docs).
  *
  * 100 TB shape: the per-query read is |probed terms' live postings| +
  * an O(#commits) stat-cell merge + a broadcast of two one-row frames —
  * corpus-independent; the one shuffle is the per-doc tf pivot over the
  * matched postings (≪ corpus). Daily maintenance is ∝ the batch.
  */
object LexIndex {

  private val App = "incr_bm25"
  /** Bucket count for the postings table — the corpus's fixed layout
    * parameter (thousands at 100 TB); 8 locally, matching the other
    * standing index tables. */
  private val IdxBuckets = 8
  /** Relevance-cut length served by the entries (q_bm25's contract). */
  private val TopK = 20

  /** Inverted-index rows of a (doc_id, text) frame: one row per
    * (term, doc) with tf > 0, carrying the doc length. The tokenize +
    * per-doc term count shuffles ONLY this frame (batch-sized in the
    * daily loop). `tk` = md5Long(term) is the integral cluster key the
    * manifest stats ride; bucketing is by the `term` string itself so
    * probe literals prune buckets. */
  private[graft] def postingsOf(d: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    d.select(col("doc_id"), size(t).cast("long").as("dl"),
        explode(t).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .select(LlmOps.md5Long(col("term")).as("tk"), col("term"),
        col("doc_id"), col("tf"), col("dl"))
  }

  /** One (n_docs, sum_dl) stat-cell row for a (doc_id, text) frame,
    * signed: +1 for admission, −1 for retraction (sum-mergeable, the
    * CMS-cell discipline). */
  private[graft] def statsDelta(d: DataFrame, sign: Int): DataFrame =
    d.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg((count(lit(1)) * sign).cast("long").as("n_docs"),
        (coalesce(sum(col("dl")), lit(0L)) * sign).cast("long").as("sum_dl"))

  /** Create the two standing lexical tables from a corpus frame:
    * bucketed postings at v0 and the stat-cell log seeded with the
    * corpus totals. (Tombstone tables are created by the retraction
    * fixtures/capstones that need them —
    * [[graft.io.TxTable.createTombTable]].) */
  private[graft] def buildLexTables(spark: SparkSession, corpus: DataFrame,
      postT: String, statsT: String): Unit = {
    val c = corpus.select(col("doc_id"), col("text"))
    TxTable.createBucketed(spark, postT, postingsOf(c),
      "tk", Seq("term"), IdxBuckets)
    TxTable.createEmpty(statsT, StructType(Seq(
      StructField("n_docs", LongType), StructField("sum_dl", LongType))),
      "n_docs")
    TxTable.appendBatch(spark, statsT, s"${App}_seed", 0L,
      statsDelta(c, 1), nFiles = 1)
  }

  /** Admit a (doc_id, text) batch into the standing index: bucket-
    * preserving postings append (≤ nBuckets files per day) + one
    * positive stat cell, each exactly-once under `txn`. Batch-only
    * work: the corpus is never re-tokenized. */
  private[graft] def admitDocs(spark: SparkSession, batch: DataFrame,
      postT: String, statsT: String,
      txn: Option[(String, Long)] = None): Unit = {
    val b = batch.select(col("doc_id"), col("text"))
    def put(root: String, df: DataFrame, nFiles: Int): Unit = txn match {
      case Some((app, bid)) =>
        TxTable.appendBatch(spark, root, app, bid, df, nFiles = nFiles)
      case None => TxTable.append(spark, root, df, nFiles = nFiles)
    }
    put(postT, postingsOf(b), IdxBuckets)
    put(statsT, statsDelta(b, 1), 1)
  }

  /** Retract a delete batch from the standing index: ONE tombstone
    * commit (via [[Incremental.retractDocs]] — the shared unique-keyed
    * tombstone contract) + one NEGATED stat cell from the pre-image
    * texts. `dropped` must be the exact (doc_id, text) pre-image slice
    * (module doc — the change feed guarantees it). */
  private[graft] def retractDocs(spark: SparkSession, dropped: DataFrame,
      tombT: String, statsT: String, deletedAtV: Long = 0L,
      txn: Option[(String, Long)] = None): Unit = {
    Incremental.retractDocs(spark, dropped.select(col("doc_id")),
      tombT, deletedAtV, txn)
    txn match {
      case Some((app, bid)) =>
        TxTable.appendBatch(spark, statsT, app, bid,
          statsDelta(dropped, -1), nFiles = 1)
      case None => TxTable.append(spark, statsT, statsDelta(dropped, -1))
    }
  }

  /** The served per-document score frame (doc_id, dl, score) for the
    * fixed [[Pipeline.Bm25Terms]] query — the standing-index twin of
    * [[Pipeline.bm25Scores]] restricted to docs with ≥ 1 probed-term
    * hit (module doc: the `score > 0` cut makes the two equal).
    * Reads: the probed terms' postings (bucket-pruned TWICE — in the
    * manifest's own listFiles and by Spark's bucket set), the optional
    * tombstone mask (broadcast anti-join above it), the stat-cell
    * merge, and the per-term df fold over the SAME matched rows.
    *
    * Both df and tf derive from ONE posting-uniqueness fold keyed on
    * (term, doc_id, dl) — max-folded tf, df = row count of the folded
    * frame — so a duplicate (term, doc) posting (a re-admission outside
    * the txn watermark) degrades BOTH consistently instead of inflating
    * df while tf max-folds (r18 advice). The fold is also what keeps
    * the scan BUCKETED in the production plan: its grouping keys
    * contain the bucket column, so the scan's HashPartitioning(term)
    * satisfies the aggregation's distribution with zero Exchange and
    * DisableUnnecessaryBucketedScan leaves the bucketed scan (and its
    * SelectedBucketsCount pruning) in place — no session knob. */
  private[graft] def servedScores(spark: SparkSession, postT: String,
      statsT: String, tombT: Option[String]): DataFrame = {
    val terms = Pipeline.Bm25Terms
    val matched0 = TxRelation.read(spark, postT)
      .filter(col("term").isin(terms: _*))
    val matched = tombT.fold(matched0)(t =>
      matched0.join(TxRelation.read(spark, t).select(col("doc_id")),
        Seq("doc_id"), "left_anti"))
    val uniq = matched.groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(max(col("tf")).as("tf"))
    // df = live postings rows per term, as a WINDOW over the SAME scan
    // (the servedScoresMulti device, unified here per the r19 verdict:
    // the old separate df aggregate was a SECOND pruned pass over the
    // postings). The bucketed scan's HashPartitioning(term) satisfies
    // the fold and the window with zero Exchange.
    val withDf = uniq.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))).cast("long"))
    val glob = TxRelation.read(spark, statsT)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // pivot tf AND df per doc: a term with no hit in a doc contributes
    // an EXACT 0.0 to the score sum regardless of its df (the written
    // IEEE sequence multiplies a finite idf by tf = 0), so pivoting df
    // as 0 for missing terms is bit-identical to broadcasting the
    // global per-term df — proved by the unchanged q_incr_bm25 hashes
    val pivotCols = terms.indices.flatMap(i => Seq(
      coalesce(max(when(col("term") === terms(i), col("tf"))), lit(0L))
        .as(s"tf$i"),
      coalesce(max(when(col("term") === terms(i), col("df"))), lit(0L))
        .as(s"df$i")))
    val perDoc = withDf.groupBy(col("doc_id"), col("dl"))
      .agg(pivotCols.head, pivotCols.tail: _*)
    perDoc.crossJoin(broadcast(glob))
      .select(col("doc_id"), col("dl"),
        round(Pipeline.bm25ScoreExpr, 6).as("score"))
  }

  // ---------------------------------------------------------------------
  // BATCHED MULTI-QUERY SERVING (r19: parameterized retrieval probes).
  // Production serving is a STREAM of queries, not a compile-time
  // literal: the probe arrives as a RELATION (query_id, term) and N
  // queries are served in ONE pass over the standing postings store —
  // per-query work ∝ its terms' postings, scan count independent of N.
  // ---------------------------------------------------------------------

  /** The fixed probe BATCH the q_bm25_multi entry serves (4 queries of
    * 1–3 terms over the synthetic corpus vocabulary — mixed df spread).
    * ONE constant feeds the Spark probe relation AND the oracle's
    * VALUES list (the seeded-constant discipline, SURVEY §9.8). */
  val MultiProbes: Seq[(Long, String)] = Seq(
    0L -> "customer", 0L -> "window", 0L -> "stream",
    1L -> "hash", 1L -> "join",
    2L -> "vector", 2L -> "scan", 2L -> "filter",
    3L -> "spark")
  /** Retrieved-list length per query. */
  private val MultiTopK = 10
  /** Fixed-point scale for the per-term score: summing DOUBLE term
    * scores per (query, doc) would be order-nondeterministic (IEEE
    * addition is not associative, and both engines aggregate in
    * arbitrary order), so each term's score — itself a fixed written
    * IEEE sequence over exact LONGs — is floored to integer
    * MICRO-UNITS first and the per-query fold sums BIGINTs: exact,
    * order-free, bit-equal across engines (the SURVEY §9 micro-unit
    * discipline). 1e-6 quantization is far below ranking significance
    * (corpus scores are O(1..10⁴)). */
  private val ScoreScale = 1000000.0

  /** Serve a probe RELATION (query_id, term) against the standing
    * index in one pass: postings are filtered to `probeTerms` — the
    * batch's bounded distinct-term set, driver-known the way the IVF
    * serve knows its probed cell ids, which is what lets the literal
    * predicate bucket-prune the scan — then per-term df rides a window
    * OVER THE SAME SCAN (count per term partition; the bucketed scan's
    * HashPartitioning(term) satisfies both the uniqueness fold and the
    * window with zero Exchange), the tiny probe/stat frames broadcast,
    * and scoring folds per (query_id, doc_id) in micro-units. Output:
    * (query_id, rank, doc_id, score_u), top-[[MultiTopK]] per query.
    * At 100 TB: ONE bucket-pruned pass over |batch's terms' postings|
    * serves the whole batch — no per-query re-plan, no corpus scan. */
  private[graft] def servedScoresMulti(spark: SparkSession, postT: String,
      statsT: String, tombT: Option[String], probes: DataFrame,
      probeTerms: Seq[String]): DataFrame = {
    val matched0 = TxRelation.read(spark, postT)
      .filter(col("term").isin(probeTerms: _*))
    val matched = tombT.fold(matched0)(t =>
      matched0.join(TxRelation.read(spark, t).select(col("doc_id")),
        Seq("doc_id"), "left_anti"))
    val uniq = matched.groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(max(col("tf")).as("tf"))
    // df = live postings rows per term (rows are unique per (term,doc)
    // after the fold) — a window on the SAME pass, not a second scan
    val withDf = uniq.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))).cast("long"))
    val glob = TxRelation.read(spark, statsT)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val perRow = withDf
      .join(broadcast(probes), Seq("term"))
      .crossJoin(broadcast(glob))
      .select(col("query_id"), col("doc_id"),
        floor(Pipeline.bm25TermScoreExpr(col("tf"), col("df")) *
          lit(ScoreScale)).cast("long").as("su"))
    val perQueryDoc = perRow.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("su")).as("score_u"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("doc_id"))
    perQueryDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= MultiTopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_u"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[servedScoresMulti]] with the pruning term set derived FROM the
    * probe relation itself — one bounded driver collect (the batch's
    * distinct terms, ≤ the serving batch size: the IVF probed-cell-ids
    * discipline, never data-scaled), so the operator is fully
    * relation-driven: hand it any (query_id, term) micro-batch and the
    * scan still prunes to that batch's terms. */
  private[graft] def servedScoresMultiOf(spark: SparkSession,
      postT: String, statsT: String, tombT: Option[String],
      probes: DataFrame): DataFrame = {
    val terms = probes.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    servedScoresMulti(spark, postT, statsT, tombT, probes, terms)
  }

  /** B22/B24 batched serving: [[MultiProbes]] served from the standing
    * grown index in one pass, through the fully relation-driven door
    * ([[servedScoresMultiOf]] — the entry hands the operator ONLY the
    * probe relation). Oracle: the identical micro-unit arithmetic
    * replayed from the corpus (grown index ≡ full corpus — the
    * q_incr_bm25 contract). */
  def qBm25Multi(spark: SparkSession, sfDir: String): DataFrame = {
    val (postT, statsT) = buildGrownIndex(spark, sfDir)
    val probes = spark.createDataFrame(MultiProbes)
      .toDF("query_id", "term")
    servedScoresMultiOf(spark, postT, statsT, tombT = None, probes)
  }

  private def bm25MultiOracle: String = {
    val values = MultiProbes
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }
      .mkString(", ")
    s"""WITH probes(query_id, term) AS (VALUES $values),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |         FROM documents),
       |gstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM toks),
       |live AS (
       |  SELECT pt.term, tk.doc_id,
       |    CAST(len(list_filter(tk.t, x -> x = pt.term)) AS BIGINT) AS tf,
       |    CAST(len(tk.t) AS BIGINT) AS dl
       |  FROM (SELECT DISTINCT term FROM probes) pt CROSS JOIN toks tk
       |  WHERE len(list_filter(tk.t, x -> x = pt.term)) > 0),
       |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |        FROM live GROUP BY term),
       |su AS (
       |  SELECT p.query_id, l.doc_id,
       |    CAST(floor(${Pipeline.bm25TermScoreSql} * $ScoreScale)
       |      AS BIGINT) AS su
       |  FROM probes p
       |  JOIN (SELECT l.term, l.doc_id, l.tf, l.dl, d.df
       |        FROM live l JOIN dfs d ON d.term = l.term) l
       |    ON l.term = p.term
       |  CROSS JOIN gstats),
       |scored AS (SELECT query_id, doc_id,
       |             CAST(sum(su) AS BIGINT) AS score_u
       |           FROM su GROUP BY query_id, doc_id)
       |SELECT query_id, rank, doc_id, score_u FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_u DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $MultiTopK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Physical deletion between rebuilds: per-bucket postings
    * compaction under the tombstone mask (bucket placement and
    * watermarks survive — [[graft.io.TxTable.compactBuckets]]), the
    * stat-cell fold (overwrite with the summed row, the IncrSketchSpec
    * fold-invariance discipline), and the CONSUMED-TOMBSTONE fold:
    * once no dead posting remains, the mask must not outlive it — a
    * retracted doc_id must be re-admittable through the change feed
    * (delete-then-reinsert, r18 advice), and the serve path's
    * anti-join must not scan an ever-growing tombstone log. The
    * tombstone snapshot is PINNED first; rows retracted by a racing
    * commit keep their (unconsumed) tombstones. Crash between the
    * purge and the fold leaves reads unchanged (anti-join of absent
    * rows) and the next compaction completes the fold; a re-admission
    * in that window stays masked only until then. Reads are invariant
    * throughout (RetractE2eSpec's composed-compaction case). */
  private[graft] def compactLexIndex(spark: SparkSession, postT: String,
      statsT: String, tombT: String): Unit = {
    val tombV = TxTable.versions(tombT).max
    val tombs = TxRelation.read(spark, tombT, Some(tombV))
      .select(col("doc_id"))
    TxTable.compactBuckets(spark, postT,
      _.join(tombs, Seq("doc_id"), "left_anti")
        .select(col("tk"), col("term"), col("doc_id"), col("tf"),
          col("dl")))
    TxTable.overwrite(spark, statsT, TxRelation.read(spark, statsT)
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_dl")).cast("long").as("sum_dl")))
    TxTable.dropFilesAsOf(tombT, tombV)
  }

  /** This tier's [[Propagate.Maintenance]] hook for the fan-out
    * driver: when the tombstone or stat-cell log outgrows `maxFiles`
    * (manifest-only check), run [[compactLexIndex]] — dead postings
    * purge + stat fold + consumed-tombstone fold, read-invariant
    * throughout. */
  private[graft] def maintenance(spark: SparkSession, postT: String,
      statsT: String, tombT: String,
      maxFiles: Int = 64): Propagate.Maintenance =
    Propagate.Maintenance("bm25",
      due = () => Propagate.logFilesExceed(tombT, maxFiles)() ||
        Propagate.logFilesExceed(statsT, maxFiles)(),
      run = () => compactLexIndex(spark, postT, statsT, tombT))

  /** q_bm25's relevance cut over a served score frame. */
  private def topServed(scored: DataFrame): DataFrame =
    scored.filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(TopK)

  /** The capstones' (rank, doc_id, dl, score) readout shape: the
    * relevance cut with explicit ranks (window over ≤ TopK rows — the
    * [[Retrieval]] fusion idiom). */
  private[graft] def rankedTop(scored: DataFrame): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    topServed(scored)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("dl"), col("score"))
  }

  // ---------------------------------------------------------------------
  // Session-idempotent fixtures (the Incremental.buildIndexes memo
  // discipline: content-stamp keyed, pid-scoped roots, dead-pid reap).
  // Production persists these tables; the queries never build them.
  // ---------------------------------------------------------------------

  private val built =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private def idxRoot(kind: String, sfDir: String): String =
    "/tmp/graft_txlex_" + kind + "_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  private def stamp(spark: SparkSession, sfDir: String): String =
    s"${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")

  /** GROWN fixture: index built on the standing-corpus split
    * (doc_id % 10 < 8, the [[Incremental]] contract), then the batch
    * (% 10 ≥ 8) admitted exactly-once — the daily cycle. The live
    * index covers the FULL corpus, so the oracle is the from-scratch
    * BM25 over all documents. */
  private[graft] def buildGrownIndex(spark: SparkSession, sfDir: String)
      : (String, String) = {
    val postT = idxRoot("post", sfDir)
    val statsT = idxRoot("stats", sfDir)
    val key = s"grow:${stamp(spark, sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"), "graft_txlex_")
        Seq(postT, statsT).foreach { t =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
        }
        val docs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        buildLexTables(spark, docs.filter(!Incremental.isBatch),
          postT, statsT)
        admitDocs(spark, docs.filter(Incremental.isBatch),
          postT, statsT, txn = Some((App, 1L)))
        built.add(key)
      }
    }
    (postT, statsT)
  }

  /** DELETE fixture: the grown index on its own roots plus a tombstone
    * table, with the [[Incremental]] dropped slice (doc_id % 10 = 7)
    * retracted exactly-once — live docs are exactly
    * `doc_id % 10 <> 7`. */
  private[graft] def buildDeleteIndex(spark: SparkSession, sfDir: String)
      : (String, String, String) = {
    val postT = idxRoot("delpost", sfDir)
    val statsT = idxRoot("delstats", sfDir)
    val tombT = idxRoot("deltomb", sfDir)
    val key = s"del:${stamp(spark, sfDir)}"
    if (!built.contains(key)) built.synchronized {
      if (!built.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"), "graft_txlex_")
        Seq(postT, statsT, tombT).foreach { t =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
        }
        val docs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        buildLexTables(spark, docs.filter(!Incremental.isBatch),
          postT, statsT)
        TxTable.createTombTable(tombT, "doc_id")
        admitDocs(spark, docs.filter(Incremental.isBatch),
          postT, statsT, txn = Some((App, 1L)))
        retractDocs(spark, docs.filter(Incremental.isDroppedDoc),
          tombT, statsT, deletedAtV = 2L, txn = Some((App, 2L)))
        built.add(key)
      }
    }
    (postT, statsT, tombT)
  }

  /** B22/B24 standing tier: q_bm25's top-20 SERVED from the standing
    * postings + stat cells after one admission cycle — identical
    * contract (and oracle shape) to the from-scratch q_bm25, proving
    * the index serves the exact corpus state. */
  def qIncrBm25(spark: SparkSession, sfDir: String): DataFrame = {
    val (postT, statsT) = buildGrownIndex(spark, sfDir)
    topServed(servedScores(spark, postT, statsT, tombT = None))
  }

  /** The retraction tier: the same serve path under the tombstone mask
    * + negated stat cells. Oracle: from-scratch BM25 on the survivor
    * corpus — the established rebuild contract. */
  def qIncrBm25Del(spark: SparkSession, sfDir: String): DataFrame = {
    val (postT, statsT, tombT) = buildDeleteIndex(spark, sfDir)
    topServed(servedScores(spark, postT, statsT, tombT = Some(tombT)))
  }

  /** From-scratch BM25 top-[[TopK]] over a restricted corpus — the
    * oracle for both entries and (rank-projected) for the capstones. */
  private[graft] def bm25TopSqlWhere(where: String): String =
    s"""WITH ${Pipeline.bm25ScoreCtesWhere(where)}
       |SELECT doc_id, dl, score FROM bmscored
       |WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin

  /** The capstones' (rank, doc_id) oracle projection. */
  private[graft] def bm25RankedSqlWhere(where: String): String =
    s"""WITH ${Pipeline.bm25ScoreCtesWhere(where)}
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |    AS BIGINT) AS rank, doc_id
       |FROM (SELECT doc_id, score FROM bmscored WHERE score > 0
       |      ORDER BY score DESC, doc_id LIMIT $TopK) t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incr_bm25" -> (qIncrBm25 _),
    "q_incr_bm25_del" -> (qIncrBm25Del _),
    "q_bm25_multi" -> (qBm25Multi _))

  val oracle: Map[String, String] = Map(
    "q_incr_bm25" -> bm25TopSqlWhere(""),
    // fresh stats on the surviving corpus — the retraction contract
    "q_incr_bm25_del" -> bm25TopSqlWhere("WHERE doc_id % 10 <> 7"),
    "q_bm25_multi" -> bm25MultiOracle)
}
