package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{Tables, TxRelation, TxTable}
import graft.ops.{GraphAnn, Incremental, IngestE2e, LlmOps, Multimodal,
  Sketches}

/** The ingest capstone's DAILY LOOP as a real streaming pipeline — the
  * GROWTH twin of RetractE2eSpec: ONE append commit on the corpus tx
  * table flows through ONE `tx-cdf` streaming feed into EVERY standing
  * consumer (dedup flag→admit, graph admission, batch-encode IVFPQ
  * admission, CMS positive cells, image-index admission, BM25 postings
  * + stat-cell admission), each landing
  * it exactly-once. Pins per-consumer replay absorption inside the
  * batch, catastrophic feed-checkpoint loss (a fresh re-drain replays
  * ALL history — the seed commit included — and the shared txn
  * watermark swallows every batch), and end-state equality with
  * from-scratch builds on the grown corpus per tier. */
class IngestE2eSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val base = s"/tmp/graft_inge2e_spec_p${ProcessHandle.current.pid}"
  private val corpT = s"$base/corpus"
  private val st = IngestE2e.Stores(corpT,
    s"$base/fp", s"$base/band", s"$base/sig",
    s"$base/ge", s"$base/gb", s"$base/pq", s"$base/cms", s"$base/ph",
    s"$base/lex", s"$base/lexst")

  private def allStores = Seq(st.fpT, st.bandT, st.sigT, st.eroot, st.broot,
    st.croot, st.cmsT, st.phT, st.lexT, st.lexStatsT)

  /** Drain the feed through THE library fan-out driver
    * ([[graft.ops.Propagate]] — feed wiring, AvailableNow drain, and
    * the commit_v txn keying live THERE now, not in this spec);
    * `consume = false` is the driver's `subscribe` (park the
    * checkpoint at the head without applying — the wire-at-build-time
    * step). */
  private def drain(ckpt: String, consume: Boolean): Unit = {
    val ok =
      if (!consume) graft.ops.Propagate.subscribe(spark, corpT, ckpt)
      else graft.ops.Propagate.runFanoutLoop(spark, corpT, ckpt,
        apply = { (batch, commitV) =>
          if (!batch.filter(col("change_type") === "insert").isEmpty) {
            IngestE2e.propagateIngest(spark, sf, st, batch, commitV)
            val vs = allStores.map(r => TxTable.versions(r).max)
            // crash between store commits and checkpoint advance =
            // redelivery; every consumer must absorb it
            IngestE2e.propagateIngest(spark, sf, st, batch, commitV)
            allStores.map(r => TxTable.versions(r).max) shouldBe vs
          }
        })
    ok shouldBe true
  }

  test("one append commit → one CDF feed → every tier admits exactly-once; end state = grown-corpus builds") {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    IngestE2e.buildAllTiers(spark, sf, st)
    val feedCkpt = s"$base/feed_ckpt"
    // subscribe at store-build time: the no-op drain parks the
    // checkpoint past the seed commit (production wires the consumer
    // when the stores are first built, before any ingest)
    drain(feedCkpt, consume = false)

    // THE ingest: day 1 lands as one append commit
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val day1 = docs.filter(IngestE2e.day1Col("doc_id"))
    TxTable.appendBatch(spark, corpT, "inge2e_src", 1L, day1)
    drain(feedCkpt, consume = true)

    // catastrophic FEED-checkpoint loss: the fresh drain replays ALL
    // history (seed commit included, which the live consumers never
    // legitimately processed) — the shared txn watermark must swallow
    // every replayed batch without a single commit anywhere
    val vsAfter = allStores.map(r => TxTable.versions(r).max)
    drain(s"$base/feed_ckpt_lost", consume = true)
    allStores.map(r => TxTable.versions(r).max) shouldBe vsAfter

    val grownDocs = docs.filter(!IngestE2e.day2Col("doc_id"))

    // corpus: the table holds corpus ∪ day 1
    TxTable.countRows(corpT) shouldBe grownDocs.count()

    // dedup: the maintenance cycle's closing invariant — re-presenting
    // day 1 keeps NOTHING (every doc is flagged: admitted docs
    // exact-dup on their own fingerprints, dropped near-dups still
    // near-dup their corpus neighbors), and every doc that WAS kept on
    // day 1 now exact-dups specifically
    val represented = Incremental.idxFlagsFor(day1,
      TxRelation.read(spark, st.fpT), TxRelation.read(spark, st.bandT),
      TxRelation.read(spark, st.sigT))
    represented.filter(col("kept") === 1).count() shouldBe 0L
    val corpusDocs = docs.filter(IngestE2e.corpusCol("doc_id"))
    val csig = Incremental.signatures(corpusDocs)
    val kept1 = Incremental.idxFlagsFor(day1,
        corpusDocs.select(md5(col("text")).as("cfp")).distinct(),
        Incremental.bandsOf(csig),
        csig.select(col("doc_id"), col("shs"), col("n")))
      .filter(col("kept") === 1).select("doc_id")
    kept1.count() should be > 0L
    represented.join(kept1, "doc_id")
      .filter(col("exact_dup") =!= 1).count() shouldBe 0L

    // graph: the admitted store ≡ a from-scratch build on the grown set
    val e = Tables.embeddings(spark, sf)
    val grownVecs = e.filter(!IngestE2e.day2Col("vec_id"))
    val admitted = GraphAnn.readGraph(spark, st.eroot, sf)
      .select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")
      .collect()
    val rebuilt = GraphAnn.knnEdgesFrom(spark, grownVecs)
      .select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")
      .collect()
    admitted shouldBe rebuilt

    // IVFPQ: the admitted codes store ≡ the whole-grown-set encode,
    // row for row (batch-encode determinism)
    val stored = TxRelation.read(spark, st.croot)
      .orderBy("vec_id", "m").collect().toSeq
    val (_, codes, _, _) = LlmOps.ivfPqPartsEncoding(spark, sf,
      _.filter(!IngestE2e.day2Col("vec_id")))
    stored shouldBe codes.select(stored.head.schema.fieldNames
      .map(col): _*).orderBy("vec_id", "m").collect().toSeq

    // CMS: the summed cell log ≡ the from-scratch grown-corpus sketch
    TxRelation.read(spark, st.cmsT)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
      .orderBy("j", "bucket").collect().toSeq shouldBe
      Sketches.cmsCells(grownDocs).orderBy("j", "bucket").collect().toSeq

    // image index: day-2 probes against the admitted store ≡ a fresh
    // band relation of the grown corpus
    val day2Bands = Multimodal.phashBandsFolded(
      Multimodal.phashFrameWhere(spark, sf, IngestE2e.day2Col("doc_id")))
    Multimodal.phashNearAgainst(day2Bands,
        TxRelation.read(spark, st.phT))
      .orderBy("doc_id").collect().toSeq shouldBe
      Multimodal.phashNearAgainst(day2Bands,
          Multimodal.phashBandsFolded(Multimodal.phashFrameWhere(
            spark, sf, !IngestE2e.day2Col("doc_id"))))
        .orderBy("doc_id").collect().toSeq

    // lexical tier: the grown standing postings + merged stat cells
    // serve the same scores as from-scratch BM25 on the grown corpus
    val lexServed = graft.ops.LexIndex.servedScores(spark, st.lexT,
        st.lexStatsT, tombT = None)
      .orderBy("doc_id").collect().toSeq
    val lexFresh = graft.ops.Pipeline.bm25ScoresOf(grownDocs)
      .filter(col("score") > 0).orderBy("doc_id").collect().toSeq
    lexServed shouldBe lexFresh
    lexServed.size should be > 0

    // the growth ledger closes on the admitted commit: every consumer
    // applied the ingest commit (v1) and reads caught_up
    graft.ops.RetractE2e.fanoutStatus(spark, corpT,
        IngestE2e.consumerTables(st), app = "ingest_e2e")
      .collect().foreach { r =>
        r.getLong(1) shouldBe 1L
        r.getLong(2) shouldBe 1L
        r.getLong(3) shouldBe 1L
      }

    // growth-side log bounding: daily admissions accumulate one
    // commit's files per store per day; the driver's post-drain
    // maintenance re-packs them (pure placement-preserving re-pack —
    // no tombstones on this path), reads unchanged
    val packed = Seq(st.fpT, st.bandT, st.sigT, st.lexT, st.croot, st.phT)
    val filesBefore = packed.map(r => TxTable.snapshot(r).files.size)
    graft.ops.Propagate.runFanoutLoop(spark, corpT,
      s"$base/feed_ckpt_maint", apply = (_, _) => (),
      maintenance = IngestE2e.maintenanceHooks(spark, st, maxFiles = 0)
    ) shouldBe true
    val filesAfter = packed.map(r => TxTable.snapshot(r).files.size)
    filesAfter.zip(filesBefore).foreach { case (a, b) => a should be <= b }
    filesAfter.sum should be < filesBefore.sum
    // the compacted stores still serve the grown truth (lexical tier,
    // the cheapest full-frame check) and the ledger is undisturbed —
    // maintenance commits carry no (app) txn actions
    graft.ops.LexIndex.servedScores(spark, st.lexT, st.lexStatsT,
        tombT = None)
      .orderBy("doc_id").collect().toSeq shouldBe lexFresh
    graft.ops.RetractE2e.fanoutStatus(spark, corpT,
        IngestE2e.consumerTables(st), app = "ingest_e2e")
      .collect().foreach(r => r.getLong(3) shouldBe 1L)
  }
}
