package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Retrieval-composition operators — the layer a training-data pipeline
  * runs ABOVE the per-system rankers it already has: hybrid
  * lexical+dense fusion (the standard retrieval front-end for
  * decontamination and targeted data curation) and predicate-filtered
  * ANN (the "vector search WHERE ..." every production vector store
  * serves). Both compose existing scale-audited shapes — BM25
  * ([[Pipeline.bm25Scores]]), brute/banded cosine ([[LlmOps]]) — so the
  * scale story is inherited, and both are exact-match oracled.
  *
  * Reference: public RRF formulation (Cormack, Clarke & Buettcher,
  * SIGIR'09: score = Σ_systems 1/(k + rank), k = 60); filtered ANN is
  * the standard metadata-constrained search surface (e.g. FAISS
  * IDSelector / vector-store `filter=` parameters).
  */
object Retrieval {
  private def dot(a: Column, b: Column): Column = VectorForms.dot(a, b)
  private def sumSq(c: Column): Column = VectorForms.sumSq(c)

  /** RRF's rank-damping constant (the literature's fixed k=60). */
  val RrfK = 60
  /** Per-system retrieved-list length fused by [[qHybridRrf]]. */
  val RrfLen = 50

  /** B22/B24 composition: HYBRID RETRIEVAL via reciprocal-rank fusion —
    * fuse the BM25 lexical top-R (the fixed [[Pipeline.Bm25Terms]]
    * query) with the dense cosine top-R (query = vec_id 0's embedding)
    * as `rrf = Σ 1/(60 + rank)`, one term per system that retrieved
    * the document. Ranks are over ROUNDED scores with id tiebreaks
    * (both engines rank identical values), the fusion arithmetic is a
    * fixed two-term IEEE sum of exact integer-denominator divisions,
    * and absence contributes exactly 0 — so the fused list is
    * exact-match oracled, not approximately compared.
    *
    * Scale shape: each system ends in TakeOrderedAndProject (top-R, no
    * global sort); rank assignment is a window over ≤R rows; the
    * fusion is a full-outer join of two ≤R-row lists. At 100 TB the
    * cost IS the two retrievals — both already scale-audited shapes
    * (BM25: one stats row broadcast over a scan; dense: broadcast
    * probe over a scan) — and the fusion layer adds driver-scale work
    * regardless of corpus size. */
  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame =
    // lexical system: per-doc BM25 scores (shared body with q_bm25),
    // retrieved list = positive-score top-R
    hybridRrfFrom(spark, sfDir, Pipeline.bm25Scores(spark, sfDir))

  /** The SAME hybrid contract with the lexical arm SERVED from the
    * standing BM25 index ([[LexIndex]] — r17 verdict item 1's "wire
    * the lexical arm" clause): served scores are bit-equal to
    * from-scratch over the hit docs, and the positive-score top-R cut
    * reads only hit docs, so the fused list is IDENTICAL — one oracle
    * text gates both physical tiers (the q_incr_dedup/_idx pattern).
    * At 100 TB this makes the hybrid front-end's per-query cost the
    * two retrievals' SERVE paths only: pruned postings + stat cells on
    * the lexical side, the broadcast probe scan on the dense side —
    * no corpus recompute anywhere. */
  def qHybridRrfIdx(spark: SparkSession, sfDir: String): DataFrame = {
    val (postT, statsT) = LexIndex.buildGrownIndex(spark, sfDir)
    hybridRrfFrom(spark, sfDir,
      LexIndex.servedScores(spark, postT, statsT, tombT = None))
  }

  /** RRF fusion over any per-doc lexical score frame (doc_id, score) —
    * ONE body so the from-scratch and standing-index tiers can never
    * drift. */
  private def hybridRrfFrom(spark: SparkSession, sfDir: String,
      lexScores: DataFrame): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val lexTop = lexScores
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RrfLen)
    val wLex = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = lexTop // window input is the ≤R-row retrieved list
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    // dense system: cosine to the fixed probe embedding (vec_id 0)
    val denTop = denseTop(spark, sfDir, RrfLen, "cos_sim", carryVec = false)
    val wDen = Window.orderBy(col("cos_sim").desc, col("vec_id"))
    val den = denTop
      .withColumn("dense_rank", row_number().over(wDen).cast("long"))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    // fusion: one reciprocal term per system that retrieved the doc;
    // NULL rank (not retrieved) contributes exactly 0.0
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("lex_rank")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("dense_rank")),
            lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Probe-batch size and per-query depth for [[qSimTopkMulti]]. */
  private val MultiQ = 4
  private val MultiK = 5

  /** B24 batched serving (r19: parameterized retrieval probes): a
    * probe RELATION (qid, qv) — here the fixed batch vec_id <
    * [[MultiQ]]; in production the micro-batch of arriving queries —
    * served in ONE corpus pass: probes broadcast over a single
    * embeddings scan, per-(probe, vector) rounded cosine, top-[[MultiK]]
    * per query via a qid-partitioned rank. N queries cost one scan +
    * N·|corpus| codegen'd dot products, not N plans; this is the
    * exact-scoring twin of the standing-store probe-relation serves
    * (the lexical [[LexIndex]] multi-probe join, [[GraphAnn]]'s
    * annServeCore whose probe side is already an unbounded relation). */
  def qSimTopkMulti(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < MultiQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    e.select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= MultiK)
      .orderBy("qid", "rank")
  }

  private def simTopkMultiOracle: String =
    s"""WITH nv AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qnrm
       |      FROM nv WHERE vec_id < $MultiQ),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    round(list_sum(list_transform(list_zip(e.embedding, q.qv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (e.nrm * q.qnrm), 6) AS cos_sim
       |  FROM nv e CROSS JOIN q WHERE e.vec_id <> q.qid)
       |SELECT qid, vec_id, cos_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $MultiK ORDER BY qid, rank""".stripMargin

  /** The fixed metadata predicate [[qAnnFiltered]] searches under (an
    * even label — ~half the corpus; any catalog/source/date predicate
    * in production). */
  private[graft] def annFilter: Column = col("label") % 2 === 0

  /** B24: PREDICATE-FILTERED ANN — top-k nearest neighbors among the
    * corpus vectors satisfying a metadata predicate, through the SAME
    * banded random-hyperplane candidate tier as q_dedup_cosine (4
    * tables × 3 bits on the seeded plane pool). The predicate is
    * applied to the corpus side BEFORE banding — it sits below the
    * band explode in the optimized plan (RetrievalSpec pins it; modulo
    * itself isn't parquet-translatable, so scan-level pruning is
    * IsNotNull only), so candidate volume (and every downstream byte)
    * scales with the predicate's selectivity rather than
    * post-filtering a full result. Probes = vec_id < 3,
    * k = 5, exact rounded-cosine rescore, id tiebreaks. The generated
    * oracle replays the banding + predicate, so the filtered result is
    * exact-checked AT the index's own recall (the honest contract all
    * the banded tiers share).
    *
    * At 100 TB: with a standing band-keyed index (the [[GraphAnn]]
    * bucketed store), this probe is L bucket-pruned equi-joins whose
    * corpus side the predicate prunes first — selectivity × occupancy
    * rows per probe, corpus-independent. */
  def qAnnFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val probes = LlmOps.bandedKeys(e.filter(col("vec_id") < 3),
      tables = 4, bits = 3)
    val corpus = LlmOps.bandedKeys(e.filter(annFilter),
      tables = 4, bits = 3)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.as("q").join(corpus.as("c"),
        col("q.bkey") === col("c.bkey") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vec_id"),
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6).as("cos_sim"))
      .distinct() // a pair may collide in several tables
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** Spec-only ground truth for [[qAnnFiltered]]'s recall measurement:
    * brute-force filtered top-5 (same predicate, same rounding, same
    * tiebreaks, no candidate tier). */
  private[graft] def annFilteredBrute(spark: SparkSession,
      sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    e.filter(annFilter)
      .select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** Generated oracle for [[qAnnFiltered]]: the banded (band, key)
    * join with the probe/predicate split — the plane inlining comes
    * from the SAME generator every banded dedup oracle uses
    * ([[LlmOps.bandStructsSql]]), so the scheme cannot drift between
    * the two surfaces. */
  private def annFilteredOracle(tables: Int, bits: Int): String = {
    val bandStructs = LlmOps.bandStructsSql(tables, bits)
    s"""WITH vecs AS (
       |  SELECT vec_id, label, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    unnest($bandStructs) AS bk
       |  FROM embeddings),
       |flat AS (SELECT vec_id, label, embedding, nrm,
       |    bk.band AS band, bk.key AS key
       |  FROM vecs),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id,
       |    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (q.nrm * c.nrm), 6) AS cos_sim
       |  FROM flat q JOIN flat c
       |    ON q.band = c.band AND q.key = c.key
       |    AND q.vec_id < 3 AND c.label % 2 = 0
       |    AND q.vec_id <> c.vec_id)
       |SELECT qid, vec_id, cos_sim, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  private def hybridRrfOracle: String =
    s"""WITH ${Pipeline.bm25ScoreCtes},
       |lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |      AS lex_rank
       |  FROM (SELECT doc_id, score FROM bmscored WHERE score > 0
       |        ORDER BY score DESC, doc_id LIMIT $RrfLen)),
       |qv AS (
       |  SELECT embedding AS qv,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnrm
       |  FROM embeddings WHERE vec_id = 0),
       |dscored AS (
       |  SELECT e.vec_id,
       |    round(list_sum(list_transform(list_zip(e.embedding, q.qv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(e.embedding,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qnrm),
       |      6) AS cos_sim
       |  FROM embeddings e, qv q WHERE e.vec_id <> 0),
       |den AS (
       |  SELECT vec_id AS doc_id,
       |    CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT)
       |      AS dense_rank
       |  FROM (SELECT vec_id, cos_sim FROM dscored
       |        ORDER BY cos_sim DESC, vec_id LIMIT $RrfLen))
       |SELECT doc_id, lex_rank, dense_rank,
       |  round(coalesce(1.0 / ($RrfK.0 + lex_rank), 0.0)
       |      + coalesce(1.0 / ($RrfK.0 + dense_rank), 0.0), 6) AS rrf
       |FROM lex FULL OUTER JOIN den USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** MMR trade-off weight (λ of Carbonell & Goldstein '98: score =
    * λ·relevance − (1−λ)·max-similarity-to-selected). */
  val MmrLambda = 0.7
  /** Candidate-list length the rerank diversifies over. */
  val MmrCand = 20
  /** Selections returned. */
  val MmrK = 5

  /** The ONE dense-retrieval shape both consumers rank over: top-`k`
    * by rounded cosine to the fixed probe (vec_id 0), norms hoisted to
    * the per-vector projection as everywhere, id tiebreaks. The
    * hybrid fusion takes (vec_id, score); MMR additionally carries
    * embedding + norm for its pairwise-similarity stage. One body so a
    * probe-convention change (rounding scale, tiebreak) cannot
    * silently diverge the two ops. */
  private def denseTop(spark: SparkSession, sfDir: String, k: Int,
      scoreName: String, carryVec: Boolean): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    val carried =
      if (carryVec) Seq(col("vec_id"), col("embedding"), col("nrm"))
      else Seq(col("vec_id"))
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .select(carried :+
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as(scoreName): _*)
      .orderBy(col(scoreName).desc, col("vec_id"))
      .limit(k)
  }

  /** B24 depth: MMR DIVERSIFICATION RERANK (maximal marginal
    * relevance, Carbonell & Goldstein SIGIR'98) — greedy-select
    * [[MmrK]] of the dense top-[[MmrCand]] maximizing
    * `λ·rel − (1−λ)·max cos to already-selected`: the standard rerank
    * that stops a retrieval front-end returning five near-duplicates
    * of the same document (for training-data curation: diverse
    * exemplars, not one cluster). The greedy rounds are UNROLLED as
    * DataFrame ops over the candidate list (argmax per round =
    * TakeOrderedAndProject(1) on the rounded score, id tiebreak), and
    * the oracle unrolls the identical rounds as CTEs (the
    * [[graft.ops.Pipeline]] BPE oracle's idiom) — so the whole greedy
    * trajectory is exact-match gated, not just the final set.
    *
    * Scale shape: MMR's input is ALWAYS a bounded top-k list (the
    * expensive part is the retrieval that produced it, already
    * scale-audited); every round joins ≤[[MmrCand]]-row frames, so the
    * rerank's cost is corpus-independent by construction. */
  def qMmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    // the iterative-op Ckpt discipline ([[Ckpt]]): each greedy round's
    // 1-row pick is materialized once, and later rounds read the pick
    // CKPTS, not their derivations — without this the recursive
    // selected/remaining references double per round and the final
    // plan re-derives the candidate scan 2^K times (measured: a
    // 2,703-node physical plan for K=5; with ckpts it plans 4 nodes).
    // The pick ckpts stay resident (the returned plan reads them
    // lazily — the final-round rule); the candidate/sims inputs are
    // released once the greedy completes.
    val candC = Ckpt(denseTop(spark, sfDir, MmrCand, "rel", carryVec = true))
    val cand = candC.df
    // pairwise sims among candidates (≤ MmrCand² rows, both directions
    // — the max-to-selected lookup reads ca as candidate, cb as
    // selected)
    val simsC = Ckpt(cand.as("a").join(cand.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("ca"), col("b.vec_id").as("cb"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("sim")))
    val sims = simsC.df
    val base = cand.select(col("vec_id"), col("rel"))
    // round 1: pure relevance (nothing selected to repel from); its
    // reported score is λ·rel, same written form as later rounds with
    // a zero penalty term. ONE checkpoint per round — the 1-row pick —
    // and selected/remaining are derived LAZILY from the pick ckpts
    // (union of ≤K one-row scans / a depth-K anti-join chain over the
    // candidate ckpt), so each round costs exactly one Spark job and
    // nothing is materialized only to be thrown away.
    val pick1 = Ckpt(base
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(1)
      .select(col("vec_id"), lit(1L).as("rank"),
        round(lit(MmrLambda) * col("rel"), 6).as("mmr")))
    val picks = scala.collection.mutable.ArrayBuffer(pick1)
    var selected = pick1.df
    var remaining = base.join(pick1.df.select("vec_id"),
      Seq("vec_id"), "left_anti")
    for (r <- 2 to MmrK) {
      val pickC = Ckpt(remaining
        .join(sims, col("vec_id") === col("ca"))
        .join(selected.select(col("vec_id").as("sid")),
          col("cb") === col("sid"))
        .groupBy(col("vec_id"), col("rel"))
        .agg(max(col("sim")).as("msim"))
        .select(col("vec_id"),
          round(lit(MmrLambda) * col("rel") -
            lit(1.0 - MmrLambda) * col("msim"), 6).as("mmr"))
        .orderBy(col("mmr").desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), lit(r.toLong).as("rank"), col("mmr")))
      picks += pickC
      selected = selected.unionByName(pickC.df)
      remaining = remaining.join(pickC.df.select("vec_id"),
        Seq("vec_id"), "left_anti")
    }
    val out = selected.orderBy("rank")
    // the result reads only the pick ckpts (they stay resident, the
    // documented final-round rule); the candidate/sims inputs can go
    candC.release(); simsC.release()
    out
  }

  /** Generated oracle for [[qMmrRerank]]: candidate/sims CTEs plus the
    * greedy rounds unrolled, each round's argmax the same
    * rounded-score ORDER BY … LIMIT 1. Every CTE is MATERIALIZED —
    * DuckDB 1.0 inlines per REFERENCE, and each round references the
    * previous selection chain three times, so the plain form expands
    * the candidate scan ~3^(K−1) times (the same blow-up the Spark
    * side's pick ckpts prevent; the BPE/graph oracles' idiom). */
  private def mmrOracle: String = mmrOracleRaw
    .replace(" AS (", " AS MATERIALIZED (")

  private def mmrOracleRaw: String = {
    val dotSql = (a: String, b: String) =>
      s"""list_sum(list_transform(list_zip($a.embedding, $b.embedding),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"""
        .stripMargin
    val rounds = (2 to MmrK).map { r =>
      s"""sc$r AS (
         |  SELECT c.vec_id,
         |    round($MmrLambda * c.rel - ${1.0 - MmrLambda} * max(s.sim), 6)
         |      AS mmr
         |  FROM cand c
         |  JOIN sims s ON s.ca = c.vec_id
         |    AND s.cb IN (SELECT vec_id FROM sel${r - 1})
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
         |  GROUP BY c.vec_id, c.rel),
         |sel$r AS (
         |  SELECT * FROM sel${r - 1}
         |  UNION ALL
         |  SELECT vec_id, $r AS rank, mmr
         |  FROM (SELECT * FROM sc$r ORDER BY mmr DESC, vec_id LIMIT 1))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nv AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT embedding, nrm FROM nv WHERE vec_id = 0),
       |cand AS (
       |  SELECT e.vec_id, e.embedding, e.nrm,
       |    round(${dotSql("e", "q")} / (e.nrm * q.nrm), 6) AS rel
       |  FROM nv e, q WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT $MmrCand),
       |sims AS (
       |  SELECT a.vec_id AS ca, b.vec_id AS cb,
       |    round(${dotSql("a", "b")} / (a.nrm * b.nrm), 6) AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |sel1 AS (
       |  SELECT vec_id, 1 AS rank, round($MmrLambda * rel, 6) AS mmr
       |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1)),
       |$rounds
       |SELECT vec_id, CAST(rank AS BIGINT) AS rank, mmr FROM sel$MmrK
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_hybrid_rrf_idx" -> (qHybridRrfIdx _),
    "q_ann_filtered" -> (qAnnFiltered _),
    "q_sim_topk_multi" -> (qSimTopkMulti _),
    "q_mmr_rerank" -> (qMmrRerank _))

  val oracle: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfOracle,
    // the indexed tier is a physical re-plan of the same logical
    // contract — one oracle text gates both
    "q_hybrid_rrf_idx" -> hybridRrfOracle,
    "q_ann_filtered" -> annFilteredOracle(tables = 4, bits = 3),
    "q_sim_topk_multi" -> simTopkMultiOracle,
    "q_mmr_rerank" -> mmrOracle)
}
