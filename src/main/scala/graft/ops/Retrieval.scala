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
  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    // lexical system: per-doc BM25 scores (shared body with q_bm25),
    // retrieved list = positive-score top-R
    val lexTop = Pipeline.bm25Scores(spark, sfDir)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RrfLen)
    val wLex = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = lexTop // window input is the ≤R-row retrieved list
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    // dense system: cosine to the fixed probe embedding (vec_id 0),
    // norms hoisted to the per-vector projection as everywhere
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    val denTop = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(RrfLen)
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

  /** The fixed metadata predicate [[qAnnFiltered]] searches under (an
    * even label — ~half the corpus; any catalog/source/date predicate
    * in production). */
  private def annFilter: Column = col("label") % 2 === 0

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_ann_filtered" -> (qAnnFiltered _))

  val oracle: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfOracle,
    "q_ann_filtered" -> annFilteredOracle(tables = 4, bits = 3))
}
