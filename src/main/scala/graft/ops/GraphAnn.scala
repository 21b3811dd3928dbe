package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.{Tables, TxRelation, TxTable}

/** B24 graph-based ANN ("HNSW-lite"): beam search over a k-NN neighbor
  * table — the recall-at-fixed-probe structure IVF/PQ cells cannot give
  * (a probe escapes its entry cell by WALKING, so recall is bounded by
  * graph navigability, not by how many cells were scanned). A faithful
  * HNSW (hierarchical layers, insertion-order long links, mutable
  * adjacency) is an imperative pointer structure with no honest
  * DataFrame shape; what survives the translation to declarative Spark
  * is the part that matters at rest:
  *
  *  - the INDEX is a k-NN edge table (src, nbr, cos_sim, rank ≤ M),
  *    built from the SAME banded random-hyperplane candidate machinery
  *    as q_dedup_cosine, run at the dial's high-recall end (6 tables ×
  *    2 bits on the 12 shared seeded planes — see [[knnEdges]]) —
  *    candidate generation is equi-joins on band keys, never
  *    all-pairs, and the independent tables cut the space different
  *    ways, which is what stitches neighborhoods across cluster
  *    boundaries into one navigable graph (the role insertion-order
  *    long links play in HNSW);
  *  - a QUERY is L unrolled best-first expansions: score the fixed
  *    entry points (the vec_id < 8 device every ANN oracle here
  *    shares), keep a beam of B, expand beam → neighbors through the
  *    edge table (equi-join on src), rescore, re-rank, repeat; the
  *    answer is the top-k of EVERYTHING visited (the ef-style result
  *    list, so a good node found early is never lost to beam churn).
  *
  * Everything is deterministic — rounded cosines before every rank,
  * (score desc, vec_id) tie-breaks — so the DuckDB oracle replays the
  * whole construction exactly: build, walk, and result are pinned by
  * exact match, and recall is MEASURED, not asserted (GraphAnnSpec
  * pins recall@5 vs the brute-force truth ≥ the IVF baseline's on the
  * same probe set).
  *
  * 100 TB shape: the edge table is a standing artifact (built once,
  * maintained INCREMENTALLY with the corpus — see the admission-tier
  * section below: append-only candidate store + read-time top-M,
  * provably row-identical to a rebuild, on hash-bucketed tx tables,
  * the same ACID tier as the dedup indexes), so a query's data cost is
  * L bucket-pruned equi-join probes of B rows each plus B·M scoring
  * lookups — independent of corpus size — and a daily batch's
  * admission cost is the BATCH's banded candidate volume, not the
  * corpus's. GraphAnnSpec pins the standing-table walk ≡ the in-query
  * walk and the broadcast shape of every per-hop join. */
object GraphAnn {

  import VectorForms.{dot, sumSq}

  /** Graph out-degree M: each node keeps its M best banded candidates. */
  private val Degree = 10
  /** Beam width B kept between hops. */
  private val Beam = 8
  /** Unrolled expansion hops L. */
  private val Hops = 3
  /** Final results per query. */
  private val TopK = 5

  private def cosTo(qv: Column, qnrm: Column): Column =
    round(dot(col("embedding"), qv) / (col("nrm") * qnrm), 6)

  /** The k-NN edge table (src, nbr, cos_sim, rank): per-source top-M
    * over the banded hyperplane candidates ([[LlmOps
    * .bandedCandidateScores]]) with BOTH orientations competing for
    * each endpoint's M slots and NO similarity floor (a navigable
    * graph needs every node's best links, close or not). The BUILD
    * runs the dial at its high-recall end — 6 tables × 2 bits on the
    * same 12 shared planes (per-edge candidate recall ≈0.94 at the
    * mid similarities where true kth-neighbors live, vs ≈0.65 at the
    * dedup queries' 4×3 point): an index build amortizes its candidate
    * volume over every query it will ever serve, so it buys recall
    * where the per-run dedup pass buys throughput. */
  private[graft] def knnEdges(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val pairs = LlmOps.bandedCandidateScores(e, tables = 6, bits = 2)
    val both = pairs.select(col("va").as("src"), col("vb").as("nbr"),
        col("cos_sim"))
      .union(pairs.select(col("vb").as("src"), col("va").as("nbr"),
        col("cos_sim")))
    val w = Window.partitionBy("src").orderBy(col("cos_sim").desc, col("nbr"))
    both.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Degree)
  }

  /** The edge table as a `SparkEntry.queries` entry (oracled). */
  def qKnnGraph(spark: SparkSession, sfDir: String): DataFrame =
    knnEdges(spark, sfDir).orderBy("src", "rank")

  /** Beam search over an edge frame. `edges` may be the in-query
    * [[knnEdges]] relation or a standing (tx) table scan — the walk is
    * identical. Returns (qid, vec_id, cos_sim, rn ≤ TopK). */
  private[graft] def beamSearch(spark: SparkSession, sfDir: String,
      edges: DataFrame): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    // per-node scoring projection (norm hoisted, as everywhere)
    val nodes = e.select(col("vec_id"), col("embedding"),
      sqrt(sumSq(col("embedding"))).as("nrm"))
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    // entry frontier: the 8 fixed entry nodes (the shared vec_id < 8
    // oracle device), scored per query. The query NODE ITSELF is a
    // legitimate waypoint (an in-corpus probe's own adjacency is the
    // best possible frontier — exactly where HNSW navigation would
    // land); it is excluded from the final RESULT, not from the walk.
    val scored0 = nodes.filter(col("vec_id") < 8)
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("qv"), col("qnrm"), col("vec_id"),
        cosTo(col("qv"), col("qnrm")).as("cos_sim"))
    val wBeam = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def topBeam(scored: DataFrame): DataFrame =
      scored.withColumn("rn", row_number().over(wBeam))
        .filter(col("rn") <= Beam).drop("rn")
    var beam = topBeam(scored0)
    var visited = scored0
    for (_ <- 1 to Hops) {
      // expand: frontier → neighbors (equi-join on src — the probe a
      // standing bucketed edge table serves with bucket pruning), then
      // rescore against the query; beam members rejoin the candidate
      // set so the walk never regresses
      val expanded = beam.select(col("qid"), col("qv"), col("qnrm"),
          col("vec_id").as("src"))
        .join(edges.select(col("src"), col("nbr")), "src")
        .select(col("qid"), col("qv"), col("qnrm"), col("nbr").as("vec_id"))
        .distinct()
        .join(nodes, "vec_id")
        .select(col("qid"), col("qv"), col("qnrm"), col("vec_id"),
          cosTo(col("qv"), col("qnrm")).as("cos_sim"))
      val cand = beam.unionByName(expanded)
        .groupBy("qid", "vec_id")
        // qv/qnrm/cos_sim are functionally determined by (qid, vec_id);
        // first-by-key is the cheapest dedup that keeps them
        .agg(first(col("qv")).as("qv"), first(col("qnrm")).as("qnrm"),
          first(col("cos_sim")).as("cos_sim"))
      beam = topBeam(cand)
      visited = visited.unionByName(cand)
    }
    val wFinal = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    visited.groupBy("qid", "vec_id").agg(first(col("cos_sim")).as("cos_sim"))
      .filter(col("vec_id") =!= col("qid")) // reported set excludes self
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("cos_sim"), col("rn"))
      .orderBy("qid", "rn")
  }

  /** B24 graph-ANN query entry: beam search over the in-query edge
    * relation (fully oracled). The edge build localCheckpoints ONCE
    * (the q_cluster_stats discipline) — each of the L hop joins reads
    * the materialized edges instead of replaying the banded candidate
    * scoring per hop. */
  def qAnnGraph(spark: SparkSession, sfDir: String): DataFrame =
    beamSearch(spark, sfDir, Ckpt(knnEdges(spark, sfDir)).df)

  /** Persist the edge table as a standing HASH-BUCKETED TX TABLE keyed
    * and bucketed by `src` — the ACID tier the dedup indexes live on;
    * a beam hop's equi-join probe on `src` then reads only the touched
    * buckets and never shuffles the graph. Spec-owned roots only (the
    * oracled query builds in-plan; production builds once per corpus
    * version). */
  private[graft] def buildGraphTable(spark: SparkSession, sfDir: String,
      root: String): Unit =
    TxTable.createBucketed(spark, root, knnEdges(spark, sfDir),
      "src", Seq("src"), 8)

  /** Beam search over the standing tx edge table (GraphAnnSpec pins
    * ≡ [[qAnnGraph]]). */
  private[graft] def qAnnGraphIdx(spark: SparkSession, sfDir: String,
      root: String): DataFrame =
    beamSearch(spark, sfDir, TxRelation.read(spark, root))

  // ---------------------------------------------------------------------
  // Incremental admission tier — the ANN index's DAILY LOOP, mirroring
  // Incremental's dedup-index architecture: the standing corpus is never
  // re-indexed; a new batch of vectors is admitted with work proportional
  // to the BATCH.
  //
  // Two standing hash-bucketed tx tables:
  //  - EDGE STORE (src, nbr, cos_sim), keyed+bucketed by src — an
  //    APPEND-ONLY candidate store; the graph's top-M cut happens at
  //    READ time as a window over each src's rows, which the bucketed
  //    scan serves with ZERO Exchange (HashPartitioning(src) satisfies
  //    the window's required distribution). Append-only matters: the
  //    tx format's deletion vectors are key-granular, so a
  //    delete-then-reappend of a src's refreshed list would tombstone
  //    the new rows too — the read-time cut gets the same result with
  //    no deletes at all, and a periodic rebuild compacts out-ranked
  //    rows.
  //  - BAND STORE (bkey, vec_id, embedding, nrm), keyed+bucketed by
  //    bkey (the injective band-fold key — LlmOps.bandedKeys): a
  //    batch's candidate partners are ONE bucketed equi-join away,
  //    embeddings carried in-row (the same locality trade Incremental's
  //    signature store makes with its shingle arrays).
  //
  // EXACTNESS: admission appends every batch-involved scored candidate
  // pair (both orientations) and the batch's own band rows. For any
  // src, top-M(build-time top-M ∪ batch-involved candidates) =
  // top-M(all candidates) — dropping below-rank-M corpus-only rows at
  // build can never resurface them in the full ranking, because adding
  // candidates only pushes ranks down. So the incrementally-maintained
  // graph is ROW-IDENTICAL to a from-scratch rebuild, and
  // q_knn_graph_incr / q_ann_graph_incr are gated by the SAME DuckDB
  // oracles as the full-rebuild queries.
  // ---------------------------------------------------------------------

  /** The corpus/batch split (mirrors Incremental's document split). */
  private def isBatchV: Column = col("vec_id") % 10 >= 8

  /** Directional scored candidates src=a-side: a ⋈ b on the band key,
    * exact rounded cosine, deduped (a pair may collide in several
    * tables). Inputs are [[LlmOps.bandedKeys]] frames. */
  private def scoredAgainst(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(b.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .distinct()

  /** Create the two standing stores from a corpus vector frame. */
  private[graft] def buildAnnStores(spark: SparkSession, corpus: DataFrame,
      edgeRoot: String, bandRoot: String): Unit = {
    graft.expressions.FloatVectorDot.register(spark)
    val k = Ckpt(LlmOps.bandedKeys(corpus, 6, 2)).df
    val w = Window.partitionBy("src").orderBy(col("cos_sim").desc, col("nbr"))
    TxTable.createBucketed(spark, edgeRoot,
      scoredAgainst(k, k).withColumn("rank", row_number().over(w))
        .filter(col("rank") <= Degree).drop("rank"),
      "src", Seq("src"), 8)
    TxTable.createBucketed(spark, bandRoot,
      k.select(col("bkey"), col("vec_id"), col("embedding"), col("nrm")),
      "bkey", Seq("bkey"), 8)
  }

  /** Admit a batch of new vectors: candidates vs the standing band
    * store (one bucketed equi-join — only the batch's band rows
    * shuffle) plus batch-internal candidates; append both orientations
    * to the edge store and the batch's band rows to the band store.
    * Each append is one atomic tx commit. */
  private[graft] def admitVectors(spark: SparkSession, batch: DataFrame,
      edgeRoot: String, bandRoot: String): Unit = {
    graft.expressions.FloatVectorDot.register(spark)
    val bk = Ckpt(LlmOps.bandedKeys(batch, 6, 2)).df
    val corpusK = TxRelation.read(spark, bandRoot)
    val bc = scoredAgainst(bk, corpusK) // batch → corpus
    val cb = bc.select(col("nbr").as("src"), col("src").as("nbr"),
      col("cos_sim")) // corpus → batch (same scores, flipped)
    val bb = scoredAgainst(bk, bk) // batch internal (both orientations)
    TxTable.append(spark, edgeRoot, bc.unionByName(cb).unionByName(bb))
    TxTable.append(spark, bandRoot,
      bk.select(col("bkey"), col("vec_id"), col("embedding"), col("nrm")))
  }

  /** The graph as read from the standing edge store: top-M per src at
    * READ time — a window the src-bucketed scan serves without an
    * Exchange. Row-identical to [[knnEdges]] over the same total
    * vector set (see the tier comment's exactness argument). */
  private[graft] def readGraph(spark: SparkSession, edgeRoot: String): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cos_sim").desc, col("nbr"))
    TxRelation.read(spark, edgeRoot)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Degree)
  }

  /** Session-idempotent build+admit of the standing stores for the
    * sfDir's corpus/batch split (Incremental.buildIndexes's pid-scoped
    * /tmp hygiene: production persists these once per corpus version
    * and never builds them inside a query). */
  private val builtStores = scala.collection.mutable.Set[String]()
  private def ensureStores(spark: SparkSession, sfDir: String): (String, String) = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid
    val eroot = s"/tmp/graft_anngraph_e_$tag"
    val broot = s"/tmp/graft_anngraph_b_$tag"
    val key = s"${System.identityHashCode(spark)}:$sfDir"
    if (!builtStores.contains(key)) builtStores.synchronized {
      if (!builtStores.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"), "graft_anngraph_")
        Seq(eroot, broot).foreach { r =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
        }
        val e = Tables.embeddings(spark, sfDir)
        buildAnnStores(spark, e.filter(!isBatchV), eroot, broot)
        admitVectors(spark, e.filter(isBatchV), eroot, broot)
        builtStores.add(key)
      }
    }
    (eroot, broot)
  }

  /** [[qKnnGraph]]'s contract through the INCREMENTAL tier: standing
    * stores built on the corpus split, the batch split admitted, the
    * graph read back — gated by the SAME full-rebuild oracle. */
  def qKnnGraphIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val (eroot, _) = ensureStores(spark, sfDir)
    readGraph(spark, eroot).orderBy("src", "rank")
  }

  /** [[qAnnGraph]]'s contract over the incrementally-maintained
    * standing graph — same beam walk, same oracle. */
  def qAnnGraphIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val (eroot, _) = ensureStores(spark, sfDir)
    beamSearch(spark, sfDir, readGraph(spark, eroot))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_graph" -> (qKnnGraph _),
    "q_ann_graph" -> (qAnnGraph _),
    "q_knn_graph_incr" -> (qKnnGraphIncr _),
    "q_ann_graph_incr" -> (qAnnGraphIncr _))

  /** Shared oracle CTE block: the banded candidate pairs (mirroring
    * [[LlmOps.bandedCandidateScores]] at 4×3), the per-source top-M
    * edge table, and the query/node scoring projections. */
  private def graphCtes: String =
    s"""${LlmOps.bandedCandidatePairsCtes(6, 2)},
       |bidir AS (
       |  SELECT va AS src, vb AS nbr, cos_sim FROM pairs
       |  UNION ALL SELECT vb, va, cos_sim FROM pairs),
       |edges AS (
       |  SELECT src, nbr, cos_sim, rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src
       |      ORDER BY cos_sim DESC, nbr) AS rank FROM bidir)
       |  WHERE rank <= $Degree)""".stripMargin

  /** One hop's candidate/beam CTE pair: expand `prevB` through edges,
    * rescore, dedup by (qid, vec_id), cut back to the beam. */
  private def hopCtes(i: Int, prevB: String): String =
    s"""c$i AS (
       |  SELECT qid, vec_id, cos_sim FROM $prevB
       |  UNION
       |  SELECT DISTINCT b.qid, n.vec_id,
       |    round(list_sum(list_transform(list_zip(n.embedding, q.qv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (n.nrm * q.qnrm), 6) AS cos_sim
       |  FROM $prevB b
       |  JOIN edges g ON g.src = b.vec_id
       |  JOIN nodes n ON n.vec_id = g.nbr
       |  JOIN qs q ON q.qid = b.qid),
       |b$i AS (
       |  SELECT qid, vec_id, cos_sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, vec_id) AS rn FROM c$i)
       |  WHERE rn <= $Beam)""".stripMargin

  private lazy val knnGraphSql: String =
    s"""WITH $graphCtes
       |SELECT src, nbr, cos_sim, CAST(rank AS INTEGER) AS rank
       |FROM edges ORDER BY src, rank""".stripMargin

  // the INCR twins are gated by the SAME full-rebuild SQL — the
  // admission tier's whole contract is row-identity with the rebuild
  val oracle: Map[String, String] = Map(
    "q_knn_graph" -> knnGraphSql,
    "q_knn_graph_incr" -> knnGraphSql,
    "q_ann_graph" -> annGraphSql,
    "q_ann_graph_incr" -> annGraphSql)

  private lazy val annGraphSql: String =
    s"""WITH $graphCtes,
         |nodes AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |qs AS (
         |  SELECT vec_id AS qid, embedding AS qv,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnrm
         |  FROM embeddings WHERE vec_id < 3),
         |s0 AS (
         |  SELECT q.qid, n.vec_id,
         |    round(list_sum(list_transform(list_zip(n.embedding, q.qv),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         |      / (n.nrm * q.qnrm), 6) AS cos_sim
         |  FROM nodes n, qs q
         |  WHERE n.vec_id < 8),
         |b0 AS (
         |  SELECT qid, vec_id, cos_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, vec_id) AS rn FROM s0)
         |  WHERE rn <= $Beam),
         |${(1 to Hops).map(i => hopCtes(i, s"b${i - 1}")).mkString(",\n")},
         |visited AS (
         |  SELECT qid, vec_id, cos_sim FROM s0
         |  ${(1 to Hops).map(i => s"UNION SELECT qid, vec_id, cos_sim FROM c$i")
            .mkString("\n  ")})
         |SELECT qid, vec_id, cos_sim, rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM visited WHERE vec_id <> qid)
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
}
