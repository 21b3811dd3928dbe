package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{GraphAnn, LlmOps}

/** Gates the graph-ANN ("HNSW-lite") tier on MEASURED recall and on the
  * scale shape, per the promotion rule for approximate operators:
  *
  *  1. recall@5 of the beam search vs the brute-force truth on the
  *     shared probe set, and ≥ the IVF-nprobe2 baseline's recall on the
  *     SAME probes — the whole reason a graph index exists;
  *  2. every surfaced (qid, vec_id, cos_sim) is exact — scores must
  *     equal the brute-force scores (approximation may lose pairs,
  *     never corrupt them — RecallSubsetSpec's law);
  *  3. the standing-tx-table walk ≡ the in-query walk (same rows), and
  *     its per-hop probes keep the graph side un-shuffled (broadcast
  *     frontier, no Exchange under the edge-table scans).
  */
class GraphAnnSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def truthTop5: Map[Long, Seq[(Long, Double)]] = {
    val e = graft.io.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(graft.ops.VectorForms.dot(col("embedding"), col("qv")) /
          (graft.ops.VectorForms.norm(col("embedding")) *
            graft.ops.VectorForms.norm(col("qv"))), 6).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  private def recallOf(rows: Array[(Long, Long)],
      truth: Map[Long, Seq[(Long, Double)]]): Double = {
    val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = truth.toSeq.map { case (qid, t) =>
      t.map(_._1).count(byQ.getOrElse(qid, Set.empty).contains)
    }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("beam-search recall@5 ≥ IVF-nprobe2's on the same probes; scores exact") {
    val truth = truthTop5
    val graph = SparkEntry.queries("q_ann_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val gRecall = recallOf(graph.map(t => (t._1, t._2)), truth)
    val iRecall = recallOf(ivf, truth)
    withClue(s"graph recall $gRecall vs ivf recall $iRecall: ") {
      gRecall should be >= iRecall
    }
    // the headline claim, pinned absolutely as well so an IVF
    // regression can't mask a graph regression
    gRecall should be >= 0.8
    // precision law: every surfaced score equals the brute-force score
    val truthScores = truth.flatMap { case (qid, t) =>
      t.map { case (v, c) => (qid, v) -> c }
    }
    graph.foreach { case (qid, v, c) =>
      truthScores.get((qid, v)).foreach(_ shouldBe c)
    }
  }

  test("standing tx edge table: walk ≡ in-query walk, graph side un-shuffled") {
    val root =
      s"/tmp/graft_anngraph_idx_p${ProcessHandle.current.pid}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    GraphAnn.buildGraphTable(spark, sf, root)
    val standing = GraphAnn.qAnnGraphIdx(spark, sf, root)
    val inQuery = SparkEntry.queries("q_ann_graph")(spark, sf)
    standing.collect() shouldBe inQuery.collect()
    // the walk probes the adjacency L times; the adjacency is built
    // (union+distinct over the edge table) and CHECKPOINTED once, so
    // every hop join reads the same materialized blocks — the final
    // plan shows ExistingRDD scans, not L re-evaluations of the edge
    // parquet + Exchange
    val plan = standing.queryExecution.executedPlan.toString
    plan should include("Scan ExistingRDD")
    // the adjacency memo's validity stamp is the TABLE VERSION, not a
    // plan hash: a second request over the unchanged store must serve
    // the SAME checkpointed adjacency — under a plan-identity stamp
    // (the bug this pins) it would supersede-and-RELEASE the first
    // walk's blocks, and collecting the earlier frame here would throw
    // on the truncated lineage
    val again = GraphAnn.qAnnGraphIdx(spark, sf, root)
    again.queryExecution.executedPlan.toString should
      include("Scan ExistingRDD")
    standing.collect() shouldBe again.collect() // first frame still live
    // no sort-merge path anywhere in the walk: every graph probe and
    // scoring lookup broadcasts the (tiny) frontier side
    plan should not include "SortMergeJoin"
  }

  test("oracled tier metric: graph recall@5 dominates IVF and holds its floor") {
    // q_ann_recall_tiers is the ORACLED form of this suite's original
    // recall claim (r13 verdict item 1): the floors here restate the
    // hash-gated numbers — sf0.01 measures graph 0.984 vs IVF 0.424
    // under the r14 hierarchical-entry walk (0.968 was the superseded
    // fixed-8-entry number)
    val row = SparkEntry.queries("q_ann_recall_tiers")(spark, sf).head()
    val truthPairs = row.getAs[Long]("truth_pairs")
    val gr = row.getAs[Double]("graph_recall")
    val ir = row.getAs[Double]("ivf_recall")
    // 1-in-20 probe sample × top-5 truth pairs each
    val n = graft.io.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0).count()
    truthPairs shouldBe n * 5
    withClue(s"graph_recall $gr vs ivf_recall $ir: ") {
      gr should be >= ir
      gr should be >= 0.9
    }
  }

  test("in-place store rebuild at the same root invalidates the read memo") {
    val base = s"/tmp/graft_anngraph_rbt_p${ProcessHandle.current.pid}"
    val eroot = s"$base/e"
    val broot = s"$base/b"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val e = graft.io.Tables.embeddings(spark, sf)
    GraphAnn.buildAnnStores(spark, e.filter(col("vec_id") % 10 < 8),
      eroot, broot)
    val a = GraphAnn.readGraph(spark, eroot, sf).count()
    // in-place rebuild at the SAME root — the flow the re-band policy
    // prescribes. Version numbering restarts at 0, so a bare
    // (root, version) stamp (the r13 advice finding) would serve the
    // stale memoized graph; the creation-identity stamp must not.
    Seq(eroot, broot).foreach(r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r)))
    GraphAnn.buildAnnStores(spark, e.filter(col("vec_id") % 10 < 9),
      eroot, broot)
    val b = GraphAnn.readGraph(spark, eroot, sf).count()
    withClue("rebuilt store (larger corpus) served the stale graph: ") {
      b should be > a
    }
    // a fresh store's scheme matches its corpus exactly
    GraphAnn.bandSchemeDrift(broot) shouldBe 0
  }

  test("missing/garbled band-scheme sidecar fails with the rebuild message") {
    val base = s"/tmp/graft_anngraph_sct_p${ProcessHandle.current.pid}"
    val broot = s"$base/b"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    // missing sidecar (store predates the format / build crashed)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(broot))
    val miss = intercept[IllegalArgumentException] {
      GraphAnn.readBandScheme(broot)
    }
    miss.getMessage should include("rebuild the stores")
    // garbled sidecar
    java.nio.file.Files.write(
      java.nio.file.Paths.get(broot, "_band_scheme"),
      "not a scheme".getBytes("UTF-8"))
    val garbled = intercept[IllegalStateException] {
      GraphAnn.readBandScheme(broot)
    }
    garbled.getMessage should include("rebuild the stores")
  }
}
