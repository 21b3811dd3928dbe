package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** Two-level (IVF-structured) integer-exact Lloyd — the corpus-derived-k
  * production trainer behind q_dedup_semantic — against an INDEPENDENT
  * in-memory mirror of the full two-level semantics: the ⌈√k⌉-cell
  * coarse quantizer (one exact Lloyd step over the init centroids),
  * per-iteration centroid→cell / vector→occupied-cell / in-cell argmin
  * assignment, floor-division update, emptied-cluster rule, and the
  * final assignment under the trained centroids. Any drift in tie
  * break, occupancy restriction, or division semantics breaks
  * equality. Also pins the SCALE SHAPE: the fine probe in the physical
  * plan is an equi-join on the cell id — never a nested-loop over the
  * full centroid table — which is what makes n·√k work out of the
  * flat argmin's n·k. */
class KmeansIvfSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val K = 32
  private val Kc = LlmOps.kmCoarseK(K) // 6
  private val Iters = 2
  private val Dims = 64

  private type Vec = IndexedSeq[Long]

  private lazy val q: IndexedSeq[(Long, Vec)] =
    graft.io.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toIndexedSeq
          .map(x => math.floor(x.toDouble * 10000.0).toLong): Vec))
      .sortBy(_._1).toIndexedSeq

  private def d2(a: Vec, b: Vec): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** argmin by (d2, id) over a candidate set — the shared tie-break. */
  private def argmin(v: Vec, cands: Seq[(Long, Vec)]): Long =
    cands.map { case (id, c) => (d2(v, c), id) }.min._2

  private def update(cent: Seq[(Long, Vec)],
      members: Map[Long, Seq[Vec]]): Seq[(Long, Vec)] =
    cent.map { case (cid, old) =>
      members.get(cid) match {
        case Some(ms) if ms.nonEmpty =>
          (cid, (0 until Dims).map { i =>
            math.floor(ms.map(_(i)).sum.toDouble / ms.size).toLong
          }: Vec)
        case _ => (cid, old)
      }
    }

  /** In-memory mirror of the whole two-level trainer. Returns
    * (final centroids, last-iteration counts, final assignment). */
  private def reference(): (Seq[(Long, Vec)], Map[Long, Long], Map[Long, Long]) = {
    val init = q.take(K)
    // coarse quantizer: one exact Lloyd step over the init centroids
    val g0 = init.take(Kc).map { case (id, v) => (id, v) }
    val ig = init.map { case (cid, v) => cid -> argmin(v, g0) }.toMap
    val coarse = update(g0,
      init.groupBy(p => ig(p._1)).map { case (g, ps) => g -> ps.map(_._2).toSeq })
    def assignAll(cent: Seq[(Long, Vec)]): Map[Long, Long] = {
      val cg = cent.map { case (cid, c) => cid -> argmin(c, coarse) }.toMap
      val occ = cg.values.toSet
      val occCoarse = coarse.filter { case (g, _) => occ.contains(g) }
      q.map { case (id, v) =>
        val cell = argmin(v, occCoarse)
        id -> argmin(v, cent.filter { case (cid, _) => cg(cid) == cell })
      }.toMap
    }
    var cent: Seq[(Long, Vec)] = init
    var lastCounts = Map.empty[Long, Long]
    for (_ <- 0 until Iters) {
      val a = assignAll(cent)
      lastCounts = a.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      cent = update(cent,
        a.toSeq.groupBy(_._2).map { case (c, ids) =>
          c -> ids.map(p => q.find(_._1 == p._1).get._2) })
    }
    (cent, lastCounts, assignAll(cent))
  }

  private lazy val got =
    LlmOps.kmeansExactIvf(graft.io.Tables.embeddings(spark, sf), K, Dims, Iters)
  private lazy val ref = reference()

  test("two-level trainer equals the in-memory two-level reference") {
    val expected = ref._1.flatMap { case (cid, c) =>
      c.zipWithIndex.map { case (v, i) =>
        (cid, (i + 1).toLong, v, ref._2.getOrElse(cid, 0L))
      }
    }.sortBy(t => (t._1, t._2))
    val rows = got.centroids.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    rows shouldBe expected
  }

  test("final two-level assignment equals the reference assignment") {
    val rows = got.assign.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows shouldBe ref._3
    rows.size shouldBe q.size // every vector assigned exactly once
  }

  test("the fine probe is an equi-join on the cell id, not a nested loop") {
    val plan = got.assign.queryExecution.executedPlan.toString
    // per-cell probe: hash or sort-merge equi-join keyed on gid
    plan should include regex "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \\[gid"
    // every nested-loop in the plan is a coarse pass (broadcast side
    // bounded by ⌈√k⌉ rows). Their COUNT is driven by lineage
    // duplication — centArrs/cg subtrees are replayed wherever reused
    // — not by n or k, so only bound it loosely; the structural pin is
    // the equi-join regex above, which fails before anyone
    // reintroduces the flat n·k argmin.
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl <= 24, s"unexpected nested-loop growth: $bnl")
  }

  test("fine centroids are distributed state: no k-sized local relation") {
    // at the SemDeDup production point k = n/64, k·d driver longs are
    // ~8 GB at n = 10⁹ — the trainer must never collect the fine
    // centroid table or re-ship it as a per-pass LocalRelation. The
    // ONLY local relation either output plan may carry is ivfCoarse's
    // ⌈√k⌉-row cell table (√k·d ≈ 2 MB at that scale, broadcast by
    // design). The checkpointed fine table surfaces as a scan of an
    // existing RDD, not local rows.
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    for (df <- Seq(got.centroids, got.assign)) {
      val locals = df.queryExecution.optimizedPlan.collect {
        case l: LocalRelation => l.data.size
      }
      withClue(s"LocalRelation sizes ${locals.mkString(",")}: ") {
        locals.foreach(_ should be <= Kc)
      }
    }
  }

  test("two-level assignment agrees with the exact global argmin on most vectors") {
    // the IVF approximation: the nearest fine centroid may sit in a
    // neighboring cell. Measure (not hide) the agreement under the
    // trained centroids; the oracle pins the two-level semantics
    // exactly, this pins that the approximation stays an approximation
    // of the SAME objective.
    val cent = ref._1
    val global = q.map { case (id, v) => id -> argmin(v, cent) }.toMap
    val agree = ref._3.count { case (id, c) => global(id) == c }
    agree.toDouble / q.size should be >= 0.7
  }
}
