package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** q_kmeans (integer-exact Lloyd) against an INDEPENDENT in-memory
  * reference: quantization, assignment argmin, floor-division update
  * and the emptied-cluster rule re-implemented in plain Scala on the
  * collected vectors — any drift in the distributed formulation (tie
  * break, division semantics, iteration order) breaks equality. */
class KmeansExactSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val K = 4
  private val Iters = 2
  private val Dims = 64

  /** In-memory reference Lloyd for any k, in exact long arithmetic. */
  private def reference(k: Int): Seq[(Long, Long, Long, Long)] = {
    val vecs = graft.io.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toIndexedSeq))
      .sortBy(_._1)
    // reference: micro-unit quantization once
    val q: Map[Long, IndexedSeq[Long]] = vecs.map { case (id, xs) =>
      id -> xs.map(x => math.floor(x.toDouble * 10000.0).toLong)
    }.toMap
    var cent: Seq[(Long, IndexedSeq[Long])] =
      vecs.take(k).map { case (id, _) => (id, q(id)) }
    var lastCounts = Map.empty[Long, Long]
    for (_ <- 0 until Iters) {
      val assign = q.map { case (id, qs) =>
        id -> cent.map { case (cid, c) =>
          (qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min._2
      }
      lastCounts = assign.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      cent = cent.map { case (cid, old) =>
        val members = assign.collect { case (id, c) if c == cid => q(id) }
        if (members.isEmpty) (cid, old)
        else (cid, (0 until Dims).map { i =>
          math.floor(members.map(_(i)).sum.toDouble / members.size).toLong
        })
      }
    }
    cent.flatMap { case (cid, c) =>
      c.zipWithIndex.map { case (v, i) =>
        (cid, (i + 1).toLong, v, lastCounts.getOrElse(cid, 0L))
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("distributed integer Lloyd equals the in-memory reference, iteration for iteration") {
    val expected = reference(K)
    val got = LlmOps.qKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
    got.length shouldBe K * Dims
    // clusters actually moved: at least one centroid coord differs from
    // the init (the k smallest vec_ids' quantized vectors)
    val init = graft.io.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toIndexedSeq))
      .sortBy(_._1).take(K).flatMap { case (id, xs) =>
        xs.zipWithIndex.map { case (x, i) =>
          (id, (i + 1).toLong, math.floor(x.toDouble * 10000.0).toLong) }
      }.toSet
    got.map(t => (t._1, t._2, t._3)).toSet should not be init
  }

  test("q_kmeans is deterministic across runs") {
    val a = LlmOps.qKmeans(spark, sf).collect().toSeq
    val b = LlmOps.qKmeans(spark, sf).collect().toSeq
    a shouldBe b
  }

  test("k > 64 (broadcast-table assignment path) equals the same reference") {
    // above KmLiteralMaxK the trainer switches from plan-literal
    // centroids to a broadcast centroid table + hash-agg argmin — the
    // corpus-derived-k path qDedupSemantic rides; both formulations
    // must be the SAME exact integer Lloyd
    val k = 80
    val expected = reference(k)
    val got = LlmOps.kmeansExact(
        graft.io.Tables.embeddings(spark, sf), k, Dims, Iters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
  }
}
