package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** Deterministic distributed k-means (the IVF centroid trainer):
  * Lloyd's invariants on the real sf0.001 embeddings. */
class KmeansSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def vecs = graft.io.Tables.embeddings(spark, sf)

  test("inertia is monotonically non-increasing over Lloyd iterations") {
    val inertias = (0 to 3).map { it =>
      LlmOps.kmeansInertia(vecs, LlmOps.kmeansCentroids(vecs, 8, 64, it))
    }
    inertias.sliding(2).foreach { case Seq(a, b) =>
      b should be <= a + 1e-9
    }
    // and training actually helps: 3 iterations beat the raw seed
    inertias.last should be < inertias.head
  }

  test("centroids are deterministic across runs") {
    val a = LlmOps.kmeansCentroids(vecs, 8, 64, 2).orderBy("cid").collect()
    val b = LlmOps.kmeansCentroids(vecs, 8, 64, 2).orderBy("cid").collect()
    a.map(_.toString).toSeq shouldBe b.map(_.toString).toSeq
    a.length should be <= 8
    a.length should be > 0
  }

  test("every centroid has the vector dimensionality") {
    val cents = LlmOps.kmeansCentroids(vecs, 4, 64, 1).collect()
    cents.foreach(r => r.getSeq[Double](1).length shouldBe 64)
  }
}
