package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.GraphAnn

/** Shard-then-stitch graph build (r15 verdict item 6): per-shard
  * independent builds at the corpus-global band scheme, stitched by
  * cross-shard boundary candidates, must be ROW-IDENTICAL to the
  * global build — which subsumes the verdict's walk-recall-floor
  * requirement (identical graphs walk identically). The DuckDB gate is
  * the shared rebuild oracle on q_knn_graph_sharded; this pins the
  * Spark-side equality directly. */
class GraphShardSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def rows(df: DataFrame) =
    df.select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")
      .collect().toSeq

  test("sharded build ≡ global build, row for row") {
    rows(GraphAnn.qKnnGraphSharded(spark, sf)) shouldBe
      rows(GraphAnn.knnEdges(spark, sf))
  }
}
