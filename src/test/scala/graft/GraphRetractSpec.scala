package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{Tables, TxTable}
import graft.ops.GraphAnn

/** Retraction in the standing graph-ANN stores (r15 verdict item 2):
  * tombstone + re-link must leave the SERVED graph row-identical to a
  * from-scratch rebuild over the survivor corpus, delete admission
  * must be exactly-once under a txn watermark, and physical compaction
  * (edge + band) must change nothing a reader can observe while
  * actually shedding the dead rows. The oracled walk entry
  * (q_ann_graph_deleted) gates the same contract against DuckDB; this
  * spec pins the pieces the oracle can't see (watermarks, compaction,
  * store row counts). */
class GraphRetractSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def graphRows(df: DataFrame) =
    df.select("src", "nbr", "cos_sim", "rank").orderBy("src", "rank")
      .collect().toSeq

  test("masked + re-linked graph ≡ from-scratch rebuild over survivors") {
    val (eroot, _, troot) = GraphAnn.ensureDeleteStores(spark, sf)
    val served = graphRows(GraphAnn.readGraphLive(spark, eroot, troot, sf))
    val survivors = GraphAnn.survivorsOf(spark, sf, troot)
    graphRows(GraphAnn.knnEdgesFrom(spark, survivors)) shouldBe served
    // and no tombstoned id appears on either end of any served edge
    val dead = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    served.foreach { r =>
      dead should not contain r.getLong(0)
      dead should not contain r.getLong(1)
    }
  }

  test("delete admission is exactly-once under the txn watermark") {
    val base = s"/tmp/graft_anngraph_rt_p${ProcessHandle.current.pid}"
    val (eroot, broot, troot) = (s"${base}_e", s"${base}_b", s"${base}_t")
    Seq(eroot, broot, troot).foreach { r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
    }
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    GraphAnn.buildAnnStores(spark, e, eroot, broot)
    GraphAnn.createTombTable(troot)
    val del = e.filter(col("vec_id") % 10 === 7).select(col("vec_id"))
    GraphAnn.retractVectors(spark, del, eroot, broot, troot,
      deletedAtV = 1L, txn = Some(("rt_del", 1L)))
    val (ve, vt) = (TxTable.versions(eroot).max, TxTable.versions(troot).max)
    TxTable.countRows(troot) shouldBe del.count()
    // the replayed retraction (foreachBatch restart) commits nothing
    GraphAnn.retractVectors(spark, del, eroot, broot, troot,
      deletedAtV = 1L, txn = Some(("rt_del", 1L)))
    TxTable.versions(eroot).max shouldBe ve
    TxTable.versions(troot).max shouldBe vt
    // re-deleting already-dead ids in a LATER batch is a no-op row-wise
    GraphAnn.retractVectors(spark, del.limit(3), eroot, broot, troot,
      deletedAtV = 2L, txn = Some(("rt_del", 2L)))
    TxTable.countRows(troot) shouldBe del.count()
  }

  test("compaction sheds dead rows without changing the served graph") {
    val (eroot, broot, troot) = GraphAnn.ensureDeleteStores(spark, sf)
    val before = graphRows(GraphAnn.readGraphLive(spark, eroot, troot, sf))
    val tombs = graft.io.TxRelation.read(spark, troot).select(col("vec_id"))
    def deadEdgeRows(): Long = {
      val ed = graft.io.TxRelation.read(spark, eroot)
      ed.join(tombs.select(col("vec_id").as("src")), Seq("src"), "left_semi")
        .count() +
        ed.join(tombs.select(col("vec_id").as("nbr")), Seq("nbr"), "left_semi")
          .count()
    }
    deadEdgeRows() should be > 0L // retraction is mask-at-read until now
    val edgeRowsBefore = TxTable.countRows(eroot)
    val bandRowsBefore = TxTable.countRows(broot)
    GraphAnn.compactEdgeStoreLive(spark, eroot, troot)
    GraphAnn.compactBandStore(spark, broot, troot)
    deadEdgeRows() shouldBe 0L
    TxTable.countRows(eroot) should be < edgeRowsBefore
    TxTable.countRows(broot) should be < bandRowsBefore
    // compaction moved the stamps — the re-derived graph is unchanged
    graphRows(GraphAnn.readGraphLive(spark, eroot, troot, sf)) shouldBe before
  }
}
