package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** MODEL-BASED property test for the tx table: a seeded random
  * sequence of every writer (append, COW delete, MOR delete, MERGE,
  * streaming batch with deliberate replays, compact, optimize,
  * INSERT-OVERWRITE replace, metadata-only schema widening) runs
  * against both the real table and a trivial in-memory Map model;
  * after every step the table's content, its manifest row arithmetic
  * (countRows — the invariant the DV/COW interplay must preserve),
  * and the model must agree, and at the end every recorded version
  * must time-travel back to its model snapshot. The hand-written
  * specs pin each interaction once; this sweeps the composition space
  * the combinatorics make impractical to enumerate.
  *
  * MERGE semantics modeled per the implementation contract: 'D'
  * removes the key if logically present; 'U' and 'I' both UPSERT (a
  * full-outer join takes the change payload whether or not a target
  * row exists, and the dv-rewrite un-shadows a tombstoned key whose
  * file is rewritten). */
class TxModelSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private val root =
    s"/tmp/graft_txmodel_p${ProcessHandle.current.pid}/table"

  private def df(rows: Seq[(Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("30 random writer steps: table ≡ model at every version") {
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
    val rnd = new scala.util.Random(42)
    val model = mutable.Map.empty[Long, Double]
    var nextKey = 1000L
    var nextBatch = 0L
    val history = mutable.ArrayBuffer.empty[(Long, Map[Long, Double])]

    def freshRows(n: Int): Seq[(Long, Double)] = (0 until n).map { _ =>
      nextKey += 1
      nextKey -> (rnd.nextInt(1000) / 10.0)
    }

    // seed
    val seed = freshRows(60)
    TxTable.create(spark, root, df(seed), "k", nFiles = 4)
    model ++= seed

    def checkNow(): Unit = {
      val got = TxTable.read(spark, root).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      got shouldBe model.toMap
      TxTable.countRows(root) shouldBe model.size.toLong
    }
    def record(): Unit = {
      checkNow()
      history += TxTable.versions(root).max -> model.toMap
    }
    record()

    def someKeys: Seq[Long] =
      rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(8))
    def range(): (Long, Long) = {
      val ks = model.keys.toSeq
      if (ks.isEmpty) (0L, 0L)
      else {
        val lo = ks(rnd.nextInt(ks.size))
        (lo, lo + rnd.nextInt(20))
      }
    }

    var evolved = false
    (1 to 30).foreach { step =>
      rnd.nextInt(10) match {
        case 0 => // plain append
          val rows = freshRows(5 + rnd.nextInt(10))
          TxTable.append(spark, root, df(rows), nFiles = 2)
          model ++= rows
        case 1 => // COW range delete
          val (lo, hi) = range()
          TxTable.delete(spark, root, lo, hi, nFiles = 2)
          model --= model.keys.filter(k => k >= lo && k <= hi).toSeq
        case 2 => // MOR range delete (deletion vector)
          val (lo, hi) = range()
          TxTable.deleteMor(spark, root, lo, hi)
          model --= model.keys.filter(k => k >= lo && k <= hi).toSeq
        case 3 => // MERGE: mixed delete/upsert batch (ONE key draw,
          // split disjointly — a key must not be both D and U)
          val drawn = someKeys
          val del = drawn.take(3).map(k => (k, "D", 0.0))
          val upd = drawn.drop(3).map(k => (k, "U", rnd.nextInt(100) + 0.5))
          val ins = freshRows(2).map { case (k, v) => (k, "I", v) }
          val batch = del ++ upd ++ ins
          import spark.implicits._
          // merge requires a c_<col> payload per non-key column: after
          // a schema evolution the widened columns ride along as nulls
          val base = batch.toDF("k", "action", "c_v")
          val widened = TxTable.snapshot(root).schema.fieldNames
            .filterNot(n => n == "k" || n == "v")
            .foldLeft(base)((d, c) =>
              d.withColumn(s"c_$c", lit(null).cast("double")))
          TxTable.merge(spark, root, widened, nFiles = 2)
          batch.foreach {
            case (k, "D", _) => model -= k
            case (k, _, v) => model(k) = v
          }
        case 4 => // streaming batch; every third is a REPLAY
          val replay = nextBatch > 0 && step % 3 == 0
          val bid = if (replay) nextBatch - 1 else nextBatch
          val rows = freshRows(4)
          TxTable.appendBatch(spark, root, "model", bid, df(rows))
          if (!replay) { model ++= rows; nextBatch += 1 }
        // replayed batch: the table must ignore it entirely
        case 5 =>
          TxTable.compact(spark, root, nFiles = 3)
        case 6 =>
          TxTable.optimize(spark, root, Seq("k", "v"), nFiles = 4)
        case 7 => // predicate MOR delete on the NON-key column
          val lo = rnd.nextInt(100) / 10.0
          TxTable.deleteMorWhere(spark, root,
            col("v") >= lo && col("v") < lo + 1.5)
          model --= model.filter { case (_, v) => v >= lo && v < lo + 1.5 }
            .keys.toSeq
        case 8 => // INSERT OVERWRITE: single-commit atomic replace
          val rows = freshRows(10 + rnd.nextInt(20))
          TxTable.overwrite(spark, root, df(rows), nFiles = 3)
          model.clear(); model ++= rows
        case 9 => // metadata-only schema widening, once; then append
          if (!evolved) {
            TxTable.evolveSchema(root, Seq(
              org.apache.spark.sql.types.StructField("w",
                org.apache.spark.sql.types.DoubleType)))
            evolved = true // later appends/merges null-fill w; reads
            // and countRows must be unaffected by the extra column
          } else {
            val rows = freshRows(3)
            TxTable.append(spark, root, df(rows), nFiles = 1)
            model ++= rows
          }
      }
      record()
    }

    // time travel: every recorded version reconstructs its model
    rnd.shuffle(history.toSeq).take(8).foreach { case (v, snap) =>
      TxTable.read(spark, root, Some(v)).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe snap
      TxTable.countRows(root, Some(v)) shouldBe snap.size.toLong
    }
  }
}
