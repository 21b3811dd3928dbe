package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.TxTable

/** Model-based fuzz of the tx tier's ACID core: random operation
  * sequences (append, COW range delete, MOR delete, compact,
  * exactly-once appendBatch AND upsertBatch with random replays —
  * upserts are not content-idempotent, so an unabsorbed replay breaks
  * the model — full MERGE batches)
  * mirrored against a trivial in-memory map, with three invariants the
  * format stakes its correctness on checked throughout:
  *
  *  1. manifest arithmetic — `countRows` (Σ add.rows − Σ dv.rows, no
  *     data file opened) equals the model's size after EVERY op;
  *  2. content — the table reads back exactly the model, at the end
  *     AND via time travel at every version the sequence produced
  *     (each recorded model snapshot must be byte-reconstructible,
  *     whatever compactions/rewrites happened above it);
  *  3. the version chain is gapless.
  *
  * Deterministic seeds; each op is a Spark job, so sequences are
  * deliberately short — the value is the INTERLEAVINGS (e.g. a MOR
  * delete whose tombstones a later compact must absorb without
  * breaking the dv-era snapshots, a merge rewriting files a prior
  * delete already pruned), which hand-written specs cover only
  * pairwise. */
@org.scalatest.tags.Slow // slow tier: GRAFT_TEST_TIER=slow|all (SURVEY §7)
class TxModelFuzzSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  private case class R(v: Double, tag: String)

  test("random op sequences: content ≡ model at every produced version") {
    Seq(101L, 202L, 303L).foreach(runSequence)
  }

  private def df(rows: Seq[(Long, R)]): DataFrame =
    spark.createDataFrame(rows.map { case (k, r) => (k, r.v, r.tag) })
      .toDF("k", "v", "tag")

  private def readAll(root: String, v: Option[Long]): Map[Long, R] =
    TxTable.read(spark, root, v).select("k", "v", "tag").collect()
      .map(r => r.getLong(0) -> R(r.getDouble(1), r.getString(2))).toMap

  private def runSequence(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = s"/tmp/graft_txfuzz_p${ProcessHandle.current.pid}_$seed"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    var nextK = 0L
    def fresh(n: Int): Seq[(Long, R)] = {
      val rows = (0 until n).map { i =>
        val k = nextK + i; k -> R(k * 1.5, s"t${k % 7}")
      }
      nextK += n
      rows
    }
    def randRange(): (Long, Long) = {
      val lo = rnd.nextLong(nextK)
      (lo, lo + rnd.nextLong(math.max(1L, nextK / 4)))
    }

    val init = fresh(80)
    TxTable.create(spark, root, df(init), "k", nFiles = 4)
    var model: Map[Long, R] = init.toMap
    var history = Map(0L -> model)
    var batchId = 0L

    for (_ <- 1 to 12) {
      rnd.nextInt(7) match {
        case 0 =>
          val rows = fresh(10 + rnd.nextInt(30))
          TxTable.append(spark, root, df(rows), nFiles = 2)
          model ++= rows
        case 1 =>
          val (lo, hi) = randRange()
          TxTable.delete(spark, root, lo, hi)
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 2 =>
          val (lo, hi) = randRange()
          TxTable.deleteMor(spark, root, lo, hi)
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 3 =>
          TxTable.compact(spark, root, nFiles = 3)
        case 4 =>
          // exactly-once streaming shape; half the time the batch is
          // immediately REPLAYED — the txn watermark must absorb it
          val rows = fresh(10)
          TxTable.appendBatch(spark, root, "fuzz", batchId, df(rows),
            nFiles = 1)
          model ++= rows
          if (rnd.nextBoolean())
            TxTable.appendBatch(spark, root, "fuzz", batchId, df(rows),
              nFiles = 1)
          batchId += 1
        case 5 =>
          // full merge batch: random deletes + updates over live keys,
          // fresh-key inserts
          val live = model.keys.toSeq.sorted
          val del = rnd.shuffle(live).take(5)
          val upd = rnd.shuffle(live.filterNot(del.contains)).take(5)
          val ins = fresh(5)
          val ch = del.map(k => (k, "D", 0.0, "")) ++
            upd.map(k => (k, "U", -k.toDouble, "upd")) ++
            ins.map { case (k, r) => (k, "I", r.v, r.tag) }
          TxTable.merge(spark, root,
            spark.createDataFrame(ch).toDF("k", "action", "c_v", "c_tag"))
          model = model -- del
          upd.foreach(k => model += k -> R(-k.toDouble, "upd"))
          model ++= ins
        case 6 =>
          // streaming upsert: mixed existing (update) + fresh keys
          // (insert); half the time the batch is immediately REPLAYED —
          // upserts are NOT content-idempotent, so a double-apply would
          // break the model equality below. Half the time the batch is
          // also PARTIAL (tag column dropped): live keys must CARRY
          // their tag, inserts land tag NULL — the carry path under
          // random interleavings, not just the hand-written spec.
          val live = rnd.shuffle(model.keys.toSeq.sorted).take(5)
          val ins = fresh(5)
          val rows = live.map(k => (k, R(k + 0.25, s"u$k"))) ++ ins
          val partial = rnd.nextBoolean()
          val batch = if (partial) df(rows).drop("tag") else df(rows)
          TxTable.upsertBatch(spark, root, "fuzz-ups", batchId, batch,
            nFiles = 2)
          if (rnd.nextBoolean())
            TxTable.upsertBatch(spark, root, "fuzz-ups", batchId, batch,
              nFiles = 2)
          batchId += 1
          if (partial) {
            live.foreach(k => model += k ->
              R(k + 0.25, model(k).tag)) // v updates, tag CARRIES
            ins.foreach { case (k, r) =>
              model += k -> R(r.v, null) } // insert: absent col → NULL
          } else model ++= rows
      }
      // invariant 1 after EVERY op: the manifest's arithmetic answer
      withClue(s"seed=$seed after v${TxTable.versions(root).max}: ") {
        TxTable.countRows(root) shouldBe model.size.toLong
      }
      history += TxTable.versions(root).max -> model
    }

    // invariant 2: final content, then every produced version replays
    // its model snapshot through time travel
    withClue(s"seed=$seed latest: ") {
      readAll(root, None) shouldBe model
    }
    history.foreach { case (v, m) =>
      withClue(s"seed=$seed time travel v$v: ") {
        readAll(root, Some(v)) shouldBe m
        TxTable.countRows(root, Some(v)) shouldBe m.size.toLong
      }
    }
    // invariant 3: gapless chain
    val vs = TxTable.versions(root)
    vs shouldBe (0L to vs.max)
  }
}
