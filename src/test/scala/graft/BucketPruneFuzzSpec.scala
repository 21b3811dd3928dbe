package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.{TxFileIndex, TxRelation, TxTable}

/** Property coverage for the MANIFEST-LEVEL bucket pruning
  * (TxFileIndex.listFiles, r19): a wrong prune is a silent wrong
  * result, so every probe shape the pruner handles is checked against
  * ground truth — the same predicate over a plain unpruned DataFrame —
  * plus the listing bound that makes the pruning worth having.
  * Shapes: EqualTo (both literal positions), In (≤ the InSet
  * conversion threshold), InSet (a 15-literal list — Catalyst rewrites
  * In→InSet above spark.sql.optimizer.inSetConversionThreshold = 10,
  * and that path feeds RAW internal values like UTF8String into the
  * hash), string AND long bucket columns (the writer hashes the
  * column value with murmur3 seed 42 — the literal hash must agree for
  * every type), conjuncts with non-bucket predicates, and unsupported
  * shapes (never prune). */
class BucketPruneFuzzSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val base = s"/tmp/graft_bprune_spec_p${ProcessHandle.current.pid}"
  private val Vocab = (0 until 50).map(i => s"term_$i")
  private val NBuckets = 8

  /** String-bucketed table: 3 commits so buckets hold several files. */
  private lazy val strT: String = {
    val t = s"$base/str"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val rows = (0L until 2000L).map(i => (i, Vocab((i % 50).toInt), i % 97))
    val df = rows.toDF("k", "term", "v")
    TxTable.createBucketed(spark, t, df.filter(col("k") < 700),
      "k", Seq("term"), NBuckets)
    TxTable.append(spark, t, df.filter(col("k") >= 700 && col("k") < 1400))
    TxTable.append(spark, t, df.filter(col("k") >= 1400))
    t
  }

  /** Long-bucketed table (the band-key shape). */
  private lazy val longT: String = {
    val t = s"$base/long"
    val rows = (0L until 2000L).map(i => (i, i % 37, i % 11))
    val df = rows.toDF("k", "bkey", "v")
    TxTable.createBucketed(spark, t, df, "k", Seq("bkey"), NBuckets)
    t
  }

  private lazy val strRef = {
    val rows = (0L until 2000L).map(i => (i, Vocab((i % 50).toInt), i % 97))
    rows.toDF("k", "term", "v")
  }

  private def idxOf(df: DataFrame): TxFileIndex =
    df.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
        org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          loc: TxFileIndex, _, _, _, _, _), _, _, _, _) => loc
    }.get

  /** Assert `probe` over the tx table equals the same predicate over
    * the reference frame, and return the files the manifest listed. */
  private def check(table: String, ref: DataFrame,
      pred: org.apache.spark.sql.Column): Int = {
    val df = TxRelation.read(spark, table).filter(pred)
    val idx = idxOf(df)
    val got = df.orderBy("k").collect().toSeq
    val want = ref.filter(pred).orderBy("k").collect().toSeq
    got shouldBe want
    idx.lastListedFiles
  }

  test("string bucket column: EqualTo/In/InSet probes are exact and prune the listing") {
    val total = TxTable.snapshot(strT).files.size
    val rnd = new scala.util.Random(4217)
    for (_ <- 1 to 12) {
      val one = Vocab(rnd.nextInt(Vocab.size))
      check(strT, strRef, col("term") === one) should be <= 3 // 1 bucket × 3 commits
      val three = Seq.fill(3)(Vocab(rnd.nextInt(Vocab.size)))
      check(strT, strRef, col("term").isin(three: _*)) should be <= 9
      // 15 literals → Catalyst rewrites to InSet (threshold 10): the
      // raw-internal-value path
      val fifteen = rnd.shuffle(Vocab).take(15)
      val n = check(strT, strRef, col("term").isin(fifteen: _*))
      n should be <= total
      n should be >= 3 // at least the matched buckets' files survive
    }
    // a probe term NOT in the data still answers exactly (empty)
    check(strT, strRef, col("term") === "absent_term") should be <= 3
  }

  test("literal-on-the-left and conjuncts with non-bucket predicates") {
    val one = Vocab(7)
    check(strT, strRef, lit(one) === col("term")) should be <= 3
    // conjunct: bucket predicate AND a cluster-key range — both prune
    // (intersection semantics: bucket set ∧ stats range)
    val listed = check(strT, strRef,
      col("term") === one && col("k") < 700)
    listed should be <= 1 // one bucket, one commit's key range
    // disjunction on the bucket column is UNSUPPORTED shape at the
    // conjunct level: never prunes on it, still answers exactly
    check(strT, strRef,
      col("term") === one || col("v") === 3) shouldBe
      TxTable.snapshot(strT).files.size
  }

  test("long bucket column: the literal hash agrees with the writer's placement") {
    val ref = (0L until 2000L).map(i => (i, i % 37, i % 11))
      .toDF("k", "bkey", "v")
    val rnd = new scala.util.Random(991)
    for (_ <- 1 to 12) {
      val one = rnd.nextInt(37).toLong
      check(longT, ref, col("bkey") === one) should be <= 1
      val some = Seq.fill(4)(rnd.nextInt(37).toLong)
      check(longT, ref, col("bkey").isin(some: _*)) should be <= 4
      val many = rnd.shuffle((0L until 37L).toList).take(14) // InSet path
      check(longT, ref, col("bkey").isin(many: _*)) should be <= NBuckets
    }
  }

  test("bucket pruning survives a bucket-column RENAME (column mapping)") {
    // renameColumn follows the bucket column (placement hashed VALUES,
    // not names); pushed attributes then arrive under the PHYSICAL
    // name, which is what the pruner's bucketCol speaks — a probe on
    // the NEW logical name must stay exact AND pruned. Declared last
    // among the strT cases: it mutates the shared fixture's schema.
    TxTable.renameColumn(strT, "term", "word")
    val ref2 = strRef.withColumnRenamed("term", "word")
    check(strT, ref2, col("word") === Vocab(13)) should be <= 3
    check(strT, ref2,
      col("word").isin(Vocab(1), Vocab(2), Vocab(3))) should be <= 9
    // and an append under the renamed schema still buckets correctly
    import spark.implicits._
    TxTable.append(spark, strT,
      Seq((9001L, Vocab(13), 0L)).toDF("k", "word", "v"))
    val ref3 = ref2.unionByName(
      Seq((9001L, Vocab(13), 0L)).toDF("k", "word", "v"))
    check(strT, ref3, col("word") === Vocab(13)) should be <= 4
  }

  test("tombstone-fold primitive: dropFilesAsOf retires ONLY the consumed snapshot's files") {
    val t = s"$base/fold"
    val df = (0L until 100L).map(i => (i, i % 5)).toDF("k", "v")
    TxTable.create(spark, t, df.filter(col("k") < 50), "k", nFiles = 2)
    TxTable.append(spark, t, df.filter(col("k") >= 50 && col("k") < 80))
    val pinned = TxTable.versions(t).max
    // a racing commit AFTER the pin: its rows must survive the fold
    TxTable.append(spark, t, df.filter(col("k") >= 80))
    TxTable.dropFilesAsOf(t, pinned)
    val left = TxRelation.read(spark, t).orderBy("k").collect().toSeq
    left shouldBe df.filter(col("k") >= 80).orderBy("k").collect().toSeq
    // idempotent: a replayed fold is a no-op commit-wise
    val v = TxTable.versions(t).max
    TxTable.dropFilesAsOf(t, pinned) shouldBe v
  }
}
