package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.dsl.Df
import graft.compile.Compiler

/** Algebraic properties of the DSL/engine over real data (SURVEY §5.2.4).
  * Uses ScalaCheck generators directly (the scalatest bridge artifact is
  * not in the offline cache) with fixed seeds — each case is a Spark job,
  * so the case count is deliberately small and deterministic. */
class PropertySpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val qtyDisc: Gen[(Double, Double)] =
    for { q <- Gen.choose(1.0, 50.0); d <- Gen.choose(0.0, 0.1) } yield (q, d)

  test("filter ∘ filter ≡ filter(&&) — chained DSL masks compose conjunctively") {
    samples(qtyDisc, 4).foreach { case (q, dc) =>
      val c = Compiler(spark, sf)
      val d = Df.root("lineitem")
      val chained = c.toDF(d(d.l_quantity > q)(d.l_discount < dc)).count()
      val combined = c.toDF(d((d.l_quantity > q) && (d.l_discount < dc))).count()
      withClue(s"q=$q disc=$dc: ") { chained shouldBe combined }
    }
  }

  test("De Morgan: !(a || b) ≡ !a && !b on row masks") {
    samples(qtyDisc, 4).foreach { case (q, dc) =>
      val c = Compiler(spark, sf)
      val d = Df.root("lineitem")
      val a = d.l_quantity > q
      val b = d.l_discount < dc
      withClue(s"q=$q disc=$dc: ") {
        c.toDF(d(!(a || b))).count() shouldBe c.toDF(d((!a) && (!b))).count()
      }
    }
  }

  test("mask partition: count(m) + count(!m) = count(*)") {
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    samples(Gen.choose(1.0, 50.0), 4).foreach { q =>
      val c = Compiler(spark, sf)
      val d = Df.root("lineitem")
      val m = d.l_quantity > q
      withClue(s"q=$q: ") {
        c.toDF(d(m)).count() + c.toDF(d(!m)).count() shouldBe total
      }
    }
  }

  test("random comparison/arith DSL expressions match raw Spark (compile parity)") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val exprGen: Gen[(String, String, String, Double)] = for {
      c1 <- Gen.oneOf(numCols); c2 <- Gen.oneOf(numCols)
      op <- Gen.oneOf("lt", "le", "gt", "ge")
      k <- Gen.choose(0.5, 2.0)
    } yield (c1, c2, op, k)
    samples(exprGen, 6).foreach { case (c1, c2, op, k) =>
      val c = Compiler(spark, sf)
      val d = Df.root("lineitem")
      val (la, ra) = (d.selectDynamic(c1) * k, d.selectDynamic(c2) + 1.0)
      val dslMask = op match {
        case "lt" => la < ra; case "le" => la <= ra
        case "gt" => la > ra; case _ => la >= ra
      }
      val (lb, rb) = (col(c1) * k, col(c2) + 1.0)
      val rawMask = op match {
        case "lt" => lb < rb; case "le" => lb <= rb
        case "gt" => lb > rb; case _ => lb >= rb
      }
      withClue(s"$c1*$k $op $c2+1: ") {
        c.toDF(d(dslMask)).count() shouldBe li.filter(rawMask).count()
      }
    }
  }

  test("union ∘ distinct is idempotent") {
    import org.apache.spark.sql.functions.col
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").as("k"))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_nationkey").as("k"))
    val once = cust.unionByName(supp).distinct()
    val twice = once.unionByName(once).distinct()
    once.count() shouldBe twice.count()
  }

  test("chunking invariants hold on random synthetic documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random token counts in [1, 400] — covers <1 chunk, exact multiples,
    // and the straddling cases around the 128-token boundary
    val lens = samples(Gen.choose(1, 400), 12) :+ 128 :+ 256 :+ 127 :+ 129
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)(s"t$i").mkString(" ")) }
      .toDF("doc_id", "text")
    val chunks = ops.Pipeline.chunkDocs(docs).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    lens.zipWithIndex.foreach { case (n, i) =>
      val cs = byDoc(i.toLong).sortBy(_.getLong(1))
      // chunk count = ceil(n/128); token counts sum to n; all full but last
      cs.length shouldBe (n + 127) / 128
      cs.map(_.getLong(2)).sum shouldBe n.toLong
      cs.dropRight(1).foreach(_.getLong(2) shouldBe 128L)
      cs.map(_.getLong(1)).toSeq shouldBe (0L until cs.length.toLong)
    }
  }

  test("batched BPE with cand=1 ≡ sequential greedy on random corpora") {
    import spark.implicits._
    // random corpora over a small alphabet (guaranteed repeated pairs);
    // each case runs 2×K Spark jobs, so the case count is small
    val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc: Gen[String] = Gen.chooseNum(5, 14)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    (0 until 3).foreach { case i =>
      val texts = samples(doc, 6 + i)
      val d = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val seqMerges = ops.Pipeline.bpeTrainFrom(spark, d, steps = 3,
        needState = false)._1.collect().toSeq
      val batched = ops.Pipeline.bpeTrainBatchedFrom(spark, d, rounds = 3,
        cand = 1, cap = 3)
        .select("step", "l_tok", "r_tok", "cnt").collect().toSeq
      withClue(s"corpus $i (${texts.take(2).mkString(" | ")}…): ") {
        batched shouldBe seqMerges
      }
    }
  }

  test("batched BPE round merges are token-disjoint and counts are true pre-round counts") {
    import spark.implicits._
    val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc: Gen[String] = Gen.chooseNum(6, 16)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(doc, 8)
    val d = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      .toDF("doc_id", "text")
    val out = ops.Pipeline.bpeTrainBatchedFrom(spark, d, rounds = 3,
      cand = 4, cap = 10).collect()
    out.length should be > 0
    // disjointness within each round (the exactness precondition)
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val sets = rows.map(r => Set(r.getString(2), r.getString(3)))
      for (i <- sets.indices; j <- sets.indices if i < j)
        sets(i).intersect(sets(j)) shouldBe empty
    }
    // each round's first pick IS the global argmax of its pre-round
    // state: replay the merges sequentially and re-count
    val firstRound = out.filter(_.getInt(1) == 1)
    val top = firstRound.minBy(_.getInt(0))
    val naive = texts.flatMap(t => t.split(" ").sliding(2).map(p => (p(0), p(1))).toSeq)
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val best = naive.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
    (top.getString(2), top.getString(3)) shouldBe best._1
    top.getLong(4) shouldBe best._2
  }

  test("packing invariants hold on random synthetic documents") {
    import spark.implicits._
    // random doc sizes ≤ capacity (a doc larger than a bin legitimately
    // skips bin ids — contiguity is only guaranteed for fitting docs);
    // two sources to prove per-shard independence
    val sizes = samples(Gen.choose(1, 2000), 30)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, s"src${i % 2}", n.toLong) }
      .toDF("doc_id", "source", "n_toks")
    val bins = ops.Pipeline.packBins(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // all docs land somewhere; bins contiguous from 0 per source; a bin
    // never exceeds capacity + (max doc − 1) since docs bin where they start
    bins.map(_._3).sum shouldBe sizes.length.toLong
    val maxDoc = sizes.max.toLong
    bins.foreach { case (_, _, _, tokSum) =>
      tokSum should be < 2048L + maxDoc
    }
    bins.groupBy(_._1).foreach { case (_, bs) =>
      val ids = bs.map(_._2).sorted
      ids shouldBe (0L until ids.length.toLong)
    }
  }
}
