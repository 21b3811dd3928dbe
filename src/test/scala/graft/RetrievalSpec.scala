package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Retrieval

/** Semantic + plan invariants of the retrieval-composition tier:
  * RRF fusion must agree with a from-first-principles recomputation of
  * the formula over the two systems' lists, and filtered ANN must obey
  * the family's subset-with-equal-scores law against its brute-force
  * filtered truth (plus a recall floor and the predicate itself). */
class RetrievalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("RRF fusion ≡ independent recomputation from the two ranked lists") {
    val fused = Retrieval.qHybridRrf(spark, sf).collect()
    fused.length shouldBe 20
    // rebuild both systems' rank maps in memory, straight from the op's
    // published contract (top-50 by rounded score, id tiebreak)
    val lex = ops.Pipeline.bm25Scores(spark, sf)
      .filter(col("score") > 0).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val e = graft.io.Tables.embeddings(spark, sf)
    val dense = {
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      e.filter(col("vec_id") =!= 0).select("vec_id", "embedding").collect()
        .map { r =>
          val v = r.getSeq[Float](1).map(_.toDouble).toArray
          val cos = v.zip(qv).map { case (a, b) => a * b }.sum /
            (math.sqrt(v.map(x => x * x).sum) * qn)
          (r.getLong(0), BigDecimal(cos).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }.take(50)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    }
    // every fused row's ranks and score match the recomputation
    fused.foreach { r =>
      val id = r.getLong(0)
      val lexR = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val denR = if (r.isNullAt(2)) None else Some(r.getLong(2))
      withClue(s"doc $id: ") {
        lexR shouldBe lex.get(id)
        denR shouldBe dense.get(id)
        val expect = lexR.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0) +
          denR.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0)
        r.getDouble(3) shouldBe (BigDecimal(expect).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    // the fused top-20 IS the top-20 of the full fused universe
    val universe = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val s = lex.get(id).map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0) +
        dense.get(id).map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0)
      (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    fused.map(_.getLong(0)).toSeq shouldBe universe
    // a doc retrieved by BOTH systems must outrank one retrieved by a
    // single system at any deeper rank (the fusion's raison d'être)
    val both = fused.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    both should not be empty
  }

  test("filtered ANN: predicate holds, subset-with-equal-scores of " +
      "filtered brute truth, recall floor, filter pushed to the scan") {
    val approx = Retrieval.qAnnFiltered(spark, sf)
    val got = approx.collect()
    got.length should be > 0
    // every surfaced neighbor satisfies the predicate
    val evens = graft.io.Tables.embeddings(spark, sf)
      .filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.foreach { r =>
      withClue(s"neighbor ${r.getLong(1)}: ") {
        evens should contain(r.getLong(1))
      }
    }
    // score-equality law: where the banded top-5 and the brute top-5
    // agree on a pair, the surfaced cosine is the identical value (an
    // approximate path may MISS neighbors, never mis-score them)
    val brute = Retrieval.annFilteredBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(_ shouldBe r.getDouble(2))
    }
    // recall@5 of the banded path vs the brute truth, per probe
    val byProbe = got.groupBy(_.getLong(0))
    val truthByProbe = brute.keySet.groupBy(_._1)
    val recalls = truthByProbe.map { case (qid, tset) =>
      val hit = byProbe.getOrElse(qid, Array.empty)
        .count(r => tset.contains((qid, r.getLong(1))))
      hit.toDouble / tset.size
    }
    recalls should not be empty
    // 4×3 banding measured ≥ 0.6 on this corpus at k=5; the floor
    // guards a plane/predicate regression, not noise
    (recalls.sum / recalls.size) should be >= 0.6
    // the predicate sits BELOW the banding explode in the optimized
    // plan — candidate generation pays selectivity × corpus, never
    // post-filters full candidate volume. (A PushedFilters check would
    // be vacuous here: modulo isn't a parquet-translatable predicate,
    // so the scan only ever shows the inferred IsNotNull.)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    val opt = approx.queryExecution.optimizedPlan
    val gens = opt.collect { case g: Generate => g }
    gens should not be empty
    val labelFilterBelowExplode = gens.exists(_.child.collectFirst {
      case f: Filter
        if f.condition.references.exists(_.name == "label") => f
    }.nonEmpty)
    withClue("label predicate must be beneath the banding Generate: ") {
      labelFilterBelowExplode shouldBe true
    }
  }

  test("filtered GRAPH ANN: predicate holds, scores exact, recall floor, " +
      "predicate below every walk join") {
    val approx = SparkEntry.queries("q_ann_graph_filtered")(spark, sf)
    val got = approx.collect()
    got.length should be > 0
    // every surfaced neighbor satisfies the predicate — the walk's
    // scoring projection is eligible-only, not a post-filter
    val evens = graft.io.Tables.embeddings(spark, sf)
      .filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.foreach { r =>
      withClue(s"neighbor ${r.getLong(1)}: ") {
        evens should contain(r.getLong(1))
      }
    }
    // score-equality law (shared with every approximate tier): where
    // the walk and the brute truth agree on a pair, values are equal
    val brute = Retrieval.annFilteredBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(_ shouldBe r.getDouble(2))
    }
    // recall@5 vs the filtered brute truth: measured 0.87 at sf0.01 —
    // the floor matches the banded tier's (a ~50% predicate leaves the
    // degree-10 bidirectional graph navigable; heavier filters belong
    // on the banded tier, which this suite documents above)
    val byProbe = got.groupBy(_.getLong(0))
    val truthByProbe = brute.keySet.groupBy(_._1)
    val recalls = truthByProbe.map { case (qid, tset) =>
      val hit = byProbe.getOrElse(qid, Array.empty)
        .count(r => tset.contains((qid, r.getLong(1))))
      hit.toDouble / tset.size
    }
    recalls should not be empty
    (recalls.sum / recalls.size) should be >= 0.6
    // selectivity-proportional cost: the label predicate sits BELOW
    // every join of the walk (directly over the scan), so ineligible
    // nodes are never scored — a post-filtering walk would show the
    // Filter above a Join
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val opt = approx.queryExecution.optimizedPlan
    val labelFilters = opt.collect {
      case f: Filter if f.condition.references.exists(_.name == "label") => f
    }
    labelFilters should not be empty
    withClue("label predicate must sit beneath the walk's joins: ") {
      labelFilters.exists(f =>
        f.collectFirst { case j: Join => j }.isEmpty) shouldBe true
    }
  }

  test("MMR rerank ≡ independent greedy recomputation; diversification " +
      "actually reorders pure relevance") {
    val got = Retrieval.qMmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.map(_._2).toSeq shouldBe (1L to Retrieval.MmrK)
    // independent mirror: candidates, pairwise sims, greedy rounds —
    // all recomputed from raw embeddings with the op's published
    // rounding/tiebreak contract
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = graft.io.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val qv = e(0L)
    val cand = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(v, qv))) }
      .sortBy { case (id, rel) => (-rel, id) }.take(Retrieval.MmrCand)
    val lam = Retrieval.MmrLambda
    var selected = Vector(
      (cand.head._1, 1L, r6(lam * cand.head._2)))
    var remaining = cand.tail
    for (r <- 2 to Retrieval.MmrK) {
      val scored = remaining.map { case (id, rel) =>
        val msim = selected.map(s => r6(cos(e(id), e(s._1)))).max
        (id, r6(lam * rel - (1.0 - lam) * msim))
      }
      val pick = scored.minBy { case (id, m) => (-m, id) }
      selected :+= ((pick._1, r.toLong, pick._2))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    got.toSeq shouldBe selected
    // the rerank must actually diversify: the selected set differs
    // from the pure-relevance top-K (if it didn't, the penalty term
    // would be dead code on this corpus)
    got.map(_._1).toSet should not be cand.take(Retrieval.MmrK)
      .map(_._1).toSet
  }
}
