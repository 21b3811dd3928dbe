package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.LlmOps

/** Cross-query semantic invariants of the near-dup family: every pair an
  * approximate (LSH/banded) path surfaces must also appear — with the
  * SAME score — in the corresponding exact path's result. Recall may be
  * < 1; precision of surfaced pairs must be exact. */
class RecallSubsetSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("banded cosine pairs (both operating points) are a subset of brute-force pairs, scores equal") {
    val brute = LlmOps.dedupCosineAllPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the cheap end of the dial (3 tables x 4 bits)
    val lsh = LlmOps.qDedupCosineLsh(spark, sf).collect()
    lsh.length should be > 0
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      withClue(s"pair $key: ") {
        brute.get(key) shouldBe Some(r.getDouble(2))
      }
    }
    lsh.length should be <= brute.size
    // the production entry (4 tables x 3 bits): same subset law, plus a
    // recall floor — measured ~0.70 on this isotropic corpus at the
    // θ=0.4 parity threshold (near-threshold pairs are the hard case;
    // the floor guards against a plane/banding regression, not noise)
    val banded = LlmOps.qDedupCosine(spark, sf).collect()
    banded.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      withClue(s"pair $key: ") {
        brute.get(key) shouldBe Some(r.getDouble(2))
      }
    }
    banded.length.toDouble should be >= 0.5 * brute.size
    // 4x3 must out-recall 3x4 on the same corpus — the dial's whole point
    banded.length should be >= lsh.length
  }

  test("MinHash-banded pairs are a subset of shared-shingle Jaccard pairs, scores equal") {
    val exact = LlmOps.qNgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = LlmOps.qMinhashLsh(spark, sf).collect()
    banded.length should be > 0
    banded.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      withClue(s"pair $key: ") {
        exact.get(key) shouldBe Some(r.getDouble(2))
      }
    }
  }

  test("SimHash 4x15 banding is LOSSLESS at hamming <= 3 (pigeonhole): matches brute force") {
    import org.apache.spark.sql.functions._
    // brute force: all-pairs popcount hamming over the signatures
    val sigs = LlmOps.simhashSigs(spark, sf)
    val a = sigs.select(col("doc_id").as("da"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("db"), col("simhash").as("sb"))
    val brute = a.join(b, col("da") =!= col("db"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 3)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("da")
          .orderBy(col("hamming"), col("db"))))
      .filter(col("rn") === 1)
      .select(col("da"), col("db"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val banded = LlmOps.qSimhashDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    banded.length should be > 0
    banded shouldBe brute // not a subset: recall is exactly 1 at this radius
  }

  test("PQ+rerank recall@5 >= IVF recall@5, at a smaller exact-read budget") {
    import org.apache.spark.sql.functions._
    val e = graft.io.Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // exact brute-force top-5 per query, by dot (PQ's metric) AND by
    // cosine (IVF's metric) — each path is graded against its own
    // metric's ground truth
    val dotc = graft.ops.VectorForms.dot(col("embedding"), col("qv"))
    val cosc = dotc / (graft.ops.VectorForms.norm(col("embedding")) *
      graft.ops.VectorForms.norm(col("qv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("d").desc, col("vec_id"))
    def bruteTop5(metric: org.apache.spark.sql.Column) =
      e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), round(metric, 6).as("d"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteDot = bruteTop5(dotc)
    val bruteCos = bruteTop5(cosc)
    val pq = SparkEntry.queries("q_ann_pq")(spark, sf)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = (pq & bruteDot).size / 15.0
    val ivfRecall = (ivf & bruteCos).size / 15.0
    withClue(s"pq=$pqRecall ivf=$ivfRecall: ") {
      pqRecall should be >= ivfRecall
    }
    pqRecall should be >= 0.8 // absolute floor, not just relative

    // the composed IVF+PQ stack (coarse cells + residual ADC + rerank)
    // pays BOTH the cell restriction and the quantization, so its bar is
    // the probabilistic floor, not IVF equality
    val ivfpq = SparkEntry.queries("q_ann_ivfpq")(spark, sf)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqRecall = (ivfpq & bruteDot).size / 15.0
    withClue(s"ivfpq=$ivfpqRecall: ") {
      ivfpqRecall should be >= 0.8
    }

    // PRODUCTION codebook (per-subspace Lloyd via kmeansCentroids) must
    // clear the same bar as the shipped sampled codebook: recall@5 >=
    // the IVF path's (the sampled codebook sits at the 15/15 ceiling on
    // this corpus, so ">= sampled" would demand perfection of any
    // alternative — the contract is the IVF bar, same as above)
    val kmeansPq = LlmOps.annPqFrom(e, LlmOps.pqCodebookKmeans(e))
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kmeansRecall = (kmeansPq & bruteDot).size / 15.0
    withClue(s"kmeansPq=$kmeansRecall ivf=$ivfRecall: ") {
      kmeansRecall should be >= ivfRecall
    }
  }

  test("oracled PQ-tier metric: pq_recall holds its floor and dominates ivfpq") {
    // q_ann_recall_pq is the ORACLED form of the 3-probe measurement
    // above, over the 1-in-20 sample and dot-ranked truth: sf0.01
    // measured pq 0.808, ivfpq 0.416 (ivfpq is bounded by its nprobe=2
    // cell recall — plain IVF measures 0.424 on the same sample in
    // q_ann_recall_tiers, so residual-PQ quantization costs ~nothing
    // on top of the cell restriction)
    val row = SparkEntry.queries("q_ann_recall_pq")(spark, sf).head()
    val pq = row.getAs[Double]("pq_recall")
    val ivfpq = row.getAs[Double]("ivfpq_recall")
    withClue(s"pq_recall $pq vs ivfpq_recall $ivfpq: ") {
      pq should be >= ivfpq
      pq should be >= 0.7
    }
  }

  test("oracled recall-vs-cost curve justifies the cell-probe demotion AND the trained-tier promotion") {
    val rows = SparkEntry.queries("q_ann_recall_curve")(spark, sf).collect()
    rows.length shouldBe 10
    val byKey = rows.map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    def recall(t: String, np: Int) = byKey((t, np)).getAs[Double]("recall")
    def cand(t: String, np: Int) = byKey((t, np)).getAs[Long]("cand_pairs")
    // recall and scanned cost rise monotonically with the dial
    for (t <- Seq("ivf", "ivfpq", "ivf_km")) {
      recall(t, 2) should be <= recall(t, 4)
      recall(t, 4) should be <= recall(t, 8)
      cand(t, 2) should be < cand(t, 4)
      cand(t, 4) should be < cand(t, 8)
    }
    // the demotion evidence (crosswalk: IVF/IVFADC are candidate
    // generation, not serving): no sub-exhaustive dial clears the 0.8
    // serving floor — nprobe=8 of 8 cells IS the brute scan — and
    // IVFADC stays below the floor even exhaustive (quantization-
    // capped). Measured 0.424/0.712/1.0 (ivf) and 0.416/0.56/0.744
    // (ivfpq) at 500 vectors; the oracle hash-gates the exact values.
    recall("ivf", 4) should be < 0.8
    recall("ivf", 8) shouldBe 1.0 // exhaustive ≡ truth: the curve anchor
    recall("ivfpq", 8) should be < 0.8
    // the promotion evidence: the TRAINED 32-cell quantizer clears the
    // serving floor at its curve-chosen default (nprobe=16 — half the
    // brute scan; measured 0.832), and DOMINATES the deterministic
    // tier at matched scan cost (ivf_km@16 vs ivf@4: ~same cand_pairs,
    // +0.12 recall — the value Lloyd training buys)
    recall("ivf_km", LlmOps.KmIvfNprobe) should be >= 0.8
    cand("ivf_km", 16).toDouble should be(cand("ivf", 4).toDouble +- 0.1 * cand("ivf", 4))
    recall("ivf_km", 16) should be > recall("ivf", 4)
    // the curve reports ONE cost column per dial on the claim that the
    // tiers share cell assignment — test that claim across the two
    // IMPLEMENTATIONS (ivfCellParts and ivfPqParts each build their own
    // literal centroid array and argmin), not the curve against itself
    // (review r15: the old cand==cand assert compared the same relation)
    import org.apache.spark.sql.functions.{array_min, col}
    val (ei, scored) = LlmOps.ivfCellParts(spark, sf)
    val ivfAssign = ei
      .select(col("vec_id"), array_min(scored).getField("cid").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (_, codes, _, _) = LlmOps.ivfPqParts(spark, sf)
    val pqAssign = codes.select("vec_id", "ccid").distinct()
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    pqAssign shouldBe ivfAssign
  }

  test("standing PQ-codes store: probed cells prune to buckets, rows ≡ in-query") {
    val idx = SparkEntry.queries("q_ann_ivfpq_idx")(spark, sf)
    val inq = SparkEntry.queries("q_ann_ivfpq")(spark, sf)
    // encode determinism: the standing store serves the exact rows the
    // in-query encode produces (both sit under the same DuckDB oracle)
    idx.collect() shouldBe inq.collect()
    // the scale claim made literal: the probed cell ids push as bucket
    // pruning on the cell-bucketed store, so the ADC scan reads only
    // the probed cells' files — 3 probes × nprobe=2 overlapping cells,
    // never all 8
    val plan = idx.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    withClue(plan.linesIterator.filter(_.contains("Bucket"))
        .mkString("; ") + ": ") {
      m.isDefined shouldBe true
      m.get.group(1).toInt should be <= 6
    }
  }

  test("every clustered doc appears in at least one candidate pair; labels are component minima") {
    // the cluster graph's edge set IS the MinHash-banded verified pairs
    val pairs = LlmOps.qMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val clusters = LlmOps.qDedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    clusters.map(_._1).toSet shouldBe inPairs
    // a label is always <= its member and is itself a member of the graph
    clusters.foreach { case (doc, label) =>
      label should be <= doc
      inPairs should contain(label)
    }
  }
}
