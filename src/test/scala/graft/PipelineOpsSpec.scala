package graft

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-4 corpus-preparation operators (ops.Pipeline): semantic
  * invariants on the real sf0.001 tables + the plan shapes the 100 TB
  * design depends on. */
class PipelineOpsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------ pii scrub

  test("pii_scrub: every doc finds the injected (2 emails, 1 phone, 1 IP) and scrubs them all") {
    val out = q("q_pii_scrub")
    out.count() should be > 0L
    out.filter(col("n_email") =!= 2L || col("n_phone") =!= 1L ||
      col("n_ip") =!= 1L).count() shouldBe 0L
    // the scrubbed tail carries the placeholders and no residual digits
    out.filter(!col("tail").contains("[PHONE]") ||
      !col("tail").contains("[IP]")).count() shouldBe 0L
    out.filter(col("tail").rlike("[0-9@]")).count() shouldBe 0L
  }

  // ------------------------------------------------------------ bpe

  test("bpe_merges: 5 distinct merges, counts non-increasing, later steps see fused tokens") {
    val out = q("q_bpe_merges").collect()
    out.length shouldBe 5
    out.map(_.getInt(0)).toSeq shouldBe (1 to 5)
    // merging only removes pair occurrences; any new pair involves the
    // fused token and is bounded by its count — best cnt never grows
    val cnts = out.map(_.getLong(3))
    cnts.zip(cnts.tail).foreach { case (a, b) => a should be >= b }
    cnts.last should be > 0L
    // no pair is learned twice (its occurrences were consumed)
    out.map(r => (r.getString(1), r.getString(2))).distinct.length shouldBe 5
  }

  test("bpe_merges50p: cand=1 degenerates to the sequential greedy schedule") {
    // with a 1-wide candidate window every round selects exactly the
    // global argmax — the batched trainer IS the sequential trainer
    val batched = graft.ops.Pipeline
      .bpeTrainBatched(spark, sf, rounds = 5, cand = 1, cap = 5)
      .select("step", "l_tok", "r_tok", "cnt").collect().toSeq
    val sequential = graft.ops.Pipeline
      .bpeTrain(spark, sf, steps = 5, needState = false)._1.collect().toSeq
    batched shouldBe sequential
  }

  test("bpe_merges50p: within-round merges are token-disjoint and counts match the sequential invariants") {
    val out = q("q_bpe_merges50p").collect()
    out.map(_.getInt(0)).toSeq shouldBe (1 to out.length)
    out.length should be > 5
    // within a round, distinct selected pairs share no token (the
    // exactness rule; a single pair may be a self-merge l==r)
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val sets = rows.map(r => Set(r.getString(2), r.getString(3)))
      for (i <- sets.indices; j <- sets.indices if i < j)
        sets(i).intersect(sets(j)) shouldBe empty
    }
    // counts non-increasing across rounds' FIRST picks (argmax shrinks)
    val firstPerRound = out.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map(_._2.minBy(_.getInt(0)).getLong(4))
    firstPerRound.zip(firstPerRound.tail).foreach { case (a, b) => a should be >= b }
    // no pair learned twice
    out.map(r => (r.getString(2), r.getString(3))).distinct.length shouldBe out.length
  }

  test("bpe_apply: merged token count never exceeds raw; some doc actually compresses") {
    val out = q("q_bpe_apply")
    out.filter(col("n_merged") > col("n_raw")).count() shouldBe 0L
    out.filter(col("n_merged") < col("n_raw")).count() should be > 0L
    out.filter(col("ratio") <= 0.0 || col("ratio") > 1.0).count() shouldBe 0L
  }

  test("bpe_apply50p: the 50-merge batched vocabulary compresses at least as much as the 5-merge one") {
    val a5 = q("q_bpe_apply")
      .select(col("doc_id"), col("n_merged").as("m5"))
    val a50 = q("q_bpe_apply50p")
      .select(col("doc_id"), col("n_merged").as("m50"), col("n_raw"))
    val joined = a50.join(a5, "doc_id")
    joined.filter(col("m50") > col("n_raw")).count() shouldBe 0L
    // deterministic golden on the fixed corpus: the 50-merge batched
    // vocabulary strictly out-compresses the 5-merge sequential one
    // corpus-wide (the schedules differ, so this is an empirical pin of
    // the vocab-size payoff, not a per-doc theorem)
    val t50 = joined.agg(sum("m50")).head.getLong(0)
    val t5 = joined.agg(sum("m5")).head.getLong(0)
    t50 should be < t5
  }

  test("pack_bins_bpe: bin budgets ride the artifact tokenizer, not the whitespace estimate") {
    val bpe = q("q_pack_bins_bpe")
    val ws = q("q_pack_bins")
    // totals agree with the tokenizer the bins claim to budget for —
    // every token q_bpe_apply50p counts lands in exactly one bin
    val binTotal = bpe.agg(sum("tok_sum")).head.getLong(0)
    val applyTotal = q("q_bpe_apply50p").agg(sum("n_merged")).head.getLong(0)
    binTotal shouldBe applyTotal
    val docTotal = bpe.agg(sum("n_docs")).head.getLong(0)
    docTotal shouldBe q("q_bpe_apply50p").count()
    // the footgun made measurable: whitespace counts over-budget every
    // bin by the compression ratio — strictly fewer TOKENS corpus-wide
    // (bin COUNT only drops once a source's overcount crosses a 2048
    // boundary, so it is ≤, not <, at the test SF)
    bpe.count() should be <= ws.count()
    binTotal should be < ws.agg(sum("tok_sum")).head.getLong(0)
  }

  // ------------------------------------------------------------ chunking

  test("doc_chunks: per-doc chunk token counts sum to the doc token count") {
    val chunks = q("q_doc_chunks")
      .groupBy("doc_id").agg(sum("chunk_toks").as("toks"), count(lit(1)).as("n"))
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), functions.size(functions.split(col("text"), " ")).cast("long").as("toks"))
    chunks.join(docs, "doc_id")
      .filter(chunks("toks") =!= docs("toks")).count() shouldBe 0L
  }

  test("doc_chunks: every non-final chunk is exactly full (128 tokens)") {
    val w = q("q_doc_chunks")
      .withColumn("max_idx", max(col("chunk_idx"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    w.filter(col("chunk_idx") < col("max_idx") && col("chunk_toks") =!= 128)
      .count() shouldBe 0L
  }

  test("doc_chunks plan is scan->generate: no shuffle except the output sort") {
    val p = q("q_doc_chunks").queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  // ------------------------------------------------------------ sampling

  test("mixture_sample: kept fraction per source tracks the (K+1)/10 rate") {
    val totals = graft.io.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("total"))
    val kept = q("q_mixture_sample")
      .groupBy("source").agg(count(lit(1)).as("kept"))
    val rows = totals.join(kept, Seq("source"), "left")
      .select(col("source"),
        (coalesce(col("kept"), lit(0L)) / col("total")).as("frac"),
        least((substring(col("source"), 4, 2).cast("long") + 1) / 10.0,
          lit(1.0)).as("rate")) // srcK for K>=10 clamps to keep-all
      .collect()
    rows should not be empty
    // hash sampling at ~50 docs/source: generous tolerance, but the
    // ordering of rates must show through (src9 keeps more than src0)
    rows.foreach { r =>
      val (frac, rate) = (r.getDouble(1), r.getDouble(2))
      frac should be(rate +- 0.35)
    }
  }

  test("sample_fixed: exactly min(10, total) docs per source, deterministic") {
    val totals = graft.io.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q_sample_fixed").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    kept.keySet shouldBe totals.keySet
    kept.foreach { case (src, n) => n shouldBe math.min(10L, totals(src)) }
    val again = q("q_sample_fixed").collect()
    q("q_sample_fixed").collect().map(_.toString) shouldBe again.map(_.toString)
  }

  test("mixture_sample is deterministic: two runs produce identical rows") {
    val a = q("q_mixture_sample").collect()
    val b = q("q_mixture_sample").collect()
    a should contain theSameElementsInOrderAs b
  }

  // -------------------------------------------------------------- decontam

  test("decontam: never flags a benchmark doc; ratio in (0, 1]") {
    val out = q("q_decontam").collect()
    out.foreach { r =>
      (r.getLong(0) % 20) should not be 0L
      val ratio = r.getDouble(2)
      ratio should be > 0.0
      ratio should be <= 1.0
    }
  }

  test("decontam: the benchmark shingle side broadcasts (no shuffle of the corpus on shingles)") {
    val p = q("q_decontam").queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
  }

  // ------------------------------------------------------------------ BM25

  test("bm25: scores are positive, sorted desc, and docs contain a query term") {
    val rows = q("q_bm25").collect()
    rows.length should be > 0
    rows.length should be <= 20
    val scores = rows.map(_.getDouble(2))
    scores shouldBe scores.sortBy(-_)
    scores.foreach(_ should be > 0.0)
    // every scored doc must actually contain >=1 of the fixed terms
    val ids = rows.map(_.getLong(0))
    val hit = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"),
        graft.ops.Pipeline.Bm25Terms
          .map(t => array_contains(functions.split(col("text"), " "), t))
          .reduce(_ || _).as("has"))
      .filter(!col("has")).count()
    hit shouldBe 0L
  }

  test("bm25: corpus stats broadcast back over the scoring scan (no wide shuffle)") {
    val df = q("q_bm25")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    p should include("TakeOrderedAndProject")
    // the only join is the one-row stats broadcast
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  // ------------------------------------------------------------ repetition

  test("repetition: fold result equals a plain-Scala recompute on every doc") {
    val expected = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ", -1)
        var best = 0; var run = 0; var prev: String = null
        t.foreach { tok =>
          run = if (tok == prev) run + 1 else 1
          if (run > best) best = run
          prev = tok
        }
        r.getLong(0) -> (t.length.toLong, best.toLong)
      }.toMap
    val got = q("q_repetition").collect()
    got.length shouldBe expected.size
    got.foreach { r =>
      val (nToks, maxRun) = expected(r.getLong(0))
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getLong(1) shouldBe nToks
        r.getLong(2) shouldBe maxRun
      }
    }
  }

  test("repetition is per-row: no hash exchange in the plan") {
    val p = q("q_repetition").queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  // ---------------------------------------------------------- quantization

  test("emb_quant: q values within int8 range, scale positive, small MSE") {
    val rows = q("q_emb_quant").collect()
    rows.length shouldBe graft.io.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      r.getDouble(1) should be > 0.0 // scale
      r.getLong(2) should be >= -127L
      r.getLong(3) should be <= 127L
      // int8 reconstruction error is bounded by (scale/2)^2 per element
      val bound = math.pow(r.getDouble(1) * 1e6 / 2, 2) / 1e12 // scale6 back
      r.getDouble(4) should be <= bound * 1.01 + 1e-9
    }
  }

  test("emb_quant is per-row: no hash exchange in the plan") {
    val p = q("q_emb_quant").queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  test("chunk_dedup finds cross-document duplicate chunks with the right keeper") {
    import spark.implicits._
    val block = (0 until 128).map(i => s"w$i").mkString(" ")
    val other = (0 until 130).map(i => s"x$i").mkString(" ")
    // doc 5 repeats doc 3's first (full) chunk; doc 7 is unrelated
    val docs = Seq((3L, block + " tail tokens here"),
      (5L, block), (7L, other)).toDF("doc_id", "text")
    val dups = graft.ops.Pipeline.chunkDocs(docs)
      .groupBy(col("chunk_fp"))
      .agg(count(lit(1)).as("n_dups"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"))
      .filter(col("n_dups") > 1).collect()
    dups.length shouldBe 1
    dups.head.getLong(1) shouldBe 2L // the block appears in docs 3 and 5
    dups.head.getStruct(2).getLong(0) shouldBe 3L // keeper = smallest doc
    // at sf0.1 the real corpus has duplicate chunks; sf0.001 has none —
    // the query is data-honest either way (exact-matched empty result)
  }

  test("token_gini: fold result equals a plain-Scala recompute; bounds hold") {
    val expected = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ", -1)
        val sumsq = t.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
        val n = t.length.toLong
        r.getLong(0) -> BigDecimal(1.0 - sumsq.toDouble / (n * n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    val got = q("q_token_gini").collect()
    got.length shouldBe expected.size
    got.foreach { r =>
      val g = r.getDouble(2)
      g should be >= 0.0
      g should be < 1.0
      withClue(s"doc ${r.getLong(0)}: ") { g shouldBe expected(r.getLong(0)) }
    }
  }

  test("token_gini is per-row: no hash exchange in the plan") {
    val p = q("q_token_gini").queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  // ---------------------------------------------------------- quantized ANN

  test("sim_topk_q8: quantized ranking closely tracks the float ranking") {
    val exact = graft.ops.LlmOps.qSimTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val q8 = q("q_sim_topk_q8").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    q8.keySet shouldBe exact.keySet
    // int8 quantization on 64-dim vectors preserves most of the top-10:
    // require >= 7/10 overlap per query (measured ~9-10/10)
    q8.foreach { case (qid, nbrs) =>
      withClue(s"query $qid: ") {
        (nbrs intersect exact(qid)).size should be >= 7
      }
    }
  }

  test("vec_dot_i8 has zip_with parity in the degenerate cases") {
    import spark.implicits._
    graft.expressions.Q8VectorDot.register(spark)
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType
    val df = Seq(
      (Seq[Byte](1, 2, 3), Seq[Byte](4, 5, 6)),   // 1*4+2*5+3*6 = 32
      (Seq[Byte](1, 2), Seq[Byte](4, 5, 6)),      // length mismatch
      (Seq[Byte](127, -128), Seq[Byte](127, -128))) // extremes: 127²+128²
      .toDF("a", "b")
    val got = df.select(expr("vec_dot_i8(a, b)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    got.toSeq shouldBe Seq(Some(32L), None, Some(127L * 127 + 128L * 128))
  }

  // --------------------------------------------------------------- packing

  test("pack_bins: bin token sums within a source never exceed capacity + max doc") {
    // a doc is assigned to the bin where its span STARTS, so a bin can
    // overflow by at most (longest doc - 1) tokens
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), functions.size(functions.split(col("text"), " ")).cast("long").as("n"))
    val maxDoc = docs.agg(max("n")).head().getLong(0)
    val bad = q("q_pack_bins")
      .filter(col("tok_sum") >= lit(2048L) + lit(maxDoc)).count()
    bad shouldBe 0L
  }

  test("pack_bins: bins are contiguous from 0 per source and cover all docs") {
    val bins = q("q_pack_bins")
    val perSource = bins.groupBy("source")
      .agg(min("bin_id").as("mn"), max("bin_id").as("mx"),
        count(lit(1)).as("n_bins"), sum("n_docs").as("docs"))
      .collect()
    perSource.foreach { r =>
      r.getLong(1) shouldBe 0L // min bin id
      r.getLong(3) shouldBe (r.getLong(2) + 1) // contiguous: n_bins = max+1
    }
    val totalDocs = perSource.map(_.getLong(4)).sum
    totalDocs shouldBe graft.io.Tables.documents(spark, sf).count()
  }

  // ------------------------------------------------------ mixture temp

  test("mixture_temp: tiny sources are kept whole (rate capped at 1)") {
    // sf0.001 has 25 docs/source -> 8/sqrt(25) = 1.6, capped: thresh
    // must be exactly 1e6 and every doc survives
    val out = q("q_mixture_temp")
    out.count() shouldBe 20
    out.filter(col("thresh") =!= 1000000L).count() shouldBe 0
    out.filter(col("n_kept") =!= col("n_docs")).count() shouldBe 0
    out.filter(col("realized") =!= 1.0).count() shouldBe 0
  }
}
