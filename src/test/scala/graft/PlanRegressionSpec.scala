package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the round-3 plan-shape guarantees so refactors can't silently
  * regress them:
  *  - tf-idf / lang-ID: the wide (doc_id, token) shuffle materializes
  *    ONCE — the derived branch reuses it (ReusedExchange in the final
  *    adaptive plan). The branch shapes are deliberately engineered for
  *    this (see qTfidf/qLangId comments); a change that breaks canonical
  *    equality of the two subtrees doubles the dominant scan+explode.
  *  - SimHash: computed per row; the only exchange in the whole plan is
  *    the output determinism sort.
  */
class PlanRegressionSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE stages so reuse is visible
    df.queryExecution.executedPlan.toString
  }

  test("standing BM25 serve: the ENTRY's plan keeps the bucketed, bucket-pruned postings scan") {
    // r18 verdict item 1: the PRODUCTION plan — no session knob — must
    // read the postings store bucketed with Spark's own bucket set
    // pruned to the probed terms (the posting-uniqueness fold's
    // grouping keys contain the bucket column, which is what keeps
    // DisableUnnecessaryBucketedScan away); TxFileIndex additionally
    // prunes the same files manifest-side (LexIndexSpec pins that)
    val p = finalPlan("q_incr_bm25")
    p should include("SelectedBucketsCount")
    p should not include "Bucketed: false"
  }

  test("standing BM25 serve reads the postings store ONCE — df rides a window over the same scan") {
    // r20 (r19 verdict "what's wrong" #2): the single-query serve used
    // to make TWO pruned passes over the postings (a separate df
    // aggregate); unified onto the servedScoresMulti one-pass shape,
    // the plan must reference the postings table in exactly one scan
    val p = finalPlan("q_incr_bm25").split("Initial Plan")(0)
    "graft_txlex_post_".r.findAllIn(p).length shouldBe 1
  }

  test("batched lexical serve: bucketed pruned postings scan, probe relation broadcast") {
    val p = finalPlan("q_bm25_multi")
    p should include("SelectedBucketsCount")
    p should not include "Bucketed: false"
  }

  test("tf-idf reuses the exploded-token shuffle across tf and df branches") {
    finalPlan("q_tfidf") should include("ReusedExchange")
  }

  test("lang-ID reuses the per-doc token-count shuffle across branches") {
    finalPlan("q_lang_id") should include("ReusedExchange")
  }

  test("SimHash is per-row: no hash-partition exchange anywhere in the plan") {
    val p = finalPlan("q_simhash")
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 0
  }

  test("trained-IVF serving: literal-centroid front, broadcast probes, one top-k shuffle") {
    // the promoted cell-probed tier's scale shape: assignment and probe
    // ranking are per-row projections over LITERAL trained centroids
    // (no centroid join, no assignment exchange), the probe set
    // broadcasts, and the only hash-partition exchange in the plan is
    // the per-query top-k window — the shape that lets the corpus side
    // stay cell-pruned files at 100 TB
    // count within the FINAL plan section only — after collect() the
    // AdaptiveSparkPlan string repeats the tree under "== Initial Plan =="
    val p = finalPlan("q_ann_ivf_kmeans").split("== Initial Plan ==")(0)
    p should include("BroadcastHashJoin")
    ("(?i)SortMergeJoin".r.findAllIn(p).length) shouldBe 0
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 1
  }

  test("dedup-cluster candidates come from the banded equi-join, never a shingle self-join") {
    // q_dedup_clusters/q_dedup_keep consume dedupCandidatePairs; its plan
    // must join on the 16-minhash band key (bkey), and the raw shingle
    // string (sh) must never be a join key — the O(Σ bucket²) hot-shingle
    // blowup was the last scale-killer wired into a production artifact
    val df = ops.LlmOps.dedupCandidatePairs(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    p should include("bkey")
    p should not include "sh#"
  }

  test("simhash-dedup argmin is a partial-aggregating hash agg, not a window") {
    val p = finalPlan("q_simhash_dedup")
    // the per-doc best neighbor must partially aggregate BEFORE the
    // exchange (map-side combine bounds the shuffle at 1 row/doc/task);
    // a window row_number formulation would shuffle every candidate row
    p should include("partial_min")
    p should not include "row_number"
  }

  test("banded range join is a hash join, not a nested loop") {
    val p = finalPlan("q_join_range_banded")
    p should not include "BroadcastNestedLoop"
    p should not include "CartesianProduct"
  }

  test("scan filter pushes to the parquet reader") {
    val p = SparkEntry.queries("q_scan_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    p should include("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]")
  }

  test("similarity queries are auto-vectorized: HOF dot → native kernel") {
    // The ops code writes the portable aggregate(zip_with(...)) form;
    // plans.VecDotRewrite (injected via GraftExtensions) must swap in the
    // codegen kernels. If this pin fails the queries are still CORRECT
    // (same fold, ~15× slower) — which is exactly why a plan pin is
    // needed: the oracle gate alone would never catch the regression.
    for (q <- Seq("q_sim_topk", "q_dedup_cosine", "q_ann_buckets")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString
      withClue(s"$q:") {
        p should include("vec_dot")
        (p should not).include("aggregate(zip_with")
      }
    }
    SparkEntry.queries("q_sim_topk_q8")(spark, sf)
      .queryExecution.optimizedPlan.toString should include("vec_dot_i8")
  }

  test("top-k-per-group prunes via WindowGroupLimit before the full sort") {
    // q_sim_topk filters row_number() <= 10: Spark's InferWindowGroupLimit
    // must insert the per-partition rank-limit pushdown so each map task
    // forwards at most k rows per group instead of sorting every
    // candidate — the plan property that keeps per-group top-k viable at
    // the 100 TB design point.
    val p = SparkEntry.queries("q_sim_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    p should include("WindowGroupLimit")
  }

  test("bloom prefilter is broadcast semi-joins — the corpus never shuffles on shingles") {
    // q_bloom_decontam's k=3 membership probes must plan as
    // BroadcastHashJoin LeftSemi (map-side filters over the tiny bit
    // relation); a sort-merge/shuffled semi-join would shuffle the whole
    // corpus shingle stream and erase the sketch's scale advantage
    // AQE's executedPlan string shows final + initial plans, so count
    // per-section: the final plan (before "Initial Plan") must carry all
    // three semi-joins, and the bit relation must broadcast ONCE (two
    // ReusedExchange references)
    val p = finalPlan("q_bloom_decontam").split("Initial Plan")(0)
    "BroadcastHashJoin .*LeftSemi".r.findAllIn(p).length shouldBe 3
    // the exact verify against the benchmark set broadcasts too
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
  }

  test("count-min probe joins against a broadcast sketch") {
    // the d×w cell relation is bounded (3072 rows) regardless of corpus
    // size — probing must broadcast it, never shuffle the probes
    val p = finalPlan("q_cms_freq")
    p should include("BroadcastHashJoin")
  }

  test("shard shuffle is one hash exchange + per-shard sort, never a global sort rank") {
    // q_shuffle_shards' contract is "training-order shuffle WITHOUT a
    // global sort": the window must rank within the shard hash
    // partitions (one hashpartitioning exchange); only the small final
    // presentation orderBy may range-partition
    val df = SparkEntry.queries("q_shuffle_shards")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 1
    p should include("Window")
  }

  test("embedding outlier centroids broadcast back over the vector stream") {
    // centroids are |labels|x|dim| rows and the label-norm relation is
    // |labels| rows — both must broadcast; a sort-merge join here would
    // shuffle the full exploded vector stream twice at corpus scale
    val df = SparkEntry.queries("q_emb_outliers")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("split report reads only the three referenced document columns") {
    // the split hash + token count need doc_id and text, the report
    // needs source; lang/n_chars must be pruned from the parquet scan
    val p = SparkEntry.queries("q_split")(spark, sf)
      .queryExecution.executedPlan.toString
    p should include("ReadSchema: struct<doc_id:bigint,text:string,source:string>")
  }

  test("projection prunes the scan to the referenced columns") {
    val p = SparkEntry.queries("q_proj_arith")(spark, sf)
      .queryExecution.executedPlan.toString
    // lineitem has 11 columns; the scan must read only the 4 used
    p should include("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_discount:double>")
  }
}
