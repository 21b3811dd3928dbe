package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.{Tables, TxTable}

/** LLM training-data pipeline operators (SURVEY §2 B22–B24): text
  * analysis, exact + near-duplicate detection, similarity search.
  *
  * Scale design (100 TB):
  *  - Everything per-document (tokenize, quality, fingerprint, SimHash,
  *    MinHash signatures) is a scan→project — embarrassingly parallel,
  *    no shuffle.
  *  - Candidate generation for near-dup NEVER does all-pairs: the n-gram
  *    path joins on PREFIX shingles only (positional prefix filtering —
  *    lossless at the threshold, hot shingles relegated to the
  *    un-indexed suffix by the df-ascending canonical order), the
  *    MinHash path joins on LSH band keys (equi-join on band), and the
  *    cosine path joins on random-hyperplane table keys. The all-pairs
  *    forms survive only as size-guarded spec baselines.
  *  - Similarity search broadcasts the (small) query-vector side; the
  *    corpus side streams through codegen'd higher-order functions. The
  *    100 TB paths never go all-pairs: random-hyperplane buckets
  *    (`qAnnBuckets`), multi-table LSH (`qDedupCosineLsh`), and
  *    IVF cells with nprobe=2 (`qAnnIvf`).
  *  - Floating parity with the oracle: every ratio is a SINGLE division
  *    of order-independent aggregates (exact), and ranking keys are
  *    rounded BEFORE ranking so both engines rank identical values.
  */
object LlmOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
  private def toks: Column = split(col("text"), " ")

  // ------------------------------------------------------ text analysis

  /** B22: top-50 tokens corpus-wide (tokenize→explode→count→top-k). */
  def qTextTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(50)

  /** B22: per-language corpus stats. All ratios are single divisions of
    * exact integer sums → deterministic across engines. */
  def qTextStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("lang"), col("n_chars"), toks.as("t"))
      .select(col("lang"), col("n_chars"), size(col("t")).as("n_toks"),
        size(filter(col("t"), t => t === "the" || t === "a" || t === "of"))
          .as("n_stop"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum("n_chars") / count(lit(1)), 4).as("avg_chars"),
        round(sum("n_toks") / count(lit(1)), 4).as("avg_toks"),
        round(sum("n_stop") / sum("n_toks"), 6).as("stop_ratio"))
      .orderBy("lang")

  /** B22 language-ID (n-gram/profile heuristic): build top-20 token
    * profiles per language from the corpus, vote each document's distinct
    * tokens against the profiles, emit the confusion matrix. The profile
    * table is tiny → broadcast; the one wide (doc_id, token) shuffle is
    * shared by both branches via exchange reuse (see below). */
  def qLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(toks).as("token"))
    // ONE explode + ONE wide shuffle on (doc_id, token); both downstream
    // inputs (per-language profiles, per-doc distinct tokens) derive from
    // this per-doc count instead of re-exploding the corpus (at 100 TB
    // the duplicated scan+explode is what this avoids). The explicit
    // not-null guards pre-empt the asymmetric isnotnull filters constraint
    // inference would otherwise inject into only ONE branch's scan — with
    // them the two consumers see byte-identical subtrees and Spark's
    // exchange reuse materializes the wide shuffle once.
    val perDoc = tok
      .filter(col("doc_id").isNotNull && col("token").isNotNull)
      .groupBy("doc_id", "lang", "token")
      .agg(count(lit(1)).as("cnt"))
    val wProf = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("token"))
    val profiles = perDoc.groupBy("lang", "token").agg(sum("cnt").as("cnt"))
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= 20)
      .select(col("lang").as("plang"), col("token"))
    // always-true cnt guard: keeps cnt referenced so column pruning
    // leaves this branch's aggregate identical to profiles' input →
    // Spark reuses the one (doc_id, token) shuffle for both branches
    val dtok = perDoc.filter(col("cnt") >= 1).select("doc_id", "token")
    val wVote = Window.partitionBy("doc_id")
      .orderBy(col("votes").desc, col("plang"))
    val pred = dtok.join(broadcast(profiles), "token")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(wVote))
      .filter(col("rn") === 1)
      .select("doc_id", "plang")
    docs(spark, sfDir).select("doc_id", "lang")
      .join(pred, "doc_id")
      .groupBy("lang", "plang").agg(count(lit(1)).as("n"))
      .orderBy("lang", "plang")
  }

  /** Scoring core shared by [[qQualityScore]], [[qTrainPrep]] and
    * [[Organize.qQualityCut]]: per-doc token count, uniqueness ratio and
    * composite score over the WHOLE input — no ordering, no limit, so
    * composing ops score every document regardless of corpus size (the
    * presentation-level cap lives only in [[qQualityScore]]). */
  private[graft] def qualityScoreOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_toks"),
        (size(array_distinct(col("t"))).cast("double") / size(col("t")))
          .as("raw_uniq"))
      // score from the UNROUNDED ratio — rounding twice creates exact
      // halfway cases where engines' round() modes disagree
      .select(col("doc_id"), col("n_toks"),
        round(col("raw_uniq"), 6).as("uniq_ratio"),
        round(lit(0.5) * col("raw_uniq") +
          lit(0.5) * least(col("n_toks") / 100.0, lit(1.0)), 6).as("score"))

  /** B22 quality scoring: token count, uniqueness ratio, and a composite
    * score per document. Presentation query — the orderBy+limit cap is a
    * display bound only; pipeline consumers use [[qualityScoreOf]]. */
  def qQualityScore(spark: SparkSession, sfDir: String): DataFrame =
    qualityScoreOf(docs(spark, sfDir))
      .orderBy("doc_id").limit(100000)

  /** B22 token counting: whitespace tokens + a chars/4 BPE-style
    * estimate. */
  def qTokenCount(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        col("n_chars"),
        ceil(col("n_chars") / 4.0).cast("long").as("est_bpe"))
      .orderBy("doc_id").limit(100000)

  /** B22 fingerprinting: content hash per document (md5 — identical
    * across engines, unlike seeded murmur/xxhash). */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy("doc_id").limit(100000)

  // ------------------------------------------------------------- dedup

  /** B23 exact dedup: group by content hash, keep the smallest doc_id —
    * the keeper list IS the deduplicated corpus. */
  def qDedupExact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .select("keeper", "n_dups", "h")
      .orderBy("keeper")

  /** Per-document distinct 5-gram shingle ARRAY — built entirely per-row
    * (higher-order functions, zero shuffles): the basis for the Jaccard
    * and MinHash paths. `n` (the set size every Jaccard denominator
    * needs) rides along as a per-row `size` instead of a groupBy —
    * removing a full-corpus shuffle from both near-dup queries. */
  private[ops] def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    docShinglesFrom(docs(spark, sfDir))

  /** [[docShingles]] over any (doc_id, text) frame — the synthetic-corpus
    * entry point the skew/hot-band specs use. */
  private[graft] def docShinglesFrom(d: DataFrame): DataFrame =
    d
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        array_distinct(
          when(size(col("t")) >= 5,
            transform(sequence(lit(1), size(col("t")) - 4),
              i => concat_ws(" ", slice(col("t"), i, lit(5)))))
            .otherwise(array(concat_ws(" ", col("t"))))).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).as("n"))

  /** Exploded (doc_id, shingle) rows — only for the equi-join paths.
    * (Joining on a 60-bit hash of the shingle instead of the string was
    * MEASURED SLOWER here — the per-row md5 cost exceeds the in-memory
    * shuffle savings; on a network-shuffle cluster revisit with the
    * cheap xxhash64, which the oracle can't express but production
    * doesn't need it to.) */
  private[ops] def shingles(spark: SparkSession, sfDir: String): DataFrame =
    docShingles(spark, sfDir)
      .select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))

  /** Guard on the brute-force VERIFICATION baselines: their quadratic
    * shapes (all-pairs / shared-key self-join) are deliberate — they
    * exist to verify the bucketed production twins — but must fail
    * loudly rather than silently melt a cluster if pointed at a full
    * corpus. The cap counts INPUT rows (one cheap count job); override
    * via spark.graft.bruteForceCap only for a deliberate larger
    * verification run. */
  private[graft] def guardBruteForce(input: DataFrame, what: String,
      scalePath: String): Unit = {
    val cap = input.sparkSession.conf
      .get("spark.graft.bruteForceCap", "100000").toLong
    val n = input.count()
    if (n > cap) throw new IllegalArgumentException(
      s"$what is a brute-force verification baseline with a quadratic " +
        s"candidate shape; input has $n rows > cap $cap. Use $scalePath " +
        "at scale, or raise spark.graft.bruteForceCap for a deliberate " +
        "verification run.")
  }

  /** B23 n-gram Jaccard near-dup — the PRODUCTION path, via positional
    * PREFIX FILTERING (the AllPairs/PPJoin family: Bayardo et al.
    * WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et al.
    * WWW'08): shingles get a canonical total order by ASCENDING global
    * document frequency (ties by shingle), and a doc with n distinct
    * shingles indexes only its first n − ⌈t·n⌉ + 1 of them. For
    * J(a,b) ≥ t the overlap is ≥ ⌈t·na⌉ and ≥ ⌈t·nb⌉, and the
    * disjoint-prefix lemma then forces the two prefixes to share a
    * shingle — so joining PREFIX rows only is PROVABLY recall = 1 at
    * the threshold (t = 0.2 = 1/5 exactly; the prefix length uses
    * integer `(n+4) div 5`, no float rounding can shorten it).
    *
    * Scale story: the hottest shingles (highest df — boilerplate) sort
    * LAST in every doc, i.e. into the un-indexed suffix, so the
    * O(df²) hot-key blowup of the naive shared-shingle join vanishes
    * WITHOUT a recall-losing cap; df=1 shingles can't form a pair and
    * are dropped from the join input too. Verification runs the exact
    * int/int Jaccard over the per-doc shingle arrays for candidates
    * only. The old shared-key form survives as the spec-only baseline
    * [[ngramJaccardSharedKey]]; PrefixFilterSpec pins exact output
    * equality plus the candidate-volume cut on a boilerplate corpus. */
  def qNgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccardPrefix(docShingles(spark, sfDir))

  /** Candidate pairs of [[qNgramJaccard]]'s prefix-filter chain over any
    * (doc_id, shs, n) frame — exposed so PrefixFilterSpec can count
    * candidates independently of verification. */
  private[graft] def ngramPrefixCandidates(ds: DataFrame): DataFrame = {
    val sh = ds.select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // rank within doc by (df asc, sh): one hash join on sh (reusing the
    // groupBy's partitioning) + one window shuffle on doc_id — linear
    val ranked = sh.join(dfreq, "sh")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
    val prefix = ranked
      .filter(col("r") <= col("n") - expr("(n + 4) div 5") + lit(1))
      .filter(col("df") > 1) // df=1 shingles can never match — skip the shuffle
      .select(col("doc_id"), col("sh"))
    prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** [[qNgramJaccard]] over any (doc_id, shs, n) frame (the synthetic-
    * corpus entry point for the property specs). */
  private[graft] def ngramJaccardPrefix(ds: DataFrame): DataFrame = {
    val cand = ngramPrefixCandidates(ds)
    cand
      .join(ds.select(col("doc_id").as("da"), col("shs").as("shs_a"),
        col("n").as("na")), "da")
      .join(ds.select(col("doc_id").as("db"), col("shs").as("shs_b"),
        col("n").as("nb")), "db")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      // threshold as EXACT integer arithmetic (J >= 1/5 <=> 5*inter >=
      // union): filtering on the ROUNDED jacc would admit pairs with
      // true J in [0.1999995, 0.2) that the prefix lemma does not
      // guarantee a shared prefix shingle for — a recall hole opening
      // only at ~80k-shingle overlaps, i.e. exactly the corpus sizes
      // the prefix path exists to serve. jacc stays a rounded OUTPUT.
      .filter(col("inter") * 5 >= col("na") + col("nb") - col("inter"))
      .select(col("da"), col("db"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jacc"))
      .orderBy("da", "db")
  }

  /** The former q_ngram_jaccard shape — candidates = pairs sharing ANY
    * shingle (equi-join on shingle): O(Σ df²) on hot shingles, so it is
    * now a size-guarded SPEC-ONLY verification baseline for
    * [[qNgramJaccard]]'s prefix filter (which provably returns the
    * identical rows with a fraction of the candidate volume). */
  private[graft] def ngramJaccardSharedKey(d: DataFrame): DataFrame = {
    guardBruteForce(d.select(col("doc_id")),
      "ngramJaccardSharedKey", "q_ngram_jaccard (prefix filter)")
    val sh = docShinglesFrom(d)
      .select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .filter(col("inter") * 5 >= col("na") + col("nb") - col("inter"))
      .select(col("da"), col("db"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jacc"))
      .orderBy("da", "db")
  }

  /** 60-bit hash computable IDENTICALLY in Spark and DuckDB (top 15 hex
    * chars of md5 → BIGINT) — lets every hash-based dedup query carry a
    * full exact-match oracle. A production deployment swaps this one
    * function for `xxhash64` (≈10× cheaper, same 64-bit shape); the
    * banding/candidate/verify structure is hash-agnostic. */
  private[graft] def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Universal-hash family for the 16 minhashes: ONE base hash per
    * shingle ([[md5Long]] masked to 31 bits), then 16 affine
    * derivations (aᵢ·h + bᵢ) mod (2³¹−1) — the standard trick that costs
    * one expensive hash instead of 16 per element, with seeded (aᵢ, bᵢ)
    * shared between the query and the generated oracle. All
    * intermediates < 2⁶² so both engines' BIGINT arithmetic is exact. */
  private[ops] val minhashAffine: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(16)((rnd.nextInt(2147483646).toLong + 1L, rnd.nextInt(2147483647).toLong))
  }
  private val MersennePrime = 2147483647L // 2^31 - 1

  /** B23 MinHash+LSH banded near-dup — the 100 TB candidate-generation
    * path: 16 minhashes per doc → 4 bands of 4 → equi-join on band key →
    * verify candidates with exact Jaccard. Signatures use [[md5Long]] +
    * [[minhashAffine]] so the DuckDB oracle reproduces them exactly
    * (xxhash64 as the base hash is the production swap). */
  def qMinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshFrom(docs(spark, sfDir))

  /** (doc_id, band, bkey) rows for the LSH band join — the shared front
    * half of [[minhashLshFrom]] and [[minhashBandOverCap]].
    *
    * Signatures are computed PER ROW over the shingle array with ONE
    * aggregate fold: the input transform materializes the base hashes
    * once (one md5 per shingle), the fold keeps a 16-slot running-min
    * vector via zip_with — zero shuffles AND no 16× hash duplication;
    * at 100 TB the old formulation was an explode to |shingles| rows
    * plus a wide shuffle back to one row per document. One pass over the
    * signature then emits all 4 band keys per doc and explodes — NOT a
    * 4-way union, which would recompute the whole shingle aggregation
    * per band (4× the shuffles). */
  private def minhashBands(d: DataFrame): DataFrame = {
    val baseHashes = transform(col("shs"),
      x => md5Long(x).bitwiseAND(lit(0x7fffffffL)))
    val affines: Column => Column = h =>
      array(minhashAffine.map { case (a, b) =>
        (lit(a) * h + lit(b)) % lit(MersennePrime)
      }: _*)
    val sigArr = aggregate(baseHashes,
      array_repeat(lit(MersennePrime), 16),
      (acc, h) => zip_with(acc, affines(h), (p, q) => least(p, q)))
    val minhashes: Seq[Column] =
      (0 until 16).map(i => element_at(col("sig"), i + 1).as(s"m$i"))
    val sig = docShinglesFrom(d)
      .select(col("doc_id"), sigArr.as("sig"))
      .select(col("doc_id") +: minhashes: _*)
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5Long(concat_ws(",",
          col(s"m${4 * b}"), col(s"m${4 * b + 1}"),
          col(s"m${4 * b + 2}"), col(s"m${4 * b + 3}"))).as("bkey"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** Observability twin of [[minhashLshFrom]]'s skew cap: the band
    * buckets whose membership EXCEEDS `cap` — exactly the buckets the
    * production chain silently drops from candidate generation. Empty on
    * every shipped SF (largest measured bucket: 4 docs vs the 256
    * default); HotBandSpec asserts that emptiness so a future corpus/SF
    * bump that actually trips the cap fails the suite with a clear
    * message instead of silently changing keep/drop decisions, and a
    * monitor can run this query alongside any dedup batch. */
  private[graft] def minhashBandOverCap(d: DataFrame, cap: Int = 256): DataFrame =
    minhashBands(d)
      .groupBy("band", "bkey")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > cap)

  /** [[qMinhashLsh]]'s chain over any (doc_id, text) frame — exposed so
    * the hot-band skew spec can drive it with a synthetic corpus.
    * `bandCap` ≤ 0 reads the session default (spark.graft.bandCap, 256);
    * specs pass it explicitly so no shared-session conf is mutated
    * (suite-parallelism-safe — see HotBandSpec). */
  private[graft] def minhashLshFrom(d: DataFrame, bandCap: Int = -1): DataFrame = {
    val bands = minhashBands(d)
    // SKEW CAP: a band key shared by B docs emits O(B²) candidate pairs
    // — on a pathological corpus (mass-duplicated boilerplate hashing a
    // band to one key) a single hot bucket can dominate the whole join.
    // Cap bucket membership BEFORE the self-join: the per-key count is a
    // window over the SAME (band, bkey) hash partitioning the join needs
    // anyway (no extra exchange — the window's shuffle is reused by both
    // join sides), and over-cap buckets are dropped entirely. Recall
    // note: docs in a capped band lose only that band's candidates;
    // with 4 independent bands a true near-dup pair still surfaces
    // through any uncapped band, and a bucket hot enough to hit the cap
    // is overwhelmingly exact-duplicate mass that q_dedup_exact already
    // collapses upstream. At the test SFs the largest bucket holds 4
    // docs (measured sf0.1), so the default cap of 256 changes nothing
    // there — HotBandSpec drives a synthetic hot corpus through a low
    // cap to pin the bounded-candidates behavior. (The SimHash banded
    // search is deliberately NOT capped: its 4×15-bit pigeonhole
    // banding carries a recall=1 proof — RecallSubsetSpec — that a cap
    // would break.)
    val cap = if (bandCap > 0) bandCap
      else d.sparkSession.conf.get("spark.graft.bandCap", "256").toInt
    val cold = bands
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("band", "bkey")))
      .filter(col("bn") <= cap)
      .drop("bn")
    val cand = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // verification Jaccard over candidates only: join the (few)
    // candidate pairs to the per-doc shingle ARRAYS and intersect
    // per-row — no re-explode of the whole corpus for the handful of
    // pairs the bands surfaced
    val ds = docShinglesFrom(d)
    cand
      .join(ds.select(col("doc_id").as("da"), col("shs").as("shs_a"),
        col("n").as("na")), "da")
      .join(ds.select(col("doc_id").as("db"), col("shs").as("shs_b"),
        col("n").as("nb")), "db")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      .select(col("da"), col("db"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jacc"))
      .filter(col("jacc") >= 0.2)
      .orderBy("da", "db")
  }

  /** B23 estimator calibration: banded candidate pairs with BOTH the
    * minhash Jaccard ESTIMATE (agreeing signature components, an exact
    * 0..16 integer) and the true shingle Jaccard — the measurement a
    * production dedup pipeline runs on a sample before trusting the
    * estimate corpus-wide (signature width / band shape tuning). Same
    * plan as [[qMinhashLsh]] up to candidates; the estimate adds one
    * per-pair fold over the two 16-slot signatures, nothing shuffles
    * beyond the candidate join. MinhashEstSpec pins the theoretical
    * E[est16/16] = J unbiasedness within sampling error. */
  def qMinhashEst(spark: SparkSession, sfDir: String): DataFrame = {
    val baseHashes = transform(col("shs"),
      x => md5Long(x).bitwiseAND(lit(0x7fffffffL)))
    val affines: Column => Column = h =>
      array(minhashAffine.map { case (a, b) =>
        (lit(a) * h + lit(b)) % lit(MersennePrime)
      }: _*)
    val sigArr = aggregate(baseHashes,
      array_repeat(lit(MersennePrime), 16),
      (acc, h) => zip_with(acc, affines(h), (p, q) => least(p, q)))
    val sig = docShingles(spark, sfDir)
      .select(col("doc_id"), col("n"), col("shs"), sigArr.as("sig"))
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5Long(concat_ws(",",
          element_at(col("sig"), 4 * b + 1), element_at(col("sig"), 4 * b + 2),
          element_at(col("sig"), 4 * b + 3), element_at(col("sig"), 4 * b + 4)))
          .as("bkey"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val est16 = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    cand
      .join(sig.select(col("doc_id").as("da"), col("shs").as("shs_a"),
        col("n").as("na"), col("sig").as("sig_a")), "da")
      .join(sig.select(col("doc_id").as("db"), col("shs").as("shs_b"),
        col("n").as("nb"), col("sig").as("sig_b")), "db")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      .select(col("da"), col("db"), est16.as("est16"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jacc"))
      .orderBy("da", "db")
  }

  /** B23 SimHash: 60-bit signature from per-token hash bit votes
    * ([[md5Long]] hash → oracle-reproducible; xxhash64 is the production
    * swap). Computed entirely PER ROW: one higher-order `aggregate`
    * folds the token hashes into a 60-slot vote array (zip_with
    * accumulator), then the sign pattern packs into the signature —
    * scan→project with ZERO shuffles, vs the former explode + grouped
    * bit-sums which shuffled every token of the corpus. */
  def simhashSigs(spark: SparkSession, sfDir: String): DataFrame = {
    val hashes = transform(array_distinct(toks), t => md5Long(t))
    // shiftright/shiftleft with a COLUMN shift count exist only at the
    // SQL-function layer (the Scala wrappers take Int) → call_function
    val bitsOf: Column => Column = h =>
      transform(sequence(lit(0), lit(59)), i =>
        when(call_function("shiftright", h, i).bitwiseAND(1) === 1, lit(1L))
          .otherwise(lit(-1L)))
    val votes = aggregate(hashes, array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    val simhash = aggregate(
      zip_with(votes, sequence(lit(0), lit(59)), (v, i) =>
        when(v >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
    docs(spark, sfDir)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  def qSimhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashSigs(spark, sfDir).orderBy("doc_id")

  /** B23 SimHash near-dup SEARCH — completes the SimHash pipeline from
    * signature to neighbors: 60-bit signatures band into 4×15-bit keys
    * (pigeonhole: hamming ≤ 3 ⇒ at least one band identical, so the
    * banded equi-join is a LOSSLESS candidate generator at this radius —
    * unlike the probabilistic MinHash/hyperplane banding), candidates
    * verified by exact popcount hamming, and each doc keeps its best
    * neighbor (min hamming, tie → min doc_id). Output is ≤1 row per doc
    * at any scale; the only shuffles are the band join and the per-doc
    * window. */
  def qSimhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = simhashSigs(spark, sfDir)
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), 15 * b).bitwiseAND(lit(32767L)).as("bkey"))
    }: _*)
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    // hamming computed and filtered JOIN-SIDE (before any shuffle); no
    // distinct (duplicate multi-band hits are absorbed by the argmin);
    // and the argmin itself is min(struct(hamming, db)) — a HASH
    // AGGREGATE, not a window, so partial aggregation collapses each
    // doc's candidates map-side and the shuffle carries ≤1 row per doc
    // per task regardless of the candidate blowup. (Window row_number
    // would shuffle every candidate row: measured 5.5 s → 4.4 s at
    // sf0.1, output identical; the residual cost is the band join
    // itself emitting O(Σ bucket²) rows on this everything-similar
    // synthetic corpus — real corpora have diverse signatures and
    // correspondingly small buckets, and the shuffle-minimal shape
    // here is the one that survives that scale.)
    // (Negative results, measured at sf0.1: emitting each unordered pair
    // once with a<b and mirroring via a projection union re-runs the
    // join in both branches (5.5 s); localCheckpoint-ing the surviving
    // half to dedupe the join pays more in eager materialization than
    // the halved probe saves (6.6 s). The plain a≠b join + partial-agg
    // argmin below stays the fastest shape.)
    val best = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .groupBy(col("da"))
      .agg(min(struct(col("hamming"), col("db"))).as("best"))
    best.select(col("da").as("doc_id"), col("best.db").as("nbr"),
        col("best.hamming").as("hamming"))
      .orderBy("doc_id")
  }

  /** Candidate edges for the PRODUCTION near-dup chain: MinHash-banded
    * candidates verified with exact Jaccard ([[qMinhashLsh]]) — the
    * bucketed 100 TB generator (4×4 banding → equi-join on band key →
    * exact verify on the few survivors). The exact shared-shingle join
    * ([[qNgramJaccard]]) stays available as the brute-force verification
    * baseline, but is no longer in any production artifact's lineage:
    * its O(Σ bucket²) blowup on a hot shingle was the last scale-killer
    * wired into q_dedup_keep. Recall caveat: banding is probabilistic,
    * so a true pair can be missed — the oracle mirrors the SAME banded
    * chain, keeping the correctness gate exact. */
  private[graft] def dedupCandidatePairs(spark: SparkSession, sfDir: String): DataFrame =
    qMinhashLsh(spark, sfDir).select(col("da"), col("db"))

  /** Connected components by iterative min-label propagation over a
    * (da, db) edge DataFrame. The fixpoint loop runs on the DRIVER but
    * every step is a distributed join+aggregate. Converges in
    * O(component diameter) rounds and shuffles the FULL edge set each
    * round — kept as the reference implementation the large-star/
    * small-star variant is spec-compared against; [[ccLargeSmallStar]]
    * is the production shape. Returns ((v, comp) labels, rounds). */
  private[graft] def ccPropagation(pairs: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    // materialize the edge set ONCE: every propagation round joins
    // against it, and without this each round recomputes the whole
    // candidate generation (measured ~4 s per round at sf0.1 —
    // dominated the 20 s q_dedup_keep wall before this)
    val bidirCp = Ckpt(pairs
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db"))))
    val bidir = bidirCp.df
    var comp = bidir.select(col("da").as("v")).distinct()
      .select(col("v"), col("v").as("comp"))
    var prevRound: Option[Ckpt] = None
    var changed = 1L
    var rounds = 0
    // The cap is a runaway guard, not a semantic bound — hitting it with
    // changed > 0 means the labels are NOT a fixpoint, and returning them
    // silently would diverge from the connected-components contract (and
    // the transitive-closure oracle). Fail loudly instead.
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = bidir.join(comp, col("db") === col("v"))
        .groupBy(col("da").as("v2")).agg(min(col("comp")).as("nbr_min"))
      // checkpoint BEFORE the changed-count so the round's join runs
      // once (count + next round both read the materialized result),
      // and the iterative lineage stays truncated
      val next = Ckpt(comp.join(nbrMin, col("v") === col("v2"), "left")
        .select(col("v"), least(col("comp"),
          coalesce(col("nbr_min"), col("comp"))).as("comp")))
      changed = next.df.as("n").join(comp.as("c"), col("n.v") === col("c.v"))
        .filter(col("n.comp") =!= col("c.comp")).count()
      // round k−1 has no consumers left (the changed-count above was the
      // last) — drop its blocks so resident storage stays O(1) rounds
      prevRound.foreach(_.release())
      prevRound = Some(next)
      comp = next.df
      rounds += 1
    }
    // the final labels' lineage is truncated, so the edge set is no
    // longer reachable from the result — release it too
    bidirCp.release()
    if (changed > 0)
      throw new IllegalStateException(
        s"ccPropagation: label propagation did not converge in $maxRounds " +
          s"rounds ($changed labels still changing) — component diameter " +
          "exceeds the cap; raise maxRounds or use ccLargeSmallStar")
    (comp, rounds)
  }

  /** One large-star round: every node attaches its strictly-larger
    * neighbors to the minimum of its closed neighborhood. Skew-safe by
    * construction — a hub's huge neighbor list becomes ONE min per
    * group (partial-aggregating groupBy), never a neighbor×neighbor
    * product. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val bidir = edges
      .unionByName(edges.select(col("w").as("u"), col("u").as("w")))
      .distinct()
    val mins = bidir.groupBy("u").agg(min(col("w")).as("mw"))
      .select(col("u"), least(col("u"), col("mw")).as("m"))
    bidir.join(mins, "u")
      .filter(col("w") > col("u"))
      .select(col("w").as("u"), col("m").as("w"))
      .distinct()
  }

  /** One small-star round: each node (over its smaller-or-equal
    * neighborhood, edges oriented high→low) points itself and its
    * non-minimal neighbors at the neighborhood minimum. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges.filter(col("u") =!= col("w"))
      .select(greatest(col("u"), col("w")).as("u"),
        least(col("u"), col("w")).as("w"))
      .distinct()
    val mins = dir.groupBy("u").agg(min(col("w")).as("m"))
    val moved = dir.join(mins, "u")
      .filter(col("w") =!= col("m"))
      .select(col("w").as("u"), col("m").as("w"))
    val self = mins.select(col("u"), col("m").as("w"))
    moved.unionByName(self).filter(col("u") =!= col("w")).distinct()
  }

  /** Connected components by ALTERNATING large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the skew-safe production shape: O(log² n) rounds independent of
    * component diameter (vs propagation's O(diameter)), and a skewed hub
    * component costs one partial-aggregated min per round instead of
    * re-shuffling its full edge list to one task. Fixpoint = the edge
    * set is a union of disjoint min-rooted stars; labels read off the
    * star edges. Deterministic: labels are component-min ids.
    * Returns ((v, comp) labels, rounds). */
  private[graft] def ccLargeSmallStar(pairs: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    // materialize the INPUT once: verts and edges are two separate
    // eager checkpoints, and each would otherwise evaluate the lazy
    // `pairs` plan in its own job — for the production callers that is
    // the whole MinHash-band + Jaccard-verify chain run TWICE (guide §5
    // "reused and expensive to recompute"; measured ~1.9 s per extra
    // evaluation at sf0.1 in q_dedup_keep / q_train_prep). Released as
    // soon as both derivations have materialized.
    val base = Ckpt(pairs.select(col("da"), col("db")))
    // release the base in ALL paths: if either derivation's checkpoint
    // job throws (e.g. OOM mid-materialization), the base blocks must
    // not stay pinned until the next Ckpt.releaseAll (advice r20)
    val (verts, edges0) =
      try {
        val v = Ckpt(base.df.select(col("da").as("v"))
          .unionByName(base.df.select(col("db").as("v")))
          .distinct())
        val e = Ckpt(base.df
          .select(col("da").as("u"), col("db").as("w"))
          .filter(col("u") =!= col("w"))
          .distinct())
        (v, e)
      } finally base.release() // verts + edges were its only consumers
    var edges = edges0
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // checkpoint each round's edge set BEFORE the convergence check so
      // the two except() jobs and the next round all read one
      // materialization, and the iterative lineage stays truncated
      val next = Ckpt(smallStar(largeStar(edges.df)))
      converged = next.df.except(edges.df).count() == 0 &&
        edges.df.except(next.df).count() == 0
      // the superseded round's blocks have no remaining consumer (both
      // except() jobs above just ran) — release, keeping O(1) resident
      edges.release()
      edges = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ccLargeSmallStar: star rounds did not reach a fixpoint in " +
          s"$maxRounds rounds — raise maxRounds")
    // at the fixpoint each non-root has exactly one outgoing (u, root)
    // edge; the min-agg is cheap insurance that stays deterministic
    // even on a non-star edge multiset. The FINAL edge set and the vertex
    // set stay resident — the returned (lazy) label plan reads them when
    // the caller materializes; sessions clear them between ops
    // (Ckpt.releaseAll).
    val roots = edges.df.groupBy(col("u").as("v")).agg(min(col("w")).as("c"))
    val comp = verts.df.join(roots, Seq("v"), "left")
      .select(col("v"), coalesce(col("c"), col("v")).as("comp"))
    (comp, rounds)
  }

  /** B23 tail: near-dup CLUSTERS — connected components over the
    * MinHash-banded, Jaccard-verified candidate graph
    * ([[dedupCandidatePairs]]), computed with alternating large-star/
    * small-star rounds ([[ccLargeSmallStar]]): both the candidate
    * generation AND the component algorithm are the bucketed/skew-safe
    * 100 TB shapes. Deterministic: labels are min doc_ids. */
  def qDedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val (comp, _) = ccLargeSmallStar(dedupCandidatePairs(spark, sfDir))
    comp.select(col("v").as("doc_id"), col("comp").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** B23: the MATERIALIZED dedup decision — the production artifact the
    * cluster step exists for. Every document gets (kept, cluster_id):
    * docs outside any near-dup cluster are kept; within a cluster the
    * keeper is the min doc_id — which IS the cluster label, so the
    * keep predicate is label equality, no extra aggregate. Downstream,
    * `filter(kept)` is the deduplicated corpus. */
  def qDedupKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val clusters = qDedupClusters(spark, sfDir)
    docs(spark, sfDir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .as("kept"),
        col("cluster_id"))
      .orderBy("doc_id")
  }

  /** B23 cluster cohesion QA — per-cluster size, internal edge count,
    * edge density, and the min/max verified Jaccard. The curation
    * report a pipeline reads before trusting a dedup pass: dense
    * near-1.0 clusters are true duplicate groups (drop all but one);
    * sparse chains with low min Jaccard are lexical drift that
    * transitive closure glued together (raise the threshold, or keep
    * more than one representative). Derived entirely from relations the
    * chain already produces — verified edges + labels — with two small
    * aggs and a join keyed by cluster label; only order-independent
    * aggregates (count/min/max) touch doubles, so the exact oracle
    * holds with no float-sum caveat. */
  def qClusterStats(spark: SparkSession, sfDir: String): DataFrame = {
    // materialize the verified edge set ONCE: both the label propagation
    // (which iterates over it) and the per-cluster edge stats consume
    // it — without this the whole banded minhash chain runs twice. It
    // cannot be released here (the returned lazy plan reads it when the
    // caller materializes); long-lived sessions reclaim it between ops
    // via Ckpt.releaseAll.
    val edges = Ckpt(qMinhashLsh(spark, sfDir)).df
    val clusters = {
      val (comp, _) = ccLargeSmallStar(edges.select(col("da"), col("db")))
      comp.select(col("v").as("doc_id"), col("comp").as("cluster_id"))
    }
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("n_docs"))
    val estats = edges
      .join(clusters.select(col("doc_id").as("da"), col("cluster_id").as("cid")),
        "da")
      .groupBy("cid")
      .agg(count(lit(1)).as("n_edges"),
        min(col("jacc")).as("min_jacc"), max(col("jacc")).as("max_jacc"))
    sizes.join(estats, col("cluster_id") === col("cid"))
      .select(col("cluster_id"), col("n_docs"), col("n_edges"),
        round(col("n_edges") /
          (col("n_docs") * (col("n_docs") - 1) / lit(2)), 6).as("density"),
        col("min_jacc"), col("max_jacc"))
      .orderBy("cluster_id")
  }

  /** Pipeline-composition capstone: the corpus → TRAINING SHARDS path a
    * real run executes, chained from operators that are each oracled on
    * their own — near-dup keep ([[qDedupKeep]]), per-source bottom-
    * quartile quality cut (q_quality_cut semantics, computed over the
    * FULL source population before the dedup intersection so a source's
    * quartile is stable regardless of its dup rate), then the
    * hash-stable 90/5/5 split and 8-way shard assignment (q_split /
    * q_shuffle_shards hashes). Report: docs and tokens per
    * (split, shard) — the table a data-loader manifest is built from.
    * Every stage is scan-side hashes, one per-source window, and tiny
    * joins against the keep set; nothing new shuffles beyond the
    * operators it composes. */
  def qTrainPrep(spark: SparkSession, sfDir: String): DataFrame =
    trainPrepDocs(spark, sfDir)
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_toks"))
      .orderBy("split", "shard")

  /** Per-document stage of [[qTrainPrep]]: the surviving docs with their
    * (split, shard) assignment and token count — the frame the shard
    * WRITER consumes. ShardRoundTripSpec writes it as partitioned
    * parquet (one directory per split/shard — the physical layout a
    * data loader mounts) and proves a fresh read reproduces the
    * manifest exactly. */
  private[graft] def trainPrepDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val kept = qDedupKeep(spark, sfDir).filter(col("kept")).select("doc_id")
    val scored = qualityScoreOf(docs(spark, sfDir))
      .select(col("doc_id"), col("score"))
    val base = docs(spark, sfDir)
      .select(col("doc_id"), col("source"), size(toks).cast("long").as("nt"))
    val tile = ntile(4).over(
      Window.partitionBy("source").orderBy(col("score"), col("doc_id")))
    val surv = base.join(scored, Seq("doc_id"))
      .withColumn("q", tile).filter(col("q") > 1)
      .join(kept, Seq("doc_id"))
    val h = pmod(
      md5Long(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    val split = when(h < 90, lit("train"))
      .when(h < 95, lit("val")).otherwise(lit("test"))
    val shard = pmod(
      md5Long(concat(lit("shuf:"), col("doc_id").cast("string"))), lit(8L))
    surv.select(col("doc_id"), split.as("split"), shard.as("shard"), col("nt"))
  }

  /** B23-adjacent graph-centrality quality prior: 3 fixed rounds of
    * PageRank over the verified near-dup graph (the web-curation signal
    * — a doc duplicated by many well-connected docs is boilerplate-like;
    * an isolated near-dup pair is benign). Ranks stay in integer
    * MICRO-UNITS end to end: each round's contribution is
    * `rank div degree` (exact), the damping update is
    * `150000 + (17·Σ) div 20` (0.85 as a rational, exact) — every
    * cross-row sum is an order-insensitive long, so the oracle is exact
    * with no float caveat. The edge set materializes ONCE (the same
    * [[Ckpt]] discipline as [[qClusterStats]]; released between ops by
    * Ckpt.releaseAll); each round is one shuffle join on the src key +
    * one aggregate on dst — O(rounds) shuffles of the edge relation,
    * the textbook distributed-PageRank shape. Undirected edges mean
    * every node has in-degree ≥ 1, so no dangling-mass correction is
    * needed. */
  def qPagerank(spark: SparkSession, sfDir: String): DataFrame =
    pagerankOf(Ckpt(
      qMinhashLsh(spark, sfDir).select(col("da"), col("db"))).df)

  /** Iteration core of [[qPagerank]], parameterized by any undirected
    * (da, db) edge DataFrame (each pair listed once) so specs can feed
    * a hand-computed graph. */
  private[graft] def pagerankOf(pairs: DataFrame, rounds: Int = 3): DataFrame = {
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("v"), col("deg"),
      lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = ranks.select(col("v"), expr("r div deg").as("c"))
      val sums = edges.join(contrib, col("src") === col("v"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = sums.join(deg, col("dst") === col("src"))
        .select(col("dst").as("v"), col("deg"),
          expr("150000 + (17 * s) div 20").as("r"))
    }
    ranks.select(col("v").as("doc_id"), col("deg"),
        col("r").as("rank_micro"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------- similarity search

  // Dot product, written in the PORTABLE declarative form (pure built-in
  // higher-order functions — runs on any Spark). In every graft session
  // the injected optimizer rule (graft.plans.VecDotRewrite, wired through
  // GraftExtensions) rewrites this exact shape into the native codegen
  // kernel FloatVectorDot — measured ~15× faster on the all-pairs
  // workload (tools.VecDotBench), bit-identical results (same widening,
  // same left-to-right double accumulation). PlanRegressionSpec pins that
  // the rewrite actually fires in these queries; the per-query DuckDB
  // oracles gate its exactness end-to-end.
  private def dot(a: Column, b: Column): Column = VectorForms.dot(a, b)
  private def sumSq(c: Column): Column = VectorForms.sumSq(c)

  /** B24 brute-force cosine top-k: query vectors (vec_id < 5) broadcast
    * against the corpus; dot/norms via codegen'd higher-order functions;
    * ranking on the ROUNDED cosine so both engines rank identical
    * values. Norms are hoisted OUT of the pair loop — computed once per
    * vector in the pre-join projection (O(N·d) instead of O(N·Q·d);
    * bit-identical cosines, the division just reuses the hoisted
    * sqrt). Baseline for the bucketed variants below. */
  def qSimTopk(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
    val scored = e.select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy("qid", "rn")
  }

  /** B24: HARD-NEGATIVE mining — for each anchor vector, the top-3 most
    * similar vectors with a DIFFERENT label: the contrastive-training
    * data op (negatives that are hard precisely because they score high
    * while being wrong). Same broadcast + hoisted-norm + rounded-rank
    * plan as [[qSimTopk]] with one label predicate — at 100 TB the
    * label filter rides the scored stream, nothing new shuffles. */
  def qHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qv"), sqrt(sumSq(col("embedding"))).as("qnrm"))
    val scored = e.select(col("vec_id"), col("label"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("qid", "rn")
  }

  /** B23 embedding-cosine near-dup — the PRODUCTION entry, routed
    * through banded random-hyperplane candidates (4 tables × 3 bits —
    * a HIGHER-recall operating point on the same 12 seeded planes than
    * [[qDedupCosineLsh]]'s 3 × 4; the (tables, bits) pair is the
    * recall/cost dial: measured on the isotropic synthetic embeddings
    * at the θ=0.4 parity threshold, 4×3 ≈ 0.70 recall @ 0.41 of
    * all-pairs candidate volume vs 3×4's ≈ 0.43 @ 0.18 — recall → 1 as
    * pair similarity ≫ θ, i.e. on real near-duplicate corpora). The
    * generated oracle mirrors the banding exactly, so the result is
    * exact-match checked at its own recall. The all-pairs truth
    * survives as the spec-only [[dedupCosineAllPairs]]; RecallSubsetSpec
    * pins subset-with-equal-scores + a recall floor against it.
    *
    * Why no lossless sublinear route exists here: θ=0.4 is a 66°
    * angular radius, and on isotropic high-dim data any exact metric
    * pruning (k-center triangle-inequality cells, prefix filtering on
    * dims) admits everything — measured on this corpus, cell pruning
    * with kmeans-quality pivots prunes 0% at this radius. Banded
    * candidates + exact verify IS the production design. */
  def qDedupCosine(spark: SparkSession, sfDir: String): DataFrame =
    bandedCosinePairs(spark, sfDir, tables = 4, bits = 3)

  /** All pairs above the cosine threshold by brute force — the former
    * q_dedup_cosine body, now the size-guarded SPEC-ONLY ground truth
    * for the banded routes' recall measurements. */
  private[graft] def dedupCosineAllPairs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    guardBruteForce(e.select(col("vec_id")),
      "dedupCosineAllPairs", "q_dedup_cosine (banded) / q_ann_buckets")
    // norms hoisted to the per-vector projection (see qSimTopk)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
      sqrt(sumSq(col("embedding"))).as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      sqrt(sumSq(col("embedding"))).as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("va", "vb")
  }

  /** Seeded random-hyperplane pool of arbitrary size: the first `count`
    * planes of the seed-42 stream, so every prefix is stable — callers
    * asking for more planes never perturb the planes earlier callers
    * already inlined into generated oracle SQL. The pool is generated,
    * not stored, so occupancy-bounded banding ([[graft.ops.GraphAnn]])
    * can size `tables × bits` to the corpus (bits ≈ log₂(n/occupancy))
    * without a fixed-pool ceiling. */
  private[graft] def lshPlanesExt(count: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(count)(Seq.fill(64)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** The 12 seeded random hyperplanes of the LSH bucketing — shared by
    * the query and its (generated) oracle SQL so both engines compute
    * the identical bucket ids. */
  private[ops] def lshPlanes: Seq[Seq[Float]] = lshPlanesExt(12)

  /** B24 LSH-bucketed ANN (the 100 TB scale path): 12-bit random
    * hyperplane signature per vector, then neighbor search is an
    * equi-join within buckets instead of all-pairs. Output: intra-bucket
    * top match per vector. The seeded planes are inlined into the
    * generated oracle SQL → full exact-match check. */

  /** The 12-bit signature projection (vec_id, embedding, bucket, nrm)
    * of q_ann_buckets, shared with q_ann_recall's approx side. The
    * sign test runs on the ROUNDED plane dot (same float-parity rule
    * as every cross-engine comparison): a near-zero unrounded dot
    * could flip the bit if the two engines accumulate in different
    * order, breaking the exact-match oracle nondeterministically. */
  private def lshBucketed(e: DataFrame): DataFrame = {
    val sigBits = lshPlanes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(round(dot(col("embedding"), planeCol), 6) >= 0,
        shiftleft(lit(1), i)).otherwise(0)
    }
    e.select(col("vec_id"), col("embedding"),
      sigBits.reduce(_ + _).as("bucket"),
      sqrt(sumSq(col("embedding"))).as("nrm")) // norm hoisted out of the pair loop
  }

  /** Intra-bucket nearest per a-side vector; `aSide` lets a caller
    * restrict WHICH vectors get a result (per-vector top-1 is
    * independent, so restricting the probe side changes cost, never
    * values). */
  private def lshTop1(bucketed: DataFrame, aSide: DataFrame): DataFrame = {
    val pairs = aSide.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("nbr"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nbr"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "bucket", "nbr", "cos_sim")
  }

  def qAnnBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val bucketed = lshBucketed(Tables.embeddings(spark, sfDir))
    lshTop1(bucketed, bucketed).orderBy("vec_id")
  }

  /** THE recall-metric probe sample (1 in 20), in ONE place: every
    * oracle-gated recall entry (q_ann_recall, q_ann_recall_tiers,
    * q_ann_recall_pq) measures over this sample so the per-tier
    * numbers are comparable — production dials the rate HERE and every
    * gate moves together (review r14: the predicate was spelled
    * per-entry, so dialing one would silently de-align the tiers). */
  private[graft] def recallProbePred: Column = col("vec_id") % 20 === 0
  private[graft] val RecallProbeWhere = "vec_id % 20 = 0"

  /** B24 QUALITY METRIC as a first-class query: ANN fidelity measured
    * IN-ENGINE against brute-force truth over the deterministic
    * [[recallProbePred]] sample (production dials the sample, never
    * runs truth over the full corpus; the truth side is
    * probes × corpus, bounded by the sample). Two numbers per the two
    * dials a deployment alerts on:
    *  - `bucket_recall`: recall@1 of the single-table 12-bit LSH path
    *    (q_ann_buckets) — did the intra-bucket nearest EQUAL the global
    *    nearest (singleton bucket ⇒ miss). On this corpus's
    *    weakly-structured tail it measures ≈0: one narrow table
    *    cannot find cos≈0.3 neighbors — the honest number that
    *    motivates every multi-table/IVF/graph tier above it.
    *  - `banded_recall`: CANDIDATE recall of the multi-table banded
    *    scheme at the dedup dial (4 tables × 3 bits) — was the true
    *    nearest in the probe's candidate set at all. This is the
    *    number that bounds the fidelity of every banded op
    *    (q_dedup_cosine, the graph build's first cut).
    * The whole metric — both chains and the fold — is exact-matched by
    * the DuckDB oracle, so the measurement itself is gated, not just
    * the indexes it measures. */
  def qAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val nodes = e.select(col("vec_id"), col("embedding"),
      sqrt(sumSq(col("embedding"))).as("nrm"))
    val probes = nodes.filter(recallProbePred)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"),
        col("nrm").as("pn"))
    val wP = Window.partitionBy("pid").orderBy(col("cos_sim").desc, col("nbr"))
    val truth = nodes.join(broadcast(probes), col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("nbr"),
        round(dot(col("embedding"), col("pv")) /
          (col("nrm") * col("pn")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
      .select(col("pid"), col("nbr").as("true_nbr"))
    // intra-bucket top-1 computed for the PROBES only (per-vector
    // top-1 is independent, so values match the full q_ann_buckets
    // rows for those ids at 1/20th the pair scoring)
    val bucketed = lshBucketed(e)
    val lsh = lshTop1(bucketed, bucketed.filter(recallProbePred))
      .select(col("vec_id").as("pid"), col("nbr").as("lsh_nbr"))
    // candidate recall needs pair IDENTITY only — band-key equi-join
    // without the exact scoring the dedup pass pays (the =!= join
    // covers both orientations directly)
    val bandVecs = bandedKeys(e, tables = 4, bits = 3)
      .select(col("vec_id"), col("bkey"))
    val bandBi = bandVecs.as("a").join(bandVecs.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("bpid"), col("b.vec_id").as("cand"))
      .distinct()
    truth.join(lsh, Seq("pid"), "left")
      .join(bandBi, col("pid") === col("bpid") &&
        col("true_nbr") === col("cand"), "left")
      .agg(count(lit(1)).as("probes"),
        sum(when(col("lsh_nbr") === col("true_nbr"), 1L).otherwise(0L))
          .as("bucket_hits"),
        sum(when(col("cand").isNotNull, 1L).otherwise(0L))
          .as("banded_hits"))
      .select(col("probes"),
        col("bucket_hits"),
        round(col("bucket_hits").cast("double") / col("probes"), 6)
          .as("bucket_recall"),
        col("banded_hits"),
        round(col("banded_hits").cast("double") / col("probes"), 6)
          .as("banded_recall"))
  }

  /** B24 quality gate for the PQ tiers (completing the per-tier recall
    * story: q_ann_recall gates the LSH/banded paths, q_ann_recall_tiers
    * the graph/IVF serving paths): recall@5 of the PQ-ADC-rerank chain
    * and of IVFADC vs probe-sampled brute-force truth ranked BY RAW DOT
    * — the metric those tiers actually serve (their rerank orders by
    * dot, not cosine), so the gate measures index fidelity rather than
    * a metric mismatch. Same 1-in-20 probe sample as the other recall
    * entries; both chains run with the PRODUCTION search code
    * ([[annPqFrom]] / [[annIvfPqResults]], probe set swapped in), and
    * the whole metric replays in the generated oracle so the recall
    * numbers themselves are hash-gated. */
  def qAnnRecallPq(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val probePred = recallProbePred
    val probes = e.filter(probePred)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val wP = Window.partitionBy("pid").orderBy(col("dotv").desc, col("nbr"))
    val truth = e.join(broadcast(probes), col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("nbr"),
        round(dot(col("embedding"), col("pv")), 6).as("dotv"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= 5)
      .select(col("pid"), col("nbr").as("true_nbr"))
    val pq = annPqFrom(e, pqCodebook(e), probePred)
      .select(col("qid").as("ppid"), col("vec_id").as("pnbr"))
    val ivfpq = annIvfPqResults(spark, sfDir, probePred)
      .select(col("qid").as("vpid"), col("vec_id").as("vnbr"))
    truth
      .join(pq, col("pid") === col("ppid") &&
        col("true_nbr") === col("pnbr"), "left")
      .join(ivfpq, col("pid") === col("vpid") &&
        col("true_nbr") === col("vnbr"), "left")
      .agg(count(lit(1)).as("truth_pairs"),
        sum(when(col("pnbr").isNotNull, 1L).otherwise(0L)).as("pq_hits"),
        sum(when(col("vnbr").isNotNull, 1L).otherwise(0L)).as("ivfpq_hits"))
      .select(col("truth_pairs"), col("pq_hits"),
        round(col("pq_hits").cast("double") / col("truth_pairs"), 6)
          .as("pq_recall"),
        col("ivfpq_hits"),
        round(col("ivfpq_hits").cast("double") / col("truth_pairs"), 6)
          .as("ivfpq_recall"))
  }

  /** B24 SERVING-DIAL JUSTIFICATION (r14 verdict item 1): the ORACLED
    * recall-vs-cost curve for the cell-probed ANN tiers — IVF and
    * IVFADC at nprobe ∈ [[IvfNprobeSweep]] plus the TRAINED-quantizer
    * tier at [[KmIvfNprobeSweep]], each searched by its PRODUCTION
    * code path ([[annIvfResults]] / [[annIvfPqResults]] /
    * [[annIvfKmResults]], probe set and nprobe swapped in), each
    * dial's recall@5 measured against probe-sampled brute truth in
    * the metric that tier serves (cosine for IVF/ivf_km, raw dot for
    * IVFADC), alongside the dial's COST: the scanned-candidate pair
    * count (IVF reads that many full vectors; IVFADC that many 8-byte
    * codes + a ≤50-row exact rerank). One row per (tier, nprobe); the
    * whole curve — Lloyd training, recall numbers AND cost counts —
    * replays CTE-for-CTE in DuckDB, so both dial choices
    * ([[IvfNprobe]], [[KmIvfNprobe]]) are pinned to hash-gated
    * evidence, not spec floors. RecallSubsetSpec restates the serving
    * rule against these values: a tier's default dial must clear
    * recall@5 ≥ 0.8 (→ ivf_km promoted) or the tier is demoted to
    * candidate generation in the crosswalk (→ ivf/ivfpq). */
  def qAnnRecallCurve(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val probePred = recallProbePred
    val probes = e.filter(probePred)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    // truth per serving metric (the q_ann_recall_tiers / _pq split)
    // the truth tables and the cell assignment are consumed ONCE PER
    // SWEEP DIAL below (hitsOf/candOf per (tier, nprobe) row) — left
    // lazy, each dial re-ran the probes×corpus exact scoring pass and
    // the full-corpus assignment (~10× total; guide §5 caching —
    // reused AND expensive). Materialized once, the sweep's per-dial
    // work is only its own searched tier + two joins of tiny frames.
    // BOTH truth metrics ride ONE probes×corpus scoring pass: the two
    // truth tables used to materialize as separate checkpoints, each
    // re-running the broadcast join and the vec_dot scoring over every
    // (probe, vector) pair — the dot product both metrics share was the
    // expensive half of each pass (guide §1.2/§5). The written IEEE
    // sequence per metric is unchanged (same round(dot/…,6) / round(dot,6)
    // expressions, same (desc, nbr) rank order), so the selected rows are
    // bit-identical — gated by the entry's exact-match oracle.
    val wC = Window.partitionBy("pid").orderBy(col("cos_sim").desc, col("nbr"))
    val wD = Window.partitionBy("pid").orderBy(col("dotv").desc, col("nbr"))
    val truthBoth = Ckpt(e.join(broadcast(probes), col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("nbr"),
        round(dot(col("embedding"), col("pv")) /
          (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("pv")))), 6)
          .as("cos_sim"),
        round(dot(col("embedding"), col("pv")), 6).as("dotv"))
      .withColumn("rnC", row_number().over(wC))
      .withColumn("rnD", row_number().over(wD))
      .filter(col("rnC") <= 5 || col("rnD") <= 5)
      .select(col("pid"), col("nbr"), col("rnC"), col("rnD"))).df
    val truthCos = truthBoth.filter(col("rnC") <= 5)
      .select(col("pid"), col("nbr").as("true_nbr"))
    val truthDot = truthBoth.filter(col("rnD") <= 5)
      .select(col("pid"), col("nbr").as("true_nbr"))
    // cost: candidates scanned at nprobe — cell assignment is shared
    // between the tiers (same literal centroids, same rounded argmin),
    // so one count serves both rows of a dial
    val (e2, cellScored) = ivfCellParts(spark, sfDir)
    val assignedCells = Ckpt(e2.select(col("vec_id"),
      array_min(cellScored).getField("cid").as("cid"))).df
    def candOf(np: Int): DataFrame =
      assignedCells.join(
          broadcast(e2.filter(probePred).select(col("vec_id").as("qid"),
              explode(slice(array_sort(cellScored), 1, np)).as("p"))
            .select(col("qid"), col("p.cid").as("cid"))), "cid")
        .filter(col("vec_id") =!= col("qid"))
        .agg(count(lit(1)).as("cand_pairs"))
    def hitsOf(res: DataFrame, truth: DataFrame): DataFrame =
      truth.join(res.select(col("qid"), col("vec_id")),
          col("pid") === col("qid") && col("true_nbr") === col("vec_id"),
          "left")
        .agg(count(lit(1)).as("truth_pairs"),
          sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("hits"))
        .select(col("truth_pairs"), col("hits"),
          round(col("hits").cast("double") / col("truth_pairs"), 6)
            .as("recall"))
    val shape = Seq(col("truth_pairs"), col("hits"), col("recall"),
      col("cand_pairs"))
    val rows = IvfNprobeSweep.flatMap { np =>
      Seq(
        hitsOf(annIvfResults(spark, sfDir, probePred, np), truthCos)
          .crossJoin(candOf(np))
          .select(lit("ivf").as("tier") +: lit(np).as("nprobe") +: shape: _*),
        hitsOf(annIvfPqResults(spark, sfDir, probePred, nprobe = np),
            truthDot)
          .crossJoin(candOf(np))
          .select(lit("ivfpq").as("tier") +: lit(np).as("nprobe") +: shape: _*))
    }
    // the TRAINED-quantizer tier, swept over its own (wider) dial
    // range — its curve is what justifies promoting q_ann_ivf_kmeans
    // to serving while the deterministic tiers stay candidate-gen
    val (ek, kmScored) = ivfKmParts(spark, sfDir)
    val kmAssigned = Ckpt(ek.select(col("vec_id"),
      array_min(kmScored).getField("cid").as("cid"))).df
    def kmCandOf(np: Int): DataFrame =
      kmAssigned.join(
          broadcast(ek.filter(probePred).select(col("vec_id").as("qid"),
              explode(slice(array_sort(kmScored), 1, np)).as("p"))
            .select(col("qid"), col("p.cid").as("cid"))), "cid")
        .filter(col("vec_id") =!= col("qid"))
        .agg(count(lit(1)).as("cand_pairs"))
    val kmRows = KmIvfNprobeSweep.map { np =>
      hitsOf(annIvfKmResults(spark, sfDir, probePred, np), truthCos)
        .crossJoin(kmCandOf(np))
        .select(lit("ivf_km").as("tier") +: lit(np).as("nprobe") +: shape: _*)
    }
    (rows ++ kmRows).reduce(_.unionByName(_)).orderBy("tier", "nprobe")
  }

  /** B24: deterministic distributed k-means (Lloyd) — the production
    * centroid trainer for the IVF index below. Init = the k smallest
    * vec_ids (deterministic; k-means|| is the scalable seeding swap).
    * Each iteration is ONE broadcast (k·d doubles) + ONE hash aggregate:
    * assignment is an argmin over the broadcast centroids computed
    * per-row, and the new centroids are d per-cell `avg` aggregates —
    * partial aggregation makes the shuffle k·d rows regardless of corpus
    * size, the standard Spark k-means shape. Distances are rounded
    * before the argmin (float-parity rule) so assignment is
    * deterministic; `avg` re-ordering noise does not affect
    * determinism on a fixed partitioning, and the spec pins the
    * monotone-inertia invariant rather than exact centroid bits.
    * [[qKmeans]] below is the INTEGER-EXACT variant whose whole
    * training loop sits under the DuckDB oracle. */
  def kmeansCentroids(vecs: DataFrame, k: Int, dims: Int, iters: Int): DataFrame = {
    var cent = vecs.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int").as("cid"),
        transform(col("embedding"), _.cast("double")).as("cv"))
    var prevIter: Option[Ckpt] = None
    for (_ <- 0 until iters) {
      val d2 = round(sqDist(col("embedding"), col("cv")), 6)
      val wAssign = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
      val assigned = vecs.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("embedding"), col("cid"), d2.as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
      val dimAvgs = (0 until dims).map(i =>
        avg(element_at(col("embedding"), i + 1).cast("double")).as(s"d$i"))
      // truncate the per-iteration lineage; release iteration k−1's
      // centroid blocks once k's have materialized (the final iteration
      // stays resident for the returned plan)
      val next = Ckpt(assigned.groupBy("cid")
        .agg(dimAvgs.head, dimAvgs.tail: _*)
        .select(col("cid"), array((0 until dims).map(i => col(s"d$i")): _*).as("cv")))
      prevIter.foreach(_.release())
      prevIter = Some(next)
      cent = next.df
    }
    cent
  }

  /** Micro-unit quantization scale for the INTEGER-EXACT Lloyd variant
    * below (the q_emb_outliers device). Shared with the SemDeDup
    * clustering ([[Curate.qDedupSemantic]]) so both sides of that
    * oracle quantize identically. */
  private[ops] val KmScale = 10000.0
  private val KmK = 4
  private val KmIters = 2

  /** B24 INTEGER-EXACT Lloyd k-means — [[kmeansCentroids]] is the
    * float production trainer (not oracled: float `avg` centroids are
    * order-sensitive); THIS variant quantizes every coordinate to
    * 1e-4 micro-units up front and keeps both halves of every
    * iteration in exact cross-engine arithmetic, so the whole training
    * loop sits under the DuckDB oracle:
    *  - assignment: argmin over Σ(q−c)² in pure long arithmetic
    *    ((q−c)² ≤ 4e8 · 64 dims ≪ 2⁶³), cid tie-break;
    *  - update: c′ = floor(Σq / n) — the sum is an exact long, the one
    *    division runs in IEEE double on exact-≤2⁵³ integers, and floor
    *    lands back on an integer: bit-identical in Spark and DuckDB.
    * Init = the k smallest vec_ids' quantized vectors; an emptied
    * cluster keeps its previous centroid (both engines mirror the
    * LEFT-JOIN-coalesce). Per iteration the plan is ONE hash aggregate
    * (partial-agg k·(d+1) rows regardless of corpus size) with the
    * centroids as broadcast-free driver LITERALS (k·d = 256 values —
    * the PQ-codebook device), assignment being a per-row array_min
    * projection. Output: the post-iteration-[[KmIters]] centroids,
    * micro-unit integers, one row per (cid, pos), with member counts.
    * KmeansExactSpec pins equality to an independent in-memory Lloyd. */
  def qKmeans(spark: SparkSession, sfDir: String): DataFrame =
    kmeansExact(Tables.embeddings(spark, sfDir), KmK, 64, KmIters)

  /** Above this k the assignment switches from driver-literal centroid
    * arrays (shuffle-free, but plan size and codegen grow with k·d) to
    * a broadcast centroid TABLE + hash-agg argmin. NOTE: that
    * single-level branch is the exact-GLOBAL-argmin baseline only — at
    * corpus-derived k (SemDeDup's k = n/64) its n·k distance work and
    * k·d broadcast are the scale killers; production corpus-derived-k
    * callers use [[kmeansExactIvf]] (two-level coarse→fine assignment,
    * n·√k work, √k·d broadcast) and the single-level form survives as
    * the recall/structure reference the IVF spec measures against. */
  private val KmLiteralMaxK = 64

  private[graft] def kmeansExact(vecs: DataFrame, k: Int, dims: Int,
      iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    val qv = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(KmScale)).cast("long")).as("qv"))
    // init: quantized vectors of the k smallest vec_ids (k·d longs)
    var cent: Seq[(Long, IndexedSeq[Long])] = qv.orderBy("vec_id").limit(k)
      .collect().toIndexedSeq
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Long]](1).toIndexedSeq))
      .sortBy(_._1)
    def centArr = array(cent.toIndexedSeq.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cv"))
    }: _*)
    def assigned =
      if (k <= KmLiteralMaxK) {
        // small k: centroids as plan literals — per-row array_min
        // projection, zero shuffle (the PQ-codebook device)
        val scored = transform(centArr, e =>
          struct(aggregate(zip_with(col("qv"), e.getField("cv"),
            (x, c) => (x - c) * (x - c)), lit(0L), (a, y) => a + y).as("d2"),
            e.getField("cid").as("cid")))
        qv.withColumn("cid", array_min(scored).getField("cid"))
      } else {
        // corpus-derived k: centroids as a broadcast TABLE (k·d longs —
        // plan size stays O(1) however large k grows); argmin is a
        // map-side-combining hash agg (n·k candidate rows never
        // shuffle, only n (vec_id, min-struct) rows do), then one join
        // re-attaches qv. Same exact long arithmetic, same (d2, cid)
        // tie-break via struct ordering.
        val centDf = spark.createDataFrame(
          cent.map { case (cid, cv) => (cid, cv.toArray) }).toDF("c2", "cv")
        val d2 = aggregate(zip_with(col("qv"), col("cv"),
          (x, c) => (x - c) * (x - c)), lit(0L), (a, y) => a + y)
        val ids = qv.crossJoin(broadcast(centDf))
          .select(col("vec_id"),
            struct(d2.as("d2"), col("c2").as("cid")).as("s"))
          .groupBy("vec_id").agg(min(col("s")).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
        qv.join(ids, Seq("vec_id"))
      }
    val sums = (0 until dims).map(i => sum(element_at(col("qv"), i + 1)).as(s"s$i"))
    // iterations 1..iters−1 round-trip through the driver (k·(d+1)
    // values — centroids ARE driver state in every production k-means);
    // the FINAL update stays a DataFrame so the returned plan computes
    // the answer in-engine
    for (_ <- 0 until iters - 1) {
      val rows = assigned.groupBy("cid").agg(count(lit(1)).as("n"), sums: _*)
        .collect().map { r =>
          val n = r.getLong(1)
          r.getLong(0) -> (0 until dims).map(i =>
            math.floor(r.getLong(i + 2).toDouble / n).toLong)
        }.toMap
      cent = cent.map { case (cid, old) => (cid, rows.getOrElse(cid, old)) }
    }
    val agg = assigned.groupBy("cid").agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cid"), col("n"),
        posexplode(array((0 until dims).map(i => col(s"s$i")): _*))
          .as(Seq("p0", "s")))
      .select(col("cid"), ((col("p0") + 1).cast("long")).as("pos"),
        col("n"), col("s"))
    val prev = spark.createDataFrame(
      cent.flatMap { case (cid, cv) =>
        cv.zipWithIndex.map { case (c, i) => (cid, (i + 1).toLong, c) }
      }).toDF("cid", "pos", "prev_c")
    prev.join(agg, Seq("cid", "pos"), "left")
      .select(col("cid"), col("pos"),
        when(col("n").isNull, col("prev_c"))
          .otherwise(floor(col("s").cast("double") / col("n")).cast("long"))
          .as("c_q"),
        coalesce(col("n"), lit(0L)).as("n_members"))
      .orderBy("cid", "pos")
  }

  // ------------------------------------------- two-level (IVF) Lloyd

  /** Coarse-cell count for corpus-derived k: ⌈√k⌉ cells make both the
    * vector→cell argmin (n·√k distance evals) and the expected
    * per-cell fine probe (n·k/√k = n·√k when cells balance) the same
    * √k budget — the classic IVF split. At n = 10⁹ (k ≈ 1.6·10⁷) the
    * coarse table is √k·d·8 B ≈ 2 MB — broadcastable where the full
    * k·d table (~8 GB) is not. */
  private[graft] def kmCoarseK(k: Int): Int =
    math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Exact squared L2 between two long arrays — one codegen'd
    * zip_with/fold; (q−c)² ≤ 4e8 · 64 dims ≪ 2⁶³ so no overflow. */
  private def sqDistL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0L), (s, y) => s + y)

  private def centToDf(spark: SparkSession,
      cent: Seq[(Long, IndexedSeq[Long])],
      idCol: String, vecCol: String): DataFrame =
    spark.createDataFrame(cent.map { case (i, v) => (i, v.toArray) })
      .toDF(idCol, vecCol)

  /** ONE two-level assignment pass: (1) each FINE centroid finds its
    * coarse cell (k·√k work against the broadcast coarse table);
    * (2) each vector finds its nearest OCCUPIED cell (n·√k — the
    * occupancy restriction guarantees every vector has fine
    * candidates even when a cell holds no centroid this iteration);
    * (3) the fine argmin probes only that cell's centroids via an
    * EQUI-JOIN on gid — a hash/sort-merge join at any k, never a
    * cross join — then reduces map-side to one (vec_id, cid) row.
    * All arithmetic exact longs; ties break (d2, cid)/(d2, gid) via
    * struct ordering, mirrored by the oracle's row_number ORDER BY. */
  private def ivfAssign(qv: DataFrame, centDf: DataFrame,
      coarseDf: DataFrame): DataFrame = {
    val cg = centDf.crossJoin(broadcast(coarseDf))
      .select(col("cid"),
        struct(sqDistL(col("cv"), col("gv")).as("d2"),
          col("gid").as("gid")).as("s"))
      .groupBy("cid").agg(min(col("s")).as("m"))
      .select(col("cid"), col("m.gid").as("gid"))
    val occ = coarseDf.join(cg.select("gid").distinct(), Seq("gid"))
    val vg = qv.crossJoin(broadcast(occ))
      .select(col("vec_id"),
        struct(sqDistL(col("qv"), col("gv")).as("d2"),
          col("gid").as("gid")).as("s"))
      .groupBy("vec_id").agg(min(col("s")).as("m"))
      .select(col("vec_id"), col("m.gid").as("gid"))
    qv.join(vg, Seq("vec_id"))
      .join(centDf.join(cg, Seq("cid")), Seq("gid"))
      .select(col("vec_id"),
        struct(sqDistL(col("qv"), col("cv")).as("d2"),
          col("cid").as("cid")).as("s"))
      .groupBy("vec_id").agg(min(col("s")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
  }

  /** The coarse quantizer: ONE exact Lloyd iteration of ⌈√k⌉ cells
    * over the INIT fine centroids THEMSELVES (the verdict's
    * "coarse-quantize the centroids with the same kmeansExact
    * device") — init = the kc smallest cids' vectors, assignment
    * argmin (d2, gid), update = floor(Σ/n) on exact longs, an emptied
    * cell keeps its init vector. Built once (k·√k work, distributed)
    * and FIXED across fine iterations, like any IVF coarse stage; the
    * √k·(d+1) result is the ONLY k-dependent driver state the whole
    * trainer keeps (≈2 MB at n = 10⁹ — the fine centroids stay a
    * checkpointed DataFrame, see [[kmeansExactIvf]]). */
  private def ivfCoarse(initDf: DataFrame, kc: Int, dims: Int)
      : Seq[(Long, IndexedSeq[Long])] = {
    val spark = initDf.sparkSession
    val g0: Seq[(Long, IndexedSeq[Long])] =
      initDf.orderBy("cid").limit(kc).collect().toIndexedSeq
        .map(r => (r.getLong(0),
          r.getAs[scala.collection.Seq[Long]](1).toIndexedSeq))
        .sortBy(_._1)
    val g0Df = centToDf(spark, g0, "gid", "gv")
    val ig = initDf.crossJoin(broadcast(g0Df))
      .select(col("cid"),
        struct(sqDistL(col("cv"), col("gv")).as("d2"),
          col("gid").as("gid")).as("s"))
      .groupBy("cid").agg(min(col("s")).as("m"))
      .select(col("cid"), col("m.gid").as("gid"))
    val sums = (0 until dims).map(i =>
      sum(element_at(col("cv"), i + 1)).as(s"s$i"))
    val rows = initDf.join(ig, Seq("cid"))
      .groupBy("gid").agg(count(lit(1)).as("n"), sums: _*)
      .collect().map { r =>
        val n = r.getLong(1)
        r.getLong(0) -> (0 until dims).map(i =>
          math.floor(r.getLong(i + 2).toDouble / n).toLong)
      }.toMap
    g0.map { case (gid, old) => (gid, rows.getOrElse(gid, old)) }
  }

  private[graft] final case class KmIvf(centroids: DataFrame,
      assign: DataFrame)

  /** Corpus-derived-k trainer (the SemDeDup production path): the same
    * integer-exact Lloyd as [[kmeansExact]] — identical quantization,
    * init, floor-division update, emptied-cluster rule — but EVERY
    * assignment pass (each iteration AND the final assignment under
    * the trained centroids) is the two-level [[ivfAssign]] probe:
    * n·√k distance work and a √k·d broadcast instead of n·k work and
    * a k·d broadcast, with the fine probe an equi-join on the cell
    * id. The nearest fine centroid can live in a neighboring cell
    * (the standard IVF approximation — recall measured in
    * KmeansIvfSpec); the DuckDB oracle mirrors the two-level argmin
    * exactly ([[kmeansIvfCtes]]), so the approximation is pinned, not
    * hidden. Returns the final centroids (same shape as
    * [[kmeansExact]]) plus the (vec_id, cid) assignment under them. */
  private[graft] def kmeansExactIvf(vecs: DataFrame, k: Int, dims: Int,
      iters: Int): KmIvf = {
    val spark = vecs.sparkSession
    val qv = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(KmScale)).cast("long")).as("qv"))
    // the fine-centroid table is DISTRIBUTED state for the whole
    // training loop: at the SemDeDup production point k = n/64, k·d
    // driver longs would be ~8 GB at n = 10⁹ — collecting it (or
    // re-shipping it as a per-pass LocalRelation) makes the driver the
    // bottleneck. Each Lloyd update is computed, joined, and
    // re-checkpointed in-engine ([[Ckpt]]'s release discipline bounds
    // resident rounds to one); the ONLY k-dependent driver state is
    // ivfCoarse's √k cell table, which every pass broadcasts anyway.
    var cent: Ckpt = Ckpt(qv.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("qv").as("cv")))
    val coarse = ivfCoarse(cent.df, kmCoarseK(k), dims)
    val coarseDf = centToDf(spark, coarse, "gid", "gv")
    def assigned(c: DataFrame) =
      qv.join(ivfAssign(qv, c, coarseDf), Seq("vec_id"))
    val sums = (0 until dims).map(i =>
      sum(element_at(col("qv"), i + 1)).as(s"s$i"))
    for (_ <- 0 until iters - 1) {
      // floor(Σ/n) per dimension, exactly the driver arithmetic the
      // collect-based loop used (double division, floor, long) — the
      // oracle's CTE chain is unchanged; an emptied cluster keeps its
      // previous centroid via the left join
      val upd = assigned(cent.df)
        .groupBy("cid").agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cid"), array((0 until dims).map(i =>
          floor(col(s"s$i").cast("double") / col("n")).cast("long")): _*)
          .as("ncv"))
      val next = Ckpt(cent.df.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ncv"), col("cv")).as("cv")))
      cent.release()
      cent = next
    }
    val agg = assigned(cent.df)
      .groupBy("cid").agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cid"), col("n"),
        posexplode(array((0 until dims).map(i => col(s"s$i")): _*))
          .as(Seq("p0", "s")))
      .select(col("cid"), ((col("p0") + 1).cast("long")).as("pos"),
        col("n"), col("s"))
    val prev = cent.df
      .select(col("cid"), posexplode(col("cv")).as(Seq("p0", "prev_c")))
      .select(col("cid"), ((col("p0") + 1).cast("long")).as("pos"),
        col("prev_c"))
    val centroids = prev.join(agg, Seq("cid", "pos"), "left")
      .select(col("cid"), col("pos"),
        when(col("n").isNull, col("prev_c"))
          .otherwise(floor(col("s").cast("double") / col("n")).cast("long"))
          .as("c_q"),
        coalesce(col("n"), lit(0L)).as("n_members"))
    val centArrs = centroids.groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c_q")))),
        s => s.getField("c_q")).as("cv"))
    KmIvf(centroids.orderBy("cid", "pos"), ivfAssign(qv, centArrs, coarseDf))
  }

  /** cg/vg/a CTE triple mirroring one [[ivfAssign]] pass under
    * centroid CTE `centC`, names suffixed `sfx` (requires the `q` and
    * `g1` CTEs of [[kmeansIvfCtes]] in scope). */
  private def ivfAssignCtes(sfx: String, centC: String): String =
    s"""cg$sfx AS (
       |  SELECT cid, gid FROM (
       |    SELECT cid, gid,
       |      row_number() OVER (PARTITION BY cid ORDER BY dc2, gid) AS rn
       |    FROM (SELECT p.cid, g.gid, sum((p.c - g.c) * (p.c - g.c)) AS dc2
       |          FROM $centC p JOIN g1 g ON p.pos = g.pos
       |          GROUP BY p.cid, g.gid))
       |  WHERE rn = 1),
       |vg$sfx AS (
       |  SELECT vec_id, gid FROM (
       |    SELECT vec_id, gid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dg2, gid) AS rn
       |    FROM (SELECT q.vec_id, g.gid, sum((q.qd - g.c) * (q.qd - g.c)) AS dg2
       |          FROM q JOIN g1 g ON q.pos = g.pos
       |          WHERE g.gid IN (SELECT DISTINCT gid FROM cg$sfx)
       |          GROUP BY q.vec_id, g.gid))
       |  WHERE rn = 1),
       |a$sfx AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM (SELECT q.vec_id, c.cid, sum((q.qd - c.c) * (q.qd - c.c)) AS d2
       |          FROM q
       |          JOIN vg$sfx v ON q.vec_id = v.vec_id
       |          JOIN cg$sfx cg ON cg.gid = v.gid
       |          JOIN $centC c ON c.cid = cg.cid AND q.pos = c.pos
       |          GROUP BY q.vec_id, c.cid))
       |  WHERE rn = 1)""".stripMargin

  /** The two-level-Lloyd CTE chain mirroring [[kmeansExactIvf]]: the
    * same `q`/`c0` as [[kmeansLloydCtes]], the coarse quantizer
    * `g0`→`ig`/`gn`/`gs`→`g1` (one exact Lloyd step over the init
    * centroids), then per fine iteration the [[ivfAssignCtes]] triple
    * plus the shared n/s/c update CTEs. `kcExpr` must compute
    * ⌈√k⌉ exactly as [[kmCoarseK]] does. */
  private[ops] def kmeansIvfCtes(kExpr: String, kcExpr: String,
      iters: Int): String = {
    def iter(i: Int, prevC: String): String =
      s"""${ivfAssignCtes(i.toString, prevC)},
         |n$i AS (SELECT cid, count(*) AS n FROM a$i GROUP BY cid),
         |s$i AS (SELECT a$i.cid, q.pos, CAST(sum(q.qd) AS BIGINT) AS s
         |  FROM a$i JOIN q USING (vec_id) GROUP BY a$i.cid, q.pos),
         |c$i AS (
         |  SELECT p.cid, p.pos,
         |    CASE WHEN n$i.n IS NULL THEN p.c
         |      ELSE CAST(floor(CAST(s$i.s AS DOUBLE) / n$i.n) AS BIGINT) END AS c
         |  FROM $prevC p
         |  LEFT JOIN n$i ON p.cid = n$i.cid
         |  LEFT JOIN s$i ON p.cid = s$i.cid AND p.pos = s$i.pos)""".stripMargin
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * ${KmScale.toLong}) AS BIGINT) AS qd
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |c0 AS (SELECT vec_id AS cid, pos, qd AS c FROM q WHERE vec_id < $kExpr),
       |g0 AS (SELECT cid AS gid, pos, c FROM c0 WHERE cid < $kcExpr),
       |ig AS (
       |  SELECT cid, gid FROM (
       |    SELECT cid, gid,
       |      row_number() OVER (PARTITION BY cid ORDER BY d2, gid) AS rn
       |    FROM (SELECT p.cid, g.gid, sum((p.c - g.c) * (p.c - g.c)) AS d2
       |          FROM c0 p JOIN g0 g ON p.pos = g.pos
       |          GROUP BY p.cid, g.gid))
       |  WHERE rn = 1),
       |gn AS (SELECT gid, count(*) AS n FROM ig GROUP BY gid),
       |gs AS (SELECT ig.gid, c0.pos, CAST(sum(c0.c) AS BIGINT) AS s
       |  FROM ig JOIN c0 USING (cid) GROUP BY ig.gid, c0.pos),
       |g1 AS (
       |  SELECT g0.gid, g0.pos,
       |    CASE WHEN gn.n IS NULL THEN g0.c
       |      ELSE CAST(floor(CAST(gs.s AS DOUBLE) / gn.n) AS BIGINT) END AS c
       |  FROM g0 LEFT JOIN gn ON g0.gid = gn.gid
       |  LEFT JOIN gs ON g0.gid = gs.gid AND g0.pos = gs.pos),
       |${(1 to iters).map(i => iter(i, s"c${i - 1}")).mkString(",\n")}""".stripMargin
  }

  /** Final two-level assignment under the trained centroids CTE —
    * emits `cgf`/`vgf`/`af`, mirroring the trainer's returned
    * `assign`. */
  private[ops] def kmeansIvfFinalAssignCte(lastC: String): String =
    ivfAssignCtes("f", lastC)

  /** The quantized-Lloyd CTE chain shared by the q_kmeans oracle and
    * the SemDeDup clustering oracle ([[Curate]]): `q` (micro-unit
    * quantized coordinates), `c0` (init = the quantized vectors of the
    * vec_ids below `kExpr` — any SQL expression, so k may be derived
    * from the corpus size), and per-iteration assignment/count/sum/
    * update CTEs `a$i`/`n$i`/`s$i`/`c$i` (assignment argmin via
    * row_number, update via the floor-of-double division, emptied
    * clusters kept by the LEFT-JOIN-coalesce). */
  private[ops] def kmeansLloydCtes(kExpr: String, iters: Int): String = {
    def iter(i: Int, prevC: String): String =
      s"""a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT q.vec_id, c.cid,
         |            sum((q.qd - c.c) * (q.qd - c.c)) AS d2
         |          FROM q JOIN $prevC c ON q.pos = c.pos
         |          GROUP BY q.vec_id, c.cid))
         |  WHERE rn = 1),
         |n$i AS (SELECT cid, count(*) AS n FROM a$i GROUP BY cid),
         |s$i AS (SELECT a$i.cid, q.pos, CAST(sum(q.qd) AS BIGINT) AS s
         |  FROM a$i JOIN q USING (vec_id) GROUP BY a$i.cid, q.pos),
         |c$i AS (
         |  SELECT p.cid, p.pos,
         |    CASE WHEN n$i.n IS NULL THEN p.c
         |      ELSE CAST(floor(CAST(s$i.s AS DOUBLE) / n$i.n) AS BIGINT) END AS c
         |  FROM $prevC p
         |  LEFT JOIN n$i ON p.cid = n$i.cid
         |  LEFT JOIN s$i ON p.cid = s$i.cid AND p.pos = s$i.pos)""".stripMargin
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * ${KmScale.toLong}) AS BIGINT) AS qd
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |c0 AS (SELECT vec_id AS cid, pos, qd AS c FROM q WHERE vec_id < $kExpr),
       |${(1 to iters).map(i => iter(i, s"c${i - 1}")).mkString(",\n")}""".stripMargin
  }

  /** Generated q_kmeans oracle — the [[kmeansLloydCtes]] chain with the
    * fixed [[KmK]] and the final centroid/count projection. */
  private[ops] def kmeansOracle: String = {
    val last = KmIters
    s"""WITH ${kmeansLloydCtes(KmK.toString, last)}
       |SELECT c$last.cid AS cid, c$last.pos AS pos, c$last.c AS c_q,
       |  COALESCE(n$last.n, 0) AS n_members
       |FROM c$last LEFT JOIN n$last ON c$last.cid = n$last.cid
       |ORDER BY c$last.cid, c$last.pos""".stripMargin
  }

  /** Exact squared distance between a float vector and a double
    * centroid: one zip_with/fold, codegen'd. */
  private def sqDist(emb: Column, cv: Column): Column =
    aggregate(zip_with(emb, cv, (x, c) => {
      val d = x.cast("double") - c
      d * d
    }), lit(0.0), (a, e) => a + e)

  /** Mean rounded within-cluster squared distance for a centroid set —
    * the k-means objective (used by the spec's monotonicity check). */
  def kmeansInertia(vecs: DataFrame, cent: DataFrame): Double = {
    val d2 = round(sqDist(col("embedding"), col("cv")), 6)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    vecs.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), d2.as("d2"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .agg(avg("d2")).head().getDouble(0)
  }

  /** B24 IVF-style ANN (the second 100 TB scale path, complementing the
    * random-hyperplane buckets of qAnnBuckets): a coarse quantizer
    * partitions the corpus into cells, and each query searches only its
    * nprobe=2 NEAREST cells (the standard IVF recall knob) instead of
    * the whole corpus.
    *
    * Centroids here are a deterministic subset (vec_id < 8) so the DuckDB
    * oracle can reproduce the assignment exactly; in production they come
    * from [[kmeansCentroids]] (same cell-assignment code path, spec'd by
    * KmeansSpec) and the structure is identical — a tiny broadcast
    * centroid table, one argmin pass to assign (scan→project, no
    * shuffle), then per-cell search as an equi-join on cell id. Distances
    * are rounded before the argmin/rank so both engines order identical
    * values (float-parity rule). */
  def qAnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    annIvfResults(spark, sfDir, col("vec_id") < 3)

  /** The cell-probe dial for the IVF/IVFADC tiers. Sized by the
    * ORACLED recall-vs-cost curve ([[qAnnRecallCurve]]), whose verdict
    * is a DEMOTION, not a dial bump: recall rises ~linearly with
    * scanned-candidate cost (0.424@2 → 0.712@4 → 1.0@8 at sf0.01) and
    * no dial short of the exhaustive nprobe=8-of-8 clears the 0.8
    * serving floor — nprobe=8 IS the brute scan, and IVFADC stays
    * under 0.8 even exhaustive (quantization-capped). So these tiers
    * are CANDIDATE-GENERATION paths in the crosswalk (the
    * q_ann_buckets precedent), priced at the cheapest useful dial;
    * cell-probed SERVING belongs to the TRAINED-quantizer tier
    * ([[qAnnIvfKmeans]] — same curve, clears the floor at nprobe=16)
    * and graph serving to the beam walk (0.984, q_ann_recall_tiers).
    * q_ann_ivf, q_ann_ivfpq(_idx) and the recall gates all read this
    * one constant, so the gated numbers are the production dial's. */
  private[graft] val IvfNprobe = 2
  /** The curve's swept dial values (8 cells ⇒ nprobe=8 is exhaustive —
    * the curve's own upper anchor). */
  private[graft] val IvfNprobeSweep = Seq(2, 4, 8)

  /** The IVF front shared by the search path and the recall curve's
    * cost column: embeddings frame + the per-row (d2, cid) scored
    * literal-centroid array. Centroids are driver LITERALS (8 rows —
    * the bounded-collect device shared with qAnnIvfPq / the PQ
    * codebooks): assignment and probe selection are per-row
    * array_min / array_sort projections — no corpus crossJoin, no
    * row_number window. */
  private[graft] def ivfCellParts(spark: SparkSession,
      sfDir: String): (DataFrame, Column) = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centRows = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Any]](1).toSeq
          .map(_.asInstanceOf[Number].doubleValue)))
      .sortBy(_._1).toIndexedSeq
    val centArr = array(centRows.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cv"))
    }: _*)
    // rank centroids per vector: ||e||² − 2·e·c + ||c||²
    def cellD2(entry: Column): Column = round(
      sumSq(col("embedding")) - lit(2.0) * dot(col("embedding"), entry.getField("cv")) +
        sumSq(entry.getField("cv")), 6)
    val cellScored = transform(centArr, entry =>
      struct(cellD2(entry).as("d2"), entry.getField("cid").as("cid")))
    (e, cellScored)
  }

  /** Trained-quantizer IVF dials: [[KmIvfK]] Lloyd-trained cells (the
    * integer-exact [[kmeansExact]] trainer, so the whole training loop
    * sits under the oracle), [[KmIvfNprobe]] = the smallest swept dial
    * whose oracled recall@5 clears the 0.8 serving floor
    * ([[qAnnRecallCurve]] measures 0.832/0.834 at both test corpora —
    * HALF the brute scan; on this deliberately isotropic synthetic
    * corpus that is the attainable cell-probe efficiency, and the
    * trained quantizer DOMINATES the deterministic 8-cell tier at
    * every equal-scan point of the curve: +0.12 recall at the ~100k-
    * pair point at sf0.1). This makes q_ann_ivf_kmeans the one
    * cell-probed tier promoted to serving in the crosswalk. */
  private[graft] val KmIvfK = 32
  private[graft] val KmIvfIters = 2
  private[graft] val KmIvfNprobe = 16
  private[graft] val KmIvfNprobeSweep = Seq(2, 4, 8, 16)

  /** Session memo of the TRAINED literal centroids (k·d micro-unit
    * longs — bounded driver state, the PQ-codebook device), keyed by
    * the fixture file's identity so a regenerated corpus re-trains.
    * Training runs [[kmeansExact]] once per corpus per JVM; every
    * caller (the serving entry, the recall curve's 4-dial sweep)
    * shares the result, exactly as production shares a trained coarse
    * quantizer across queries. */
  private val kmCentMemo =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[(Long, IndexedSeq[Long])]]()
  private def trainedCentroids(spark: SparkSession,
      sfDir: String): IndexedSeq[(Long, IndexedSeq[Long])] = {
    // shared recursive content stamp + stale-key eviction — the one
    // freshness discipline all per-corpus memos use (review r15)
    val key =
      s"$sfDir:${Housekeeping.contentStamp(s"$sfDir/embeddings.parquet")}"
    if (!kmCentMemo.containsKey(key)) // racy pre-clean: duplicates harmless
      kmCentMemo.keySet().removeIf((k: String) => k.startsWith(s"$sfDir:"))
    kmCentMemo.computeIfAbsent(key, _ =>
      kmeansExact(Tables.embeddings(spark, sfDir), KmIvfK, 64, KmIvfIters)
        .collect().groupBy(_.getLong(0)).toIndexedSeq.sortBy(_._1)
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getLong(1)).map(_.getLong(2)).toIndexedSeq) })
  }

  /** The trained-IVF front: embeddings frame + the per-row
    * (d2, cid) scored array over the TRAINED literal centroids —
    * exact long arithmetic against the micro-unit quantized row (the
    * kmeansExact assignment device), so assignment and probe ranking
    * replay exactly in SQL off the same Lloyd chain. */
  private[graft] def ivfKmParts(spark: SparkSession,
      sfDir: String): (DataFrame, Column) = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centArr = array(trainedCentroids(spark, sfDir).map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cv"))
    }: _*)
    val qvCol = transform(col("embedding"),
      x => floor(x.cast("double") * lit(KmScale)).cast("long"))
    val scored = transform(centArr, en =>
      struct(aggregate(zip_with(qvCol, en.getField("cv"),
        (x, c) => (x - c) * (x - c)), lit(0L), (a, y) => a + y).as("d2"),
        en.getField("cid").as("cid")))
    (e, scored)
  }

  /** B24 TRAINED-QUANTIZER IVF — the cell-probed tier that CLEARS the
    * serving floor: [[KmIvfK]] Lloyd cells from the oracled integer-
    * exact trainer replace [[qAnnIvf]]'s deterministic 8-vector
    * quantizer; assignment and probe selection are per-row argmin /
    * array_sort projections over the literal trained centroids (zero
    * exchanges in the front), and the search tail is the same
    * cell-restricted exact-cosine top-5. At [[KmIvfNprobe]] the
    * oracled curve measures recall@5 = 0.83 at HALF the brute scan —
    * the deterministic tier never clears 0.8 short of scanning
    * everything. Scale shape: train once per corpus version (k·(d+1)
    * driver state — production k-means), store the corpus partitioned
    * BY CELL so the probe set prunes to files, exactly the
    * q_ann_ivfpq_idx layout. */
  def qAnnIvfKmeans(spark: SparkSession, sfDir: String): DataFrame =
    annIvfKmResults(spark, sfDir, col("vec_id") < 3)

  private[graft] def annIvfKmResults(spark: SparkSession, sfDir: String,
      probePred: Column, nprobe: Int = KmIvfNprobe): DataFrame = {
    val (e, cellScored) = ivfKmParts(spark, sfDir)
    val assigned = e
      .select(col("vec_id"), col("embedding"),
        array_min(cellScored).getField("cid").as("cid"),
        sqrt(sumSq(col("embedding"))).as("nrm"))
    val probes = e.filter(probePred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        explode(slice(array_sort(cellScored), 1, nprobe)).as("p"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
      .select(col("qid"), col("qv"), col("p.cid").as("cid"), col("qnrm"))
    val cos = round(dot(col("embedding"), col("qv")) /
      (col("nrm") * col("qnrm")), 6)
    val wRank = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cid"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rn", row_number().over(wRank)).filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** [[qAnnIvf]] with the probe set and nprobe as parameters — the
    * recall metrics (GraphAnn.qAnnRecallTiers, [[qAnnRecallCurve]])
    * measure the SAME search over their own probe sample / dial
    * sweep, so the gated numbers are the production path's, not a
    * twin's. */
  private[graft] def annIvfResults(spark: SparkSession, sfDir: String,
      probePred: Column, nprobe: Int = IvfNprobe): DataFrame = {
    val (e, cellScored) = ivfCellParts(spark, sfDir)
    val assigned = e
      .select(col("vec_id"), col("embedding"),
        array_min(cellScored).getField("cid").as("cid"),
        sqrt(sumSq(col("embedding"))).as("nrm")) // hoisted per-vector norm
    // probes: each query searches its nprobe nearest cells
    val probes = e.filter(probePred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        explode(slice(array_sort(cellScored), 1, nprobe)).as("p"),
        sqrt(sumSq(col("embedding"))).as("qnrm"))
      .select(col("qid"), col("qv"), col("p.cid").as("cid"), col("qnrm"))
    val cos = round(dot(col("embedding"), col("qv")) /
      (col("nrm") * col("qnrm")), 6)
    val wRank = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cid"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rn", row_number().over(wRank)).filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** PQ layout: M subvectors × SubDim dims (= the 64-dim embedding),
    * K codewords per subspace → M bytes/vector at search time; ADC
    * shortlist depth for the exact-dot rerank. Sized on measured recall:
    * M=8/K=64/R=50 reaches 15/15 recall@5 on the shipped corpus vs
    * IVF-nprobe2's 14/15, with a rerank read budget (50 vectors) well
    * under IVF's ~2N/8-cell scan. */
  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 64
  private val PqShortlist = 50

  /** Per-subspace codebook: sub-slices of a deterministic vector subset
    * (vec_id < K — same oracle-reproducibility device as [[qAnnIvf]]'s
    * centroids; in production each subspace's codebook comes from
    * [[pqCodebookKmeans]] below, same assignment code path). */
  private def pqCodebook(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int").as("cid"),
        explode(array((0 until PqM).map { m =>
          struct(lit(m).as("m"),
            slice(col("embedding"), m * PqSubDim + 1, PqSubDim).as("cw"))
        }: _*)).as("s"))
      .select(col("s.m").as("m"), col("cid"), col("s.cw").as("cw"))

  /** PRODUCTION codebook trainer: per-subspace Lloyd iterations via
    * [[kmeansCentroids]] over the sub-slices (the classic PQ training,
    * Jégou et al.) — 8 independent k-means problems, each the
    * broadcast-argmin + k·d-row-shuffle shape. Not oracled (float `avg`
    * centroids — same determinism caveat KmeansSpec documents for IVF);
    * RecallSubsetSpec pins that it encodes at least as well as the
    * sampled codebook the oracle uses. */
  private[graft] def pqCodebookKmeans(e: DataFrame, k: Int = PqK,
      iters: Int = 3): DataFrame =
    (0 until PqM).map { m =>
      val sub = e.select(col("vec_id"),
        slice(col("embedding"), m * PqSubDim + 1, PqSubDim).as("embedding"))
      kmeansCentroids(sub, k, PqSubDim, iters)
        .select(lit(m).as("m"), col("cid"), col("cv").as("cw"))
    }.reduce(_.union(_))

  /** Collect a (m, cid, cw) codebook to driver literals — bounded by
    * the codebook LAYOUT (M·K = 512 rows, a few KB), never by data
    * size; the same class of bounded driver step as the range-join
    * boundaries. Entries come back cid-ascending per subspace. */
  private def collectCodebook(cb: DataFrame): Map[Int, Seq[(Int, Seq[Double])]] =
    cb.collect().map { r =>
      (r.getAs[Int]("m"), r.getAs[Int]("cid"),
        r.getAs[scala.collection.Seq[Any]]("cw").toSeq
          .map(_.asInstanceOf[Number].doubleValue))
    }.groupBy(_._1).map { case (m, rows) =>
      m -> rows.sortBy(_._2).map(t => (t._2, t._3)).toSeq
    }

  /** Per-row PQ-encode argmin over a LITERAL codebook: score every
    * codeword with the rounded subspace distance via one `transform`,
    * take `array_min` of (d2, cid) structs — struct ordering IS the
    * (d2 asc, cid asc) argmin with the float-parity tie-break, and the
    * whole thing is a projection: ZERO joins, ZERO exchanges, where the
    * former shape paid a K×-blowup broadcast join plus a corpus-sized
    * row_number window shuffle. `sv` may be float (raw sub-slices) or
    * double (residuals) — the explicit double cast covers both. */
  private def pqArgminCid(sv: Column, entries: Seq[(Int, Seq[Double])]): Column = {
    val cbArr = array(entries.map { case (cid, cw) =>
      struct(lit(cid).as("cid"), array(cw.map(lit): _*).as("cw"))
    }: _*)
    val scored = transform(cbArr, entry =>
      struct(
        round(aggregate(zip_with(sv, entry.getField("cw"), (x, c) => {
          val dd = x.cast("double") - c
          dd * dd
        }), lit(0.0), (a, y) => a + y), 6).as("d2"),
        entry.getField("cid").as("cid")))
    array_min(scored).getField("cid")
  }

  /** (vec_id, m, cid) codes of `vecCol`'s sub-slices against the
    * literal codebook — the shuffle-free ENCODE projection shared by
    * [[annPqFrom]] and [[qAnnIvfPq]]. */
  private def pqEncode(src: DataFrame, vecCol: String,
      entries: Map[Int, Seq[(Int, Seq[Double])]], keep: Seq[String]): DataFrame = {
    val codeStructs = array((0 until PqM).map { m =>
      struct(lit(m).as("m"), pqArgminCid(
        slice(col(vecCol), m * PqSubDim + 1, PqSubDim), entries(m)).as("cid"))
    }: _*)
    src.select(keep.map(col) :+ explode(codeStructs).as("c"): _*)
      .select(keep.map(col) ++ Seq(col("c.m").as("m"), col("c.cid").as("cid")): _*)
  }

  /** B24 product-quantization ANN — the 10× memory lever past int8: each
    * vector is encoded as M=8 codeword ids (a 64-dim/256-byte float
    * vector becomes 8 bytes at search time), query-to-corpus dot
    * products are answered from a per-query LOOKUP TABLE (ADC —
    * asymmetric distance computation) without touching the vectors, and
    * the ADC top-[[PqShortlist]] shortlist is reranked with exact dots
    * (the standard PQ serving stack: IVFADC minus the coarse stage).
    *
    * Shape: the codebook (M·K = 512 rows) broadcasts for the one-pass
    * ENCODE (argmin over rounded subspace distances, cid tie-break —
    * float-parity rule); each query's LUT (M·K dot products, micro-unit
    * INTEGERS so the M-way ADC sum is exact long arithmetic, order-free
    * across engines) broadcasts back over the code table; the ADC scan
    * never reads an embedding, and only the ≤R-per-query shortlist
    * fetches real vectors for the rerank join. At 100 TB the codes
    * relation is 1/32nd the embedding bytes, the per-query work is one
    * broadcast-join + partial-agg top-R + an R-row exact fetch — no
    * corpus shuffle at any step. Encoding is deterministic, so codes
    * persist as a standing column exactly like the minhash signatures.
    * RecallSubsetSpec pins recall@5 ≥ the IVF path's at a smaller read
    * budget. */
  def qAnnPq(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    annPqFrom(e, pqCodebook(e))
  }

  /** [[qAnnPq]]'s encode→ADC→rerank chain over any embeddings frame and
    * any (m, cid, cw) codebook — the spec drives it with the kmeans
    * production codebook; the recall metric (qAnnRecallPq) swaps in its
    * probe sample so the gated number is this path's own. */
  private[graft] def annPqFrom(e: DataFrame, cb: DataFrame,
      probePred: Column = col("vec_id") < 3): DataFrame = {
    // encode: argmin_cid ||sv − cw||² per (vector, subspace) — a single
    // projection over the literal codebook ([[pqEncode]]): the encode
    // stage carries ZERO exchanges
    val codes = pqEncode(e, "embedding", collectCodebook(cb), Seq("vec_id"))
    // per-query LUT: micro-unit integer partial dots
    val queries = e.filter(probePred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val lut = queries
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("m"), col("cid"),
        round(dot(slice(col("qv"), col("m") * PqSubDim + 1, lit(PqSubDim)),
          col("cw")) * 1e6, 0).cast("long").as("pd"))
    // ADC: sum the M looked-up partials — exact long arithmetic
    val wAdc = Window.partitionBy("qid").orderBy(col("adc_units").desc, col("vec_id"))
    val shortlist = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(sum(col("pd")).as("adc_units"))
      .withColumn("rn_adc", row_number().over(wAdc))
      .filter(col("rn_adc") <= PqShortlist)
      .select(col("qid"), col("vec_id"), col("adc_units"))
    // rerank the shortlist with exact (rounded) dots
    val wFinal = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id"))
    shortlist
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("vec_id"), col("adc_units"),
        round(dot(col("embedding"), col("qv")), 6).as("dot"))
      .withColumn("rn", row_number().over(wFinal)).filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** B24 IVF+PQ composed (IVFADC, Jégou et al. — the standard
    * billion-vector serving stack): the coarse quantizer restricts each
    * query to its nprobe=2 nearest cells ([[qAnnIvf]]'s recall knob),
    * and WITHIN the probed cells candidates are ranked by integer ADC
    * over RESIDUAL codebooks (vector − its cell centroid, PQ-encoded —
    * residuals concentrate near zero so the same codebook budget buys
    * less quantization error than raw-vector PQ), then the top-R
    * shortlist is reranked with exact dots.
    *
    * Exactness devices are the section's usual ones: centroids and the
    * residual codebook are deterministic vector subsets (vec_id < 8 /
    * < 64; production swaps [[kmeansCentroids]] into both, same code
    * path), distances round before every argmin, and the ADC score is
    * all-integer micro-units — round(dot(q, c)·1e6) for the cell term
    * plus the M looked-up residual partials — so cross-engine ordering
    * is exact. Scale shape: centroids, codebook, probes and LUT all
    * broadcast; the codes relation is scanned once; no corpus shuffle.
    * At 100 TB the codes live partitioned BY CELL, so a probe reads
    * only its two cells' files — the IVF pruning maps to partition
    * pruning. */
  def qAnnIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    annIvfPqResults(spark, sfDir, col("vec_id") < 3)

  /** [[qAnnIvfPq]] with the probe set as a parameter (the recall
    * metric's door, like [[annIvfResults]]) and an optional STANDING
    * codes store: when `storedCodesRoot` is set, the ADC scan reads
    * the cell-bucketed tx table there instead of encoding in-query,
    * with the probed cell ids pushed as a literal IN on the bucket
    * column — Spark's bucket pruning then reads ONLY the probed cells'
    * files (SelectedBucketsCount in the scan), which is the "IVF
    * pruning maps to partition pruning" claim of the scaladoc above
    * made literal. */
  /** The IVFADC chain's assign+encode FRONT, shared by the in-query
    * path and the standing-store builder: returns (embeddings frame,
    * codes frame (vec_id, ccid, m, rcid), residual codebook, the
    * per-row sorted (d2, ccid, cell_units) probe expression). */
  private[graft] def ivfPqParts(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame, DataFrame, Column) =
    ivfPqPartsEncoding(spark, sfDir, identity)

  /** [[ivfPqParts]] with the ENCODE restricted by `encodeOnly` (a
    * frame transform — a predicate or an ids semi-join) — the
    * admission path's door: the trained artifacts (coarse centroids,
    * residual codebook) always derive from the full fixture table
    * (production persists them and never retrains on ingest), while
    * assign+encode is a stateless per-row projection, so a day's
    * codes are computed from the day's rows alone. The batch slice is
    * row-identical to the same slice of the full encode by per-row
    * determinism — which is what lets an incrementally admitted store
    * carry the whole-corpus oracle. */
  private[graft] def ivfPqPartsEncoding(spark: SparkSession,
      sfDir: String, encodeOnly: DataFrame => DataFrame)
      : (DataFrame, DataFrame, DataFrame, Column) = {
    graft.expressions.FloatVectorDot.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    // coarse centroids as DRIVER LITERALS (8 rows — the same bounded
    // collect as the PQ codebooks): cell assignment becomes a per-row
    // array_min over a scored literal array instead of a corpus
    // crossJoin + row_number window — the whole assign+encode front of
    // the chain is now scan → project with zero exchanges
    val centRows = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("ccid"), col("embedding"))
      .collect().map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Any]](1).toSeq
          .map(_.asInstanceOf[Number].doubleValue)))
      .sortBy(_._1)
    val centArr = array(centRows.toIndexedSeq.map { case (ccid, cv) =>
      struct(lit(ccid).as("ccid"), array(cv.map(lit): _*).as("cv"))
    }: _*)
    def cellD2(entry: Column): Column = round(
      sumSq(col("embedding")) - lit(2.0) * dot(col("embedding"), entry.getField("cv")) +
        sumSq(entry.getField("cv")), 6)
    // (d2, ccid, cv) structs: array_min / array_sort order by (d2,
    // ccid) — (d2, ccid) is unique so the cv tail never compares
    val cellScored = transform(centArr, entry =>
      struct(cellD2(entry).as("d2"), entry.getField("ccid").as("ccid"),
        entry.getField("cv").as("cv")))
    def assignedOf(rows: DataFrame): DataFrame = rows
      .withColumn("best", array_min(cellScored))
      .select(col("vec_id"), col("best.ccid").as("ccid"),
        zip_with(col("embedding"), col("best.cv"),
          (x, c) => x.cast("double") - c).as("resid"))
    // residual codebook: sub-slices of the first 64 docs' residuals
    // (ALWAYS the full table's donors — a trained artifact)
    val rcb = assignedOf(e.filter(col("vec_id") < 64))
      .select(col("vec_id").cast("int").as("rcid"),
        explode(array((0 until PqM).map { m =>
          struct(lit(m).as("m"),
            slice(col("resid"), m * PqSubDim + 1, PqSubDim).as("cw"))
        }: _*)).as("s"))
      .select(col("s.m").as("m"), col("rcid"), col("s.cw").as("cw"))
    // encode: argmin_rcid ||resid_sub − cw||² over the literal residual
    // codebook — same shuffle-free projection as [[annPqFrom]]'s encode
    // (the encodePred restriction rides the scan: admission encodes
    // only the batch's rows)
    val codes = pqEncode(assignedOf(encodeOnly(e)), "resid",
        collectCodebook(rcb.withColumnRenamed("rcid", "cid")),
        Seq("vec_id", "ccid"))
      .withColumnRenamed("cid", "rcid")
    // probes: each query's 2 nearest cells from the same literal
    // centroid array (array_sort + slice), with the integer cell term
    val probeScored = array_sort(transform(centArr, entry =>
      struct(cellD2(entry).as("d2"), entry.getField("ccid").as("ccid"),
        round(dot(col("embedding"), entry.getField("cv")) * 1e6, 0)
          .cast("long").as("cell_units"))))
    (e, codes, rcb, probeScored)
  }

  /** Build the STANDING cell-bucketed PQ-codes store: the IVFADC codes
    * relation (vec_id, ccid, m, rcid), hash-bucketed BY CELL on a tx
    * table — the layout [[qAnnIvfPq]]'s scaladoc promises at 100 TB,
    * where a probe's cell restriction becomes file pruning. Encoding
    * is deterministic, so the stored codes are row-identical to the
    * in-query encode and the standing-store query is gated by the
    * SAME oracle. */
  private[graft] def buildIvfPqStore(spark: SparkSession, sfDir: String,
      root: String, seedOnly: DataFrame => DataFrame = identity): Unit = {
    val (_, codes, _, _) = ivfPqPartsEncoding(spark, sfDir, seedOnly)
    TxTable.createBucketed(spark, root, codes, "vec_id", Seq("ccid"), 8)
  }

  /** ADMISSION into the standing codes store (the ingest-capstone
    * door, mirroring Incremental.admitBatch): encode ONLY the batch's
    * rows under the corpus-trained artifacts
    * ([[ivfPqPartsWhere]]'s per-row determinism) and append them in
    * one atomic bucket-preserving commit; with `txn` a replayed
    * admission is absorbed (exactly-once). The store then equals the
    * whole-set encode row for row, so the q_ann_ivfpq oracle keeps
    * gating it. */
  private[graft] def admitPqBatch(spark: SparkSession, sfDir: String,
      root: String, ids: DataFrame,
      txn: Option[(String, Long)] = None): Unit = {
    val (_, codes, _, _) = ivfPqPartsEncoding(spark, sfDir,
      _.join(ids.select(col("vec_id")), Seq("vec_id"), "left_semi"))
    txn match {
      case Some((app, b)) => TxTable.appendBatch(spark, root, app, b, codes)
      case None => TxTable.append(spark, root, codes)
    }
  }

  private[graft] def annIvfPqResults(spark: SparkSession, sfDir: String,
      probePred: Column, storedCodesRoot: Option[String] = None,
      nprobe: Int = IvfNprobe, tombRoot: Option[String] = None): DataFrame = {
    // the MOR mask lives inside the stored-codes branch; a tombRoot
    // against in-query codes would silently serve unmasked candidates
    require(tombRoot.isEmpty || storedCodesRoot.isDefined,
      "tombRoot requires storedCodesRoot: the tombstone mask applies to " +
        "the standing codes store, not the in-query encode")
    val (e, inQueryCodes, rcb, probeScored) = ivfPqParts(spark, sfDir)
    val probes = e.filter(probePred)
      .select(col("vec_id").as("qid"), explode(slice(probeScored, 1, nprobe)).as("p"))
      .select(col("qid"), col("p.ccid").as("ccid"),
        col("p.cell_units").as("cell_units"))
    val codes = storedCodesRoot match {
      case None => inQueryCodes
      case Some(root) =>
        // the probed cell set is a bounded driver literal (≤ 2·probes
        // — the same class of bounded collect as the centroids): the
        // IN filter on the bucket column is what lets the bucketed
        // scan prune to exactly the probed cells' files
        val cells = probes.select("ccid").distinct()
          .collect().map(_.getInt(0)).sorted
        val stored = graft.io.TxRelation.read(spark, root)
          .filter(col("ccid").isin(cells.map(Integer.valueOf): _*))
        // MOR tombstone mask (retraction tier): reads are correct the
        // moment the tombstone commit lands, before any compaction
        tombRoot.fold(stored)(t => stored.join(
          graft.io.TxRelation.read(spark, t).select(col("vec_id")),
          Seq("vec_id"), "left_anti"))
    }
    val queries = e.filter(probePred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val lut = queries.crossJoin(broadcast(rcb))
      .select(col("qid"), col("m"), col("rcid"),
        round(dot(slice(col("qv"), col("m") * PqSubDim + 1, lit(PqSubDim)),
          col("cw")) * 1e6, 0).cast("long").as("pd"))
    // ADC within probed cells only
    val wAdc = Window.partitionBy("qid").orderBy(col("adc_units").desc, col("vec_id"))
    val shortlist = codes
      .join(broadcast(probes), Seq("ccid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "m", "rcid"))
      .groupBy("qid", "ccid", "vec_id", "cell_units")
      .agg(sum(col("pd")).as("rsum"))
      .select(col("qid"), col("ccid"), col("vec_id"),
        (col("cell_units") + col("rsum")).as("adc_units"))
      .withColumn("rn_adc", row_number().over(wAdc))
      .filter(col("rn_adc") <= PqShortlist)
    // exact rerank of the shortlist
    val wFinal = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id"))
    shortlist
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("ccid"), col("vec_id"),
        round(dot(col("embedding"), col("qv")), 6).as("dot"))
      .withColumn("rn", row_number().over(wFinal)).filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** Session-idempotent standing-store fixture for [[qAnnIvfPqIdx]]
    * (pid-scoped /tmp root, the Incremental.buildIndexes hygiene;
    * production builds the store once per corpus version). */
  private val pqStoreBuilt = scala.collection.mutable.Set[String]()
  private def ensurePqStore(spark: SparkSession, sfDir: String): String = {
    val root = "/tmp/graft_ivfpq_codes_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid
    // fast-path reads under the set monitor (mutable.Set gives no
    // guarantee for a read racing a resize); the multi-job store BUILD
    // runs under GraphAnn's NON-EVICTING per-root build lock (review
    // r15 — a delete+rebuild body must never lose its lock object the
    // way the evictable memo locks may) so unrelated roots never
    // serialize behind this set's monitor (r14 advice)
    if (!pqStoreBuilt.synchronized(pqStoreBuilt.contains(root)))
      GraphAnn.withBuildLock(s"pqstore:$root") {
      if (!pqStoreBuilt.synchronized(pqStoreBuilt.contains(root))) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_ivfpq_codes_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        buildIvfPqStore(spark, sfDir, root)
        pqStoreBuilt.synchronized(pqStoreBuilt.add(root))
      }
    }
    root
  }

  /** [[qAnnIvfPq]] over the STANDING cell-bucketed codes store: the
    * same IVFADC search with the ADC scan reading the tx table and the
    * probed cells pushed as bucket pruning (the scan's
    * SelectedBucketsCount stays ≤ 6 of 8 for the 3-probe × nprobe=2
    * contract — pinned in RecallSubsetSpec; 2-of-8 when all probes
    * share their two cells) — row-identical to the in-query
    * encode by encode determinism, so the SAME oracle gates it. */
  def qAnnIvfPqIdx(spark: SparkSession, sfDir: String): DataFrame =
    annIvfPqResults(spark, sfDir, col("vec_id") < 3,
      Some(ensurePqStore(spark, sfDir)))

  /** Deleted slice for the IVFPQ retraction fixture: every 10th vector
    * ABOVE the trained-artifact donor range — centroids (vec_id < 8)
    * and residual-codebook donors (vec_id < 64) stay, because a delete
    * batch retracts VECTORS, not the trained quantizer (production
    * retrains on rebuild, not on takedown), and the probe set
    * (vec_id < 3) is inside the donor range by construction.
    * ONE (modulus, remainder, floor) triple generates BOTH the Column
    * predicate and the oracle's survivor SQL fragment (review r16:
    * hand-duplicated literals would let the serve path and the gate
    * silently diverge). */
  private val PqDelSlice: (Long, Long, Long) = (10L, 7L, 64L)
  private[graft] def isDeletedPq: Column = {
    val (m, r, f) = PqDelSlice
    col("vec_id") % m === r && col("vec_id") >= f
  }
  /** The same slice as a SQL predicate fragment over `ref`. */
  private def pqDelSurvivorSql(ref: String): String = {
    val (m, r, f) = PqDelSlice
    s" AND NOT ($ref % $m = $r AND $ref >= $f)"
  }

  /** Session-idempotent retraction fixture for [[qAnnIvfPqDel]]: own
    * codes-store + tombstone roots (never the admission entry's store —
    * retraction must not thrash q_ann_ivfpq_idx's fixture), the full
    * corpus encoded, then the [[isDeletedPq]] slice retracted as ONE
    * exactly-once tombstone commit followed by per-bucket compaction
    * that makes the deletion physical (bucket placement and the txn
    * watermark survive; reads are identical before and after — the
    * serve path's MOR mask covers the gap). */
  private val pqDelBuilt = scala.collection.mutable.Set[String]()
  private[graft] def ensurePqDeleteStore(spark: SparkSession,
      sfDir: String): (String, String) = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid
    val croot = s"/tmp/graft_ivfpq_dcodes_$tag"
    val troot = s"/tmp/graft_ivfpq_dtomb_$tag"
    if (!pqDelBuilt.synchronized(pqDelBuilt.contains(croot)))
      GraphAnn.withBuildLock(s"pqdelstore:$croot") {
      if (!pqDelBuilt.synchronized(pqDelBuilt.contains(croot))) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_ivfpq_d")
        Seq(croot, troot).foreach { r =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
        }
        buildIvfPqStore(spark, sfDir, croot)
        TxTable.createTombTable(troot, "vec_id")
        TxTable.appendBatch(spark, troot, "ivfpq_del", 1L,
          Tables.embeddings(spark, sfDir).filter(isDeletedPq)
            .select(col("vec_id"), lit(1L).as("deleted_at_v")),
          nFiles = 1)
        val tombs = graft.io.TxRelation.read(spark, troot)
          .select(col("vec_id"))
        TxTable.compactBuckets(spark, croot,
          _.join(tombs, Seq("vec_id"), "left_anti"))
        pqDelBuilt.synchronized(pqDelBuilt.add(croot))
      }
    }
    (croot, troot)
  }

  /** B24 RETRACTION on the cell-probed serving tier (the IVF/PQ twin
    * of q_ann_graph_deleted): the IVFADC search over the standing
    * codes store AFTER a delete batch — tombstoned vectors leave the
    * ADC scan (MOR anti-join mask at read; per-bucket compaction makes
    * it physical) and therefore the shortlist and the exact rerank,
    * while the TRAINED artifacts (coarse centroids, residual codebook)
    * and the probe set are untouched, exactly production's
    * takedown-vs-retrain split. Oracle: the identical chain with the
    * deleted slice excluded from the candidate codes — a from-scratch
    * IVFADC over the survivor corpus under the same quantizer. */
  def qAnnIvfPqDel(spark: SparkSession, sfDir: String): DataFrame = {
    val (croot, troot) = ensurePqDeleteStore(spark, sfDir)
    annIvfPqResults(spark, sfDir, col("vec_id") < 3, Some(croot),
      tombRoot = Some(troot))
  }

  /** B22+B23 composed: the end-to-end training-corpus pipeline — quality
    * filter (length + uniqueness) → exact near-dup removal (keep smallest
    * doc_id per content hash) → per-language corpus stats with a BPE-ish
    * token budget. Each stage is the oracled operator it reuses; the
    * composition is ONE scan → keep-smallest window by content hash →
    * one hash aggregate (stats) — no new shuffle shapes at 100 TB. */
  def qPipelineCorpus(spark: SparkSession, sfDir: String): DataFrame =
    pipelineCorpus(docs(spark, sfDir))

  /** Transform core, parameterized by the documents frame (unit-tested
    * on synthetic docs in FunnelRetentionSpec's sibling cases). */
  def pipelineCorpus(documents: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val clean = documents
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
        size(t).cast("long").as("n_toks"),
        (size(array_distinct(t)).cast("double") / size(t)).as("raw_uniq"))
      .filter(col("n_toks") >= 20 && col("raw_uniq") >= 0.3)
    // keep-smallest-per-hash as a WINDOW over the one cleaned pass: the
    // old groupBy(h)→min(doc_id)→self-join recomputed the `clean`
    // subtree (scan + tokenize) twice and shuffled three times (agg by
    // h, then both join sides by doc_id); the window is the same rows
    // in one scan + one shuffle by h (guide §2.4 — share the exchange)
    val kept = clean
      .withColumn("__keep_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__keep_id"))
    kept
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(ceil(col("n_chars") / 4.0).cast("long")).as("bpe_budget"),
        round(sum(col("n_toks")) / count(lit(1)), 4).as("avg_toks"))
      .orderBy("lang")
  }

  /** B23 cosine near-dup, LSH-bucketed (the 100 TB path for
    * qDedupCosine): the 12 hyperplanes split into 3 tables of 4 bits —
    * candidates are pairs agreeing on ANY table's 4-bit key (multi-table
    * OR trades candidate volume for recall, the standard random-
    * hyperplane-LSH layout), verified by the exact rounded cosine.
    * O(Σ bucket²) candidate work instead of O(N²); recall < 1 by
    * construction. Seeded planes are inlined into the generated oracle,
    * so the bucketed result itself is exact-checked. */
  def qDedupCosineLsh(spark: SparkSession, sfDir: String): DataFrame =
    bandedCosinePairs(spark, sfDir, tables = 3, bits = 4)

  /** Shared banded-candidate chain of [[qDedupCosine]] (4×3) and
    * [[qDedupCosineLsh]] (3×4): split `tables × bits` of the 12 seeded
    * hyperplanes into per-table sign keys, candidates = pairs agreeing
    * on ANY table's key (multi-table OR), verify with the exact rounded
    * cosine. O(Σ bucket²) candidate work instead of O(N²); recall < 1
    * by construction and exact-checked by the banding-mirrored oracle
    * ([[bandedCosineOracle]] inlines the same planes and split). */
  private[graft] def bandedCosinePairs(spark: SparkSession, sfDir: String,
      tables: Int, bits: Int): DataFrame = {
    graft.expressions.FloatVectorDot.register(spark)
    bandedCandidateScores(Tables.embeddings(spark, sfDir), tables, bits)
      .filter(col("cos_sim") >= 0.4)
      .orderBy("va", "vb")
  }

  /** The scored banded candidate set itself — (va < vb, cos_sim),
    * distinct, NO similarity floor: [[bandedCosinePairs]] thresholds it
    * into the dedup pair list; [[GraphAnn.knnEdges]] ranks it into the
    * k-NN graph (a navigable graph needs every node's best links, close
    * or not). */
  private[graft] def bandedCandidateScores(e: DataFrame,
      tables: Int, bits: Int): DataFrame =
    candidateScoresOf(bandedKeys(e, tables, bits))

  /** Scored (va < vb) candidate pairs of any band-row frame (the
    * self-join on `bkey` + exact rounded cosine + cross-table dedup) —
    * the shared tail of [[bandedCandidateScores]] and the
    * occupancy-bounded [[graft.ops.GraphAnn]] build. */
  private[graft] def candidateScoresOf(vecs: DataFrame): DataFrame =
    vecs.as("a").join(vecs.as("b"),
        col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .distinct() // a pair may collide in several tables

  /** Per-(vector, table) band rows (vec_id, embedding, nrm, bkey) for
    * the banded-candidate joins. `bkey = band · 2^bits + key` — an
    * INJECTIVE fold of the (table ordinal, sign key) pair into one
    * integer, so a single-column equi-join is EXACTLY the (band, key)
    * join (no hashing, no collisions), and a standing band table can
    * cluster/bucket on the one column ([[GraphAnn]]'s admission
    * tier). */
  private[graft] def bandedKeys(e: DataFrame,
      tables: Int, bits: Int): DataFrame =
    bandedKeysStrided(e, tables, bits, stride = bits, planes = lshPlanes)

  /** [[bandedKeys]] over an explicit plane pool with a fixed per-table
    * STRIDE: table `b` owns planes `[b·stride, (b+1)·stride)` and uses
    * the first `bits` of them. Decoupling the plane assignment from
    * `bits` is what makes `bits` a FREE dial: the occupancy-bounded
    * graph build ([[graft.ops.GraphAnn]]) derives bits from corpus size
    * at build time, and the generated oracle SQL can inline the whole
    * stride's planes once and mask `j < bits` dynamically — same
    * planes, same keys, any n. */
  private[graft] def bandedKeysStrided(e: DataFrame, tables: Int, bits: Int,
      stride: Int, planes: Seq[Seq[Float]]): DataFrame = {
    require(bits <= stride, s"bits $bits exceeds per-table stride $stride")
    require(tables * stride <= planes.length,
      s"banded cosine needs $tables*$stride planes, have ${planes.length}")
    val bandKeys = (0 until tables).map { b =>
      val keyBits = (0 until bits).map { j =>
        val planeCol = array(planes(stride * b + j).map(lit): _*)
        // rounded-before-sign, same rationale as qAnnBuckets' sigBits
        when(round(dot(col("embedding"), planeCol), 6) >= 0,
          shiftleft(lit(1), j)).otherwise(0)
      }
      // same injective (band, key) → bkey fold; long-domain shift so
      // large dynamic bits (up to the pool stride) cannot overflow
      (keyBits.reduce(_ + _).cast("long") + lit(b.toLong << bits))
    }
    e.select(col("vec_id"), col("embedding"),
        sqrt(sumSq(col("embedding"))).as("nrm"),
        explode(array(bandKeys: _*)).as("bkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_ivf" -> (qAnnIvf _),
    "q_kmeans" -> (qKmeans _),
    "q_ann_pq" -> (qAnnPq _),
    "q_ann_ivfpq" -> (qAnnIvfPq _),
    "q_ann_ivfpq_idx" -> (qAnnIvfPqIdx _),
    "q_ann_ivfpq_del" -> (qAnnIvfPqDel _),
    "q_dedup_cosine_lsh" -> (qDedupCosineLsh _),
    "q_pipeline_corpus" -> (qPipelineCorpus _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_cluster_stats" -> (qClusterStats _),
    "q_pagerank" -> (qPagerank _),
    "q_train_prep" -> (qTrainPrep _),
    "q_dedup_keep" -> (qDedupKeep _),
    "q_text_tokens" -> (qTextTokens _),
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_quality_score" -> (qQualityScore _),
    "q_token_count" -> (qTokenCount _),
    "q_fingerprint" -> (qFingerprint _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_minhash_est" -> (qMinhashEst _),
    "q_simhash" -> (qSimhash _),
    "q_simhash_dedup" -> (qSimhashDedup _),
    "q_sim_topk" -> (qSimTopk _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_dedup_cosine" -> (qDedupCosine _),
    "q_ann_buckets" -> (qAnnBuckets _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_recall_pq" -> (qAnnRecallPq _),
    "q_ann_recall_curve" -> (qAnnRecallCurve _),
    "q_ann_ivf_kmeans" -> (qAnnIvfKmeans _),
  )

  /** q_ann_buckets CTE block, GENERATED from the same seeded
    * hyperplanes the query uses (inlined as SQL literals): bucket ids,
    * pair sets, and rounded cosines are bit-identical across engines.
    * `lshtop` is each vector's intra-bucket nearest — the result of
    * q_ann_buckets and the approx side of q_ann_recall. */
  private def annBucketsCtes: String = {
    val sig = lshPlanes.zipWithIndex.map { case (p, i) =>
      val lits = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"""(CASE WHEN round(list_sum(list_transform(list_zip(embedding, $lits),
         |   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) >= 0
         |   THEN ${1 << i} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""bucketed AS (
       |  SELECT vec_id, embedding, $sig AS bucket,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |bkt_pairs AS (
       |  SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS nbr,
       |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (a.nrm * b.nrm), 6) AS cos_sim
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |lshtop AS (
       |  SELECT vec_id, bucket, nbr, cos_sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, nbr) AS rn FROM bkt_pairs)
       |  WHERE rn = 1)""".stripMargin
  }

  private def annBucketsOracle: String =
    s"""WITH $annBucketsCtes
       |SELECT vec_id, bucket, nbr, cos_sim FROM lshtop
       |ORDER BY vec_id""".stripMargin

  /** q_ann_recall oracle: all three chains replayed — the
    * probe-sampled brute-force truth, the intra-bucket top-1, and the
    * 4×3 banded candidate set — then the hit fold. A probe absent from
    * `lshtop` (singleton bucket) left-joins to NULL and counts as a
    * bucket miss; a (probe, true-nearest) pair absent from the banded
    * candidates counts as a banded miss — exactly like the Spark
    * side. */
  private def annRecallOracle: String =
    s"""WITH $annBucketsCtes,
       |${bandedCandidatePairsCtes(4, 3)},
       |bandbi AS (
       |  SELECT DISTINCT a.vec_id AS bpid, b.vec_id AS cand
       |  FROM flat a JOIN flat b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id),
       |probes AS (
       |  SELECT vec_id AS pid, embedding AS pv, nrm AS pn FROM bucketed
       |  WHERE $RecallProbeWhere),
       |scored AS (
       |  SELECT p.pid, n.vec_id AS nbr,
       |    round(list_sum(list_transform(list_zip(n.embedding, p.pv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (n.nrm * p.pn), 6) AS cos_sim
       |  FROM bucketed n JOIN probes p ON n.vec_id <> p.pid),
       |truth AS (
       |  SELECT pid, nbr AS true_nbr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY pid
       |      ORDER BY cos_sim DESC, nbr) AS rn FROM scored)
       |  WHERE rn = 1),
       |lsh AS (
       |  SELECT vec_id AS pid, nbr AS lsh_nbr FROM lshtop
       |  WHERE $RecallProbeWhere)
       |SELECT CAST(count(*) AS BIGINT) AS probes,
       |  CAST(sum(CASE WHEN lsh_nbr = true_nbr THEN 1 ELSE 0 END)
       |    AS BIGINT) AS bucket_hits,
       |  round(CAST(sum(CASE WHEN lsh_nbr = true_nbr THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS bucket_recall,
       |  CAST(sum(CASE WHEN b.cand IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS banded_hits,
       |  round(CAST(sum(CASE WHEN b.cand IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS banded_recall
       |FROM truth t
       |LEFT JOIN lsh USING (pid)
       |LEFT JOIN bandbi b ON b.bpid = t.pid AND b.cand = t.true_nbr""".stripMargin

  /** q_ann_pq's encode→LUT→ADC→rerank chain as CTEs, probe predicate
    * and CTE-name prefix parameterized (the recall metric runs TWO PQ
    * chains in one statement); ends in `${p}res` = the final top-5
    * (qid, vec_id, adc_units, dot, rn). The "vec_id < 3" instantiation
    * with an empty prefix is byte-for-byte the pre-r14 q_ann_pq
    * oracle. */
  private def pqChainCtes(pw: String, p: String): String =
    s"""${p}cb AS MATERIALIZED (
       |  SELECT m, CAST(vec_id AS INTEGER) AS cid,
       |    embedding[m*8+1 : m*8+8] AS cw
       |  FROM embeddings, unnest(range(0, 8)) AS u(m) WHERE vec_id < 64),
       |${p}sub AS (
       |  SELECT vec_id, m, embedding[m*8+1 : m*8+8] AS sv
       |  FROM embeddings, unnest(range(0, 8)) AS u(m)),
       |${p}d AS (
       |  SELECT s.vec_id, s.m, c.cid,
       |    round(list_sum(list_transform(list_zip(s.sv, c.cw),
       |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 6) AS d2
       |  FROM ${p}sub s JOIN ${p}cb c ON s.m = c.m),
       |${p}codes AS MATERIALIZED (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY d2, cid) AS rn FROM ${p}d)
       |  WHERE rn = 1),
       |${p}lut AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, c.m, c.cid,
       |    CAST(round(list_sum(list_transform(
       |      list_zip(q.embedding[c.m*8+1 : c.m*8+8], c.cw),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) * 1000000, 0)
       |      AS BIGINT) AS pd
       |  FROM embeddings q CROSS JOIN ${p}cb c WHERE q.$pw),
       |${p}adc AS (
       |  SELECT l.qid, c.vec_id, CAST(sum(pd) AS BIGINT) AS adc_units
       |  FROM ${p}codes c JOIN ${p}lut l ON c.m = l.m AND c.cid = l.cid
       |  WHERE c.vec_id <> l.qid
       |  GROUP BY l.qid, c.vec_id),
       |${p}short AS (
       |  SELECT qid, vec_id, adc_units FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY adc_units DESC, vec_id) AS rn2 FROM ${p}adc)
       |  WHERE rn2 <= 50),
       |${p}rer AS (
       |  SELECT s.qid, s.vec_id, s.adc_units,
       |    round(list_sum(list_transform(list_zip(v.embedding, q.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dot
       |  FROM ${p}short s
       |  JOIN embeddings v ON v.vec_id = s.vec_id
       |  JOIN embeddings q ON q.vec_id = s.qid),
       |${p}res AS (
       |  SELECT qid, vec_id, adc_units, dot, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY dot DESC, vec_id) AS rn FROM ${p}rer)
       |  WHERE rn <= 5)""".stripMargin

  /** q_ann_ivf's shared oracle FRONT (literal centroids → per-vector
    * cell ranking → assignment) under prefix `p` — split from the
    * probe tail so the recall curve can sweep nprobe over ONE front. */
  private def ivfFrontCtes(p: String): String =
    s"""${p}cent AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
       |${p}dist AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    round(
       |      list_sum(list_transform(e.embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |      - 2 * list_sum(list_transform(list_zip(e.embedding, c.cv),
       |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      + list_sum(list_transform(c.cv,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS d2
       |  FROM embeddings e, ${p}cent c),
       |${p}ranked AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY d2, cid) AS rn FROM ${p}dist),
       |${p}assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid FROM ${p}ranked WHERE rn = 1)""".stripMargin

  /** One q_ann_ivf probe TAIL at `nprobe` under tail prefix `t`,
    * reading [[ivfFrontCtes]]'s prefix `p`; ends in `${t}scored` (the
    * scanned candidate pairs — the curve's cost relation) and
    * `${t}res` (qid, cid, vec_id, cos_sim, rn ≤ 5). */
  private def ivfTailCtes(pw: String, nprobe: Int, p: String,
      t: String): String =
    s"""${t}probes AS (
       |  SELECT vec_id AS qid, embedding AS qv, cid
       |  FROM ${p}ranked WHERE $pw AND rn <= $nprobe),
       |${t}scored AS (
       |  SELECT pr.qid, a.cid, a.vec_id,
       |    round(
       |      list_sum(list_transform(list_zip(a.embedding, pr.qv),
       |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(a.embedding,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |        * sqrt(list_sum(list_transform(pr.qv,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
       |  FROM ${p}assigned a JOIN ${t}probes pr USING (cid)
       |  WHERE a.vec_id <> pr.qid),
       |${t}res AS (
       |  SELECT qid, cid, vec_id, cos_sim, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, vec_id) AS rn FROM ${t}scored)
       |  WHERE rn <= 5)""".stripMargin

  /** The full q_ann_ivf oracle chain (front + one tail, one prefix). */
  private def ivfChainCtes(pw: String, nprobe: Int, p: String): String =
    s"""${ivfFrontCtes(p)},
       |${ivfTailCtes(pw, nprobe, p, p)}""".stripMargin

  /** q_ann_ivf_kmeans' oracle FRONT: the full integer-exact Lloyd
    * training chain ([[kmeansLloydCtes]] at [[KmIvfK]]/[[KmIvfIters]]
    * — emits the fixed names q/c0/a·/n·/s·/c·), then assignment of
    * every vector to its nearest TRAINED centroid in the same
    * micro-unit long arithmetic. Ends in `${p}kranked` (per-vector
    * cell ranking) and `${p}kassigned`. */
  private def ivfKmFrontCtes(p: String): String =
    s"""${kmeansLloydCtes(KmIvfK.toString, KmIvfIters)},
       |${p}kd AS (
       |  SELECT v.vec_id, c.cid,
       |    CAST(sum((v.qd - c.c) * (v.qd - c.c)) AS BIGINT) AS d2
       |  FROM q v JOIN c$KmIvfIters c ON v.pos = c.pos
       |  GROUP BY v.vec_id, c.cid),
       |${p}kranked AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY d2, cid) AS rn FROM ${p}kd),
       |${p}kassigned AS MATERIALIZED (
       |  SELECT r.vec_id, e.embedding, r.cid
       |  FROM ${p}kranked r JOIN embeddings e USING (vec_id)
       |  WHERE r.rn = 1)""".stripMargin

  /** One trained-IVF probe TAIL at `nprobe` under tail prefix `t` —
    * same shape as [[ivfTailCtes]], probes ranked by the trained-cell
    * integer distance; ends in `${t}scored` and `${t}res`. */
  private def ivfKmTailCtes(pw: String, nprobe: Int, p: String,
      t: String): String =
    s"""${t}probes AS (
       |  SELECT vec_id AS qid, e.embedding AS qv, r.cid
       |  FROM ${p}kranked r JOIN embeddings e USING (vec_id)
       |  WHERE $pw AND r.rn <= $nprobe),
       |${t}scored AS (
       |  SELECT pr.qid, a.cid, a.vec_id,
       |    round(
       |      list_sum(list_transform(list_zip(a.embedding, pr.qv),
       |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(a.embedding,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |        * sqrt(list_sum(list_transform(pr.qv,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
       |  FROM ${p}kassigned a JOIN ${t}probes pr USING (cid)
       |  WHERE a.vec_id <> pr.qid),
       |${t}res AS (
       |  SELECT qid, cid, vec_id, cos_sim, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, vec_id) AS rn FROM ${t}scored)
       |  WHERE rn <= 5)""".stripMargin

  /** q_ann_ivfpq's assign→residual-encode→probe→ADC→rerank chain as
    * CTEs, same parameterization; ends in `${p}res` = the final top-5
    * (qid, ccid, vec_id, dot, rn). */
  private def ivfPqChainCtes(pw: String, p: String,
      nprobe: Int = IvfNprobe, survivorAnd: String = ""): String =
    s"""${p}cent AS (
       |  SELECT CAST(vec_id AS INTEGER) AS ccid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |${p}dist AS (
       |  SELECT e.vec_id, e.embedding, c.ccid, c.cv,
       |    round(
       |      list_sum(list_transform(e.embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |      - 2 * list_sum(list_transform(list_zip(e.embedding, c.cv),
       |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      + list_sum(list_transform(c.cv,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS d2
       |  FROM embeddings e, ${p}cent c),
       |${p}ranked AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY d2, ccid) AS rn FROM ${p}dist),
       |${p}assigned AS MATERIALIZED (
       |  SELECT vec_id, ccid,
       |    list_transform(list_zip(embedding, cv),
       |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS resid
       |  FROM ${p}ranked WHERE rn = 1),
       |${p}rcb AS MATERIALIZED (
       |  SELECT m, CAST(vec_id AS INTEGER) AS rcid,
       |    resid[m*8+1 : m*8+8] AS cw
       |  FROM ${p}assigned, unnest(range(0, 8)) AS u(m) WHERE vec_id < 64),
       |${p}rsl AS (
       |  SELECT vec_id, ccid, m, resid[m*8+1 : m*8+8] AS sv
       |  FROM ${p}assigned, unnest(range(0, 8)) AS u(m)),
       |${p}rd AS (
       |  SELECT s.vec_id, s.ccid, s.m, c.rcid,
       |    round(list_sum(list_transform(list_zip(s.sv, c.cw),
       |      x -> (x[1] - x[2]) * (x[1] - x[2]))), 6) AS d2
       |  FROM ${p}rsl s JOIN ${p}rcb c ON s.m = c.m),
       |${p}rcodes AS MATERIALIZED (
       |  SELECT vec_id, ccid, m, rcid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY d2, rcid) AS rn FROM ${p}rd)
       |  WHERE rn = 1),
       |${p}probes AS (
       |  SELECT vec_id AS qid, ccid,
       |    CAST(round(list_sum(list_transform(list_zip(embedding, cv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) * 1000000, 0)
       |      AS BIGINT) AS cell_units
       |  FROM ${p}ranked WHERE $pw AND rn <= $nprobe),
       |${p}rlut AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, c.m, c.rcid,
       |    CAST(round(list_sum(list_transform(
       |      list_zip(q.embedding[c.m*8+1 : c.m*8+8], c.cw),
       |      x -> CAST(x[1] AS DOUBLE) * x[2])) * 1000000, 0) AS BIGINT) AS pd
       |  FROM embeddings q CROSS JOIN ${p}rcb c WHERE q.$pw),
       |${p}radc AS (
       |  SELECT p.qid, cd.ccid, cd.vec_id,
       |    p.cell_units + CAST(sum(l.pd) AS BIGINT) AS adc_units
       |  FROM ${p}rcodes cd
       |  JOIN ${p}probes p ON cd.ccid = p.ccid AND cd.vec_id <> p.qid$survivorAnd
       |  JOIN ${p}rlut l ON l.qid = p.qid AND l.m = cd.m AND l.rcid = cd.rcid
       |  GROUP BY p.qid, cd.ccid, cd.vec_id, p.cell_units),
       |${p}rshort AS (
       |  SELECT qid, ccid, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY adc_units DESC, vec_id) AS rn2 FROM ${p}radc)
       |  WHERE rn2 <= 50),
       |${p}rrer AS (
       |  SELECT s.qid, s.ccid, s.vec_id,
       |    round(list_sum(list_transform(list_zip(v.embedding, q.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dot
       |  FROM ${p}rshort s
       |  JOIN embeddings v ON v.vec_id = s.vec_id
       |  JOIN embeddings q ON q.vec_id = s.qid),
       |${p}res AS (
       |  SELECT qid, ccid, vec_id, dot, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY dot DESC, vec_id) AS rn FROM ${p}rrer)
       |  WHERE rn <= 5)""".stripMargin

  private lazy val ivfPqSql: String =
    s"""WITH ${ivfPqChainCtes("vec_id < 3", "")}
       |SELECT qid, ccid, vec_id, dot, rn FROM res
       |ORDER BY qid, rn""".stripMargin

  /** q_ann_ivfpq_del oracle: the identical chain with the deleted
    * slice excluded from the CANDIDATE codes only — the trained
    * artifacts (centroid/codebook CTEs) and the probes still derive
    * from the full corpus, mirroring the serve side's
    * takedown-vs-retrain split. */
  private lazy val ivfPqDelSql: String =
    ivfPqSurvivorSql(pqDelSurvivorSql("cd.vec_id"))

  /** The survivor-chain IVFADC SQL for ANY candidate-exclusion
    * fragment — shared by the q_ann_ivfpq_del oracle and the
    * cross-tier retraction capstone (q_retract_e2e). */
  private[graft] def ivfPqSurvivorSql(survivorAnd: String): String =
    s"""WITH ${ivfPqChainCtes("vec_id < 3", "", survivorAnd = survivorAnd)}
       |SELECT qid, ccid, vec_id, dot, rn FROM res
       |ORDER BY qid, rn""".stripMargin

  /** q_ann_recall_pq oracle: both PQ chains over the probe sample
    * (prefixes keep the two chains' CTEs apart), the brute-force truth
    * BY RAW DOT (the ranking these tiers serve), and the hit fold. */
  private def annRecallPqOracle: String = {
    val pw = RecallProbeWhere
    s"""WITH ${pqChainCtes(pw, "p")},
       |${ivfPqChainCtes(pw, "v")},
       |tprobes AS (
       |  SELECT vec_id AS pid, embedding AS pv FROM embeddings
       |  WHERE $pw),
       |tscored AS (
       |  SELECT p.pid, n.vec_id AS nbr,
       |    round(list_sum(list_transform(list_zip(n.embedding, p.pv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dotv
       |  FROM embeddings n JOIN tprobes p ON n.vec_id <> p.pid),
       |truth AS (
       |  SELECT pid, nbr AS true_nbr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY pid
       |      ORDER BY dotv DESC, nbr) AS rn FROM tscored)
       |  WHERE rn <= 5)
       |SELECT CAST(count(*) AS BIGINT) AS truth_pairs,
       |  CAST(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS pq_hits,
       |  round(CAST(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS pq_recall,
       |  CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS ivfpq_hits,
       |  round(CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS ivfpq_recall
       |FROM truth t
       |LEFT JOIN pres g ON g.qid = t.pid AND g.vec_id = t.true_nbr
       |LEFT JOIN vres i ON i.qid = t.pid AND i.vec_id = t.true_nbr""".stripMargin
  }

  /** q_ann_recall_curve oracle: ONE shared IVF front swept by three
    * probe tails (nprobe ∈ [[IvfNprobeSweep]]), three full IVFADC
    * chains at the same dials, cosine truth for the IVF rows and raw-
    * dot truth for the IVFADC rows (each tier judged on the metric it
    * serves), the per-dial hit folds, and the scanned-candidate cost
    * counts — the whole curve, recall AND cost, is hash-gated. */
  private def annRecallCurveOracle: String = {
    val pw = RecallProbeWhere
    val ivfTails = IvfNprobeSweep
      .map(np => ivfTailCtes(pw, np, "i", s"i$np")).mkString(",\n")
    val pqChains = IvfNprobeSweep
      .map(np => ivfPqChainCtes(pw, s"v$np", np)).mkString(",\n")
    val kmTails = KmIvfNprobeSweep
      .map(np => ivfKmTailCtes(pw, np, "k", s"k$np")).mkString(",\n")
    val candCtes = (IvfNprobeSweep.map(np =>
      s"""ic$np AS (
         |  SELECT CAST(count(*) AS BIGINT) AS cand_pairs
         |  FROM i${np}scored)""".stripMargin) ++
      KmIvfNprobeSweep.map(np =>
        s"""kc$np AS (
           |  SELECT CAST(count(*) AS BIGINT) AS cand_pairs
           |  FROM k${np}scored)""".stripMargin)).mkString(",\n")
    def foldCte(name: String, resCte: String, truthCte: String): String =
      s"""$name AS (
         |  SELECT CAST(count(*) AS BIGINT) AS truth_pairs,
         |    CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS hits,
         |    round(CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 6) AS recall
         |  FROM $truthCte t
         |  LEFT JOIN $resCte r ON r.qid = t.pid AND r.vec_id = t.true_nbr)""".stripMargin
    val folds = (IvfNprobeSweep.flatMap(np => Seq(
      foldCte(s"rivf$np", s"i${np}res", "truthc"),
      foldCte(s"rpq$np", s"v${np}res", "truthd"))) ++
      KmIvfNprobeSweep.map(np =>
        foldCte(s"rkm$np", s"k${np}res", "truthc"))).mkString(",\n")
    val selects = (IvfNprobeSweep.flatMap(np => Seq(
      s"""SELECT 'ivf' AS tier, $np AS nprobe, truth_pairs, hits, recall,
         |  (SELECT cand_pairs FROM ic$np) AS cand_pairs FROM rivf$np""".stripMargin,
      s"""SELECT 'ivfpq' AS tier, $np AS nprobe, truth_pairs, hits, recall,
         |  (SELECT cand_pairs FROM ic$np) AS cand_pairs FROM rpq$np""".stripMargin)) ++
      KmIvfNprobeSweep.map(np =>
        s"""SELECT 'ivf_km' AS tier, $np AS nprobe, truth_pairs, hits, recall,
           |  (SELECT cand_pairs FROM kc$np) AS cand_pairs FROM rkm$np""".stripMargin))
      .mkString("\nUNION ALL\n")
    s"""WITH ${ivfFrontCtes("i")},
       |$ivfTails,
       |${ivfKmFrontCtes("k")},
       |$kmTails,
       |$candCtes,
       |$pqChains,
       |tprobes AS MATERIALIZED (
       |  SELECT vec_id AS pid, embedding AS pv FROM embeddings WHERE $pw),
       |tscoredc AS (
       |  SELECT p.pid, n.vec_id AS nbr,
       |    round(list_sum(list_transform(list_zip(n.embedding, p.pv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(n.embedding,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |        * sqrt(list_sum(list_transform(p.pv,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
       |  FROM embeddings n JOIN tprobes p ON n.vec_id <> p.pid),
       |truthc AS MATERIALIZED (
       |  SELECT pid, nbr AS true_nbr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY pid
       |      ORDER BY cos_sim DESC, nbr) AS rn FROM tscoredc)
       |  WHERE rn <= 5),
       |tscoredd AS (
       |  SELECT p.pid, n.vec_id AS nbr,
       |    round(list_sum(list_transform(list_zip(n.embedding, p.pv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dotv
       |  FROM embeddings n JOIN tprobes p ON n.vec_id <> p.pid),
       |truthd AS MATERIALIZED (
       |  SELECT pid, nbr AS true_nbr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY pid
       |      ORDER BY dotv DESC, nbr) AS rn FROM tscoredd)
       |  WHERE rn <= 5),
       |$folds
       |SELECT tier, nprobe, truth_pairs, hits, recall, cand_pairs FROM (
       |$selects
       |) ORDER BY tier, nprobe""".stripMargin
  }

  /** DuckDB spelling of [[md5Long]]. */
  private[ops] def h15(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Shared CTE chain of the MinHash pipeline (per-doc shingle sets →
    * base md5 hash → 16 affine minhashes → 4 band keys → candidate
    * pairs → exact Jaccard as `jpairs`); generated so the seeded (a, b)
    * pairs and band concatenations stay in lockstep with the query.
    * Used by the q_minhash_lsh oracle AND as the edge set of the
    * cluster/keep oracles — the oracle chain mirrors the production
    * chain end to end. */
  private def minhashPairsCtes: String = {
    val sigList = minhashAffine.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $MersennePrime))"
    }.mkString("[\n    ", ",\n    ", "]")
    val bandStructs = (0 until 4).map { b =>
      val cat = (4 * b until 4 * b + 4).map(j => s"m[${j + 1}]::VARCHAR")
        .mkString(" || ',' || ")
      s"{'band': $b, 'bkey': ${h15(cat)}}"
    }.mkString("[\n    ", ",\n    ", "]")
    s"""t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
       |ds AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(t) >= 5 THEN
       |      [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
       |    ELSE [array_to_string(t, ' ')] END) AS shs FROM t),
       |hsed AS (SELECT doc_id, len(shs) AS n, shs,
       |  list_transform(shs, x -> ${h15("x")} & 2147483647) AS hs FROM ds),
       |sig AS (SELECT doc_id, n, shs, $sigList AS m FROM hsed),
       |bands AS (SELECT doc_id, u.band AS band, u.bkey AS bkey
       |  FROM sig, unnest($bandStructs) AS t2(u)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sh AS (SELECT doc_id, n, unnest(shs) AS sh FROM sig),
       |inter AS (
       |  SELECT da, db, a.n AS na, b.n AS nb, count(*) AS inter
       |  FROM cand
       |  JOIN sh a ON a.doc_id = da
       |  JOIN sh b ON b.doc_id = db AND a.sh = b.sh
       |  GROUP BY da, db, a.n, b.n),
       |jpairs AS (
       |  SELECT da, db, round(inter / (na + nb - inter), 6) AS jacc FROM inter)""".stripMargin
  }

  /** q_minhash_lsh oracle — the shared chain, thresholded. */
  private def minhashOracle: String =
    s"""WITH $minhashPairsCtes
       |SELECT da, db, jacc FROM jpairs
       |WHERE jacc >= 0.2 ORDER BY da, db""".stripMargin

  /** q_minhash_est oracle — the shared chain, unthresholded, with the
    * component-agreement count of the two signatures alongside. */
  private def minhashEstOracle: String =
    s"""WITH $minhashPairsCtes
       |SELECT j.da AS da, j.db AS db,
       |  CAST(len(list_filter(range(1, 17), i -> a.m[i] = b.m[i])) AS BIGINT)
       |    AS est16,
       |  j.jacc AS jacc
       |FROM jpairs j
       |JOIN sig a ON a.doc_id = j.da
       |JOIN sig b ON b.doc_id = j.db
       |ORDER BY da, db""".stripMargin

  /** q_simhash_dedup oracle — signatures as in [[simhashOracle]], then
    * the same 4×15-bit banding, popcount-hamming verify, and per-doc
    * argmin. */
  private def simhashDedupOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS token
       |  FROM documents),
       |h AS (SELECT doc_id, ${h15("token")} AS h FROM tok),
       |votes AS (
       |  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM h, unnest(range(0, 60)) AS t(i)
       |  GROUP BY doc_id, i),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bkey
       |  FROM sig, unnest(range(0, 4)) AS u(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, a.simhash AS sa,
       |    b.doc_id AS db, b.simhash AS sb
       |  FROM bands a JOIN bands b
       |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id <> b.doc_id),
       |ham AS (
       |  SELECT da, db, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |  FROM cand WHERE bit_count(xor(sa, sb)) <= 3)
       |SELECT da AS doc_id, db AS nbr, hamming FROM (
       |  SELECT da, db, hamming, row_number() OVER (PARTITION BY da
       |    ORDER BY hamming, db) AS rn FROM ham)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** q_simhash oracle — double unnest (distinct tokens × 60 bit
    * positions) reproduces the per-row vote fold exactly. */
  private def simhashOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS token
       |  FROM documents),
       |h AS (SELECT doc_id, ${h15("token")} AS h FROM tok),
       |votes AS (
       |  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM h, unnest(range(0, 60)) AS t(i)
       |  GROUP BY doc_id, i)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB oracles — ALL queries exact-matched: the hash-based dedup
    * signatures use [[md5Long]] (reproducible in SQL), the LSH
    * hyperplanes and multimodal decode constants are inlined into
    * generated SQL. */
  /** Banded-cosine oracle generator — the same `tables × bits` split of
    * the seeded planes as [[bandedCosinePairs]], pairs deduped across
    * tables, filtered at the cosine threshold. q_dedup_cosine_lsh =
    * (3,4); q_dedup_cosine = (4,3). */
  /** `vecs`/`flat`/`pairs` CTE block mirroring [[bandedCandidateScores]]
    * (planes inlined) — shared by [[bandedCosineOracle]] and the
    * GraphAnn oracles. */
  /** The `unnest([{'band': b, 'key': …}, …])` SQL literal inlining the
    * seeded planes for a (tables × bits) banding — the ONE place the
    * rounded-before-sign bit rule and the `bits·b + j` plane layout
    * are spelled in SQL, shared by every banded oracle (the dedup
    * pair CTEs here and [[Retrieval]]'s filtered-ANN oracle) so a
    * scheme change cannot de-synchronize one of them silently. */
  private[ops] def bandStructsSql(tables: Int, bits: Int): String = {
    def keyExpr(b: Int): String = (0 until bits).map { j =>
      val lits = lshPlanes(bits * b + j).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"""(CASE WHEN round(list_sum(list_transform(list_zip(embedding, $lits),
         |   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) >= 0
         |   THEN ${1 << j} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    (0 until tables).map(b => s"{'band': $b, 'key': ${keyExpr(b)}}")
      .mkString("[\n    ", ",\n    ", "]")
  }

  private[ops] def bandedCandidatePairsCtes(tables: Int, bits: Int): String = {
    val bandStructs = bandStructsSql(tables, bits)
    s"""vecs AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    unnest($bandStructs) AS bk
       |  FROM embeddings),
       |flat AS (SELECT vec_id, embedding, nrm, bk.band AS band, bk.key AS key
       |  FROM vecs),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb,
       |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (a.nrm * b.nrm), 6) AS cos_sim
       |  FROM flat a JOIN flat b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)""".stripMargin
  }

  /** Occupancy-bounded twin of [[bandedCandidatePairsCtes]]: the SQL
    * itself derives `bits` from `count(*)` with the same clamp the
    * Spark build uses (`bits = clamp(⌈log₂(n/occ)⌉, min, max)`), then
    * masks each inlined plane's bit with `j < bits` — so the ORACLE
    * replays the occupancy rule, not a frozen bits choice, and stays
    * exact at any corpus size up to the inlined pool. Plane layout
    * matches [[bandedKeysStrided]]: table `b` owns planes
    * `[b·maxBits, (b+1)·maxBits)` of the seed-42 stream. The (band,
    * key) join here is the same join as the Spark side's injective
    * `bkey` fold. */
  /** Just the dynamic-bits per-vector band-key CTEs (`bparams`/`vecs`/
    * `flat`) — the probe-vs-corpus consumers (q_stream_ann) join `flat`
    * against itself with their own predicate instead of the all-pairs
    * `pairs` cut. */
  private[ops] def bandedFlatDynCtes(tables: Int, maxBits: Int,
      minBits: Int, targetOcc: Int): String = {
    val planes = lshPlanesExt(tables * maxBits)
    def keyExpr(b: Int): String = (0 until maxBits).map { j =>
      val lits = planes(maxBits * b + j).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"""(CASE WHEN $j < bits AND
         |   round(list_sum(list_transform(list_zip(embedding, $lits),
         |   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) >= 0
         |   THEN ${1 << j} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    val bandStructs = (0 until tables).map(b => s"{'band': $b, 'key': ${keyExpr(b)}}")
      .mkString("[\n    ", ",\n    ", "]")
    s"""bparams AS (
       |  SELECT LEAST($maxBits, GREATEST($minBits,
       |    CAST(ceil(log2(count(*) / $targetOcc.0)) AS INT))) AS bits
       |  FROM embeddings),
       |vecs AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    unnest($bandStructs) AS bk
       |  FROM embeddings, bparams),
       |flat AS (SELECT vec_id, embedding, nrm, bk.band AS band, bk.key AS key
       |  FROM vecs)""".stripMargin
  }

  private[ops] def bandedCandidatePairsDynCtes(tables: Int, maxBits: Int,
      minBits: Int, targetOcc: Int): String =
    s"""${bandedFlatDynCtes(tables, maxBits, minBits, targetOcc)},
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb,
       |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (a.nrm * b.nrm), 6) AS cos_sim
       |  FROM flat a JOIN flat b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)""".stripMargin

  private def bandedCosineOracle(tables: Int, bits: Int): String =
    s"""WITH ${bandedCandidatePairsCtes(tables, bits)}
       |SELECT va, vb, cos_sim FROM pairs
       |WHERE cos_sim >= 0.4 ORDER BY va, vb""".stripMargin

  /** Edge set + transitive closure shared by the cluster/keep oracles:
    * the MinHash-banded, Jaccard-verified pairs (the SAME chain the
    * production query consumes — see [[dedupCandidatePairs]]),
    * components via recursive CTE, label = min doc_id reachable. */
  private def dedupClosureCtes: String =
    s"""$minhashPairsCtes,
       |edges AS (SELECT da, db FROM jpairs WHERE jacc >= 0.2),
       |bidir AS (SELECT da AS src, db AS dst FROM edges
       |  UNION ALL SELECT db, da FROM edges),
       |reach AS (SELECT src, dst FROM bidir
       |  UNION SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src)""".stripMargin

  /** q_dedup_clusters oracle. */
  private def dedupClustersOracle: String =
    s"""WITH RECURSIVE $dedupClosureCtes
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** q_dedup_keep oracle: the clusters CTE chain with the final select
    * swapped for the per-document keep decision. */
  private def dedupKeepOracle: String =
    s"""WITH RECURSIVE $dedupClosureCtes,
       |clusters AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT d.doc_id,
       |  (c.cluster_id IS NULL OR c.cluster_id = d.doc_id) AS kept,
       |  c.cluster_id
       |FROM documents d LEFT JOIN clusters c USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** q_train_prep oracle: the keep chain, the quality quartile, and the
    * split/shard hashes composed exactly as the query composes them. */
  private def trainPrepOracle: String =
    s"""WITH RECURSIVE $dedupClosureCtes,
       |clusters AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |keepers AS (
       |  SELECT d.doc_id FROM documents d LEFT JOIN clusters c USING (doc_id)
       |  WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id),
       |scored AS (
       |  SELECT doc_id, source, len(string_split(text,' ')) AS nt,
       |    round(0.5 * (len(list_distinct(string_split(text,' '))) * 1.0
       |        / len(string_split(text,' ')))
       |      + 0.5 * least(len(string_split(text,' ')) / 100.0, 1.0), 6)
       |      AS score
       |  FROM documents),
       |tiled AS (
       |  SELECT doc_id, nt,
       |    ntile(4) OVER (PARTITION BY source ORDER BY score, doc_id) AS q
       |  FROM scored),
       |surv AS (
       |  SELECT t.doc_id, t.nt FROM tiled t
       |  JOIN keepers k USING (doc_id) WHERE t.q > 1),
       |lab AS (
       |  SELECT nt,
       |    CASE WHEN h < 90 THEN 'train'
       |         WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
       |    s % 8 AS shard
       |  FROM (SELECT nt,
       |      ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |        % 100 AS h,
       |      ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |        AS s
       |    FROM surv))
       |SELECT split, shard, count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS n_toks
       |FROM lab GROUP BY split, shard ORDER BY split, shard""".stripMargin

  /** q_pagerank oracle: the shared banded-candidate chain gives the
    * thresholded edge set (materialized once — it is read from both
    * directions); three unrolled integer-exact damping rounds. */
  private def pagerankOracle: String = {
    val iters = (1 to 3).map { k =>
      val prev = s"r${k - 1}"
      s"""s$k AS (
         |  SELECT e.dst AS v, sum($prev.r // $prev.deg) AS s
         |  FROM e JOIN $prev ON e.src = $prev.v GROUP BY e.dst),
         |r$k AS (
         |  SELECT s$k.v AS v, deg.deg AS deg,
         |    CAST(150000 + (17 * s) // 20 AS BIGINT) AS r
         |  FROM s$k JOIN deg ON s$k.v = deg.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH $minhashPairsCtes,
       |jp AS MATERIALIZED (
       |  SELECT da, db FROM jpairs WHERE jacc >= 0.2),
       |e AS (
       |  SELECT da AS src, db AS dst FROM jp
       |  UNION ALL
       |  SELECT db AS src, da AS dst FROM jp),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT src AS v, deg, 1000000::BIGINT AS r FROM deg),
       |$iters
       |SELECT v AS doc_id, CAST(deg AS BIGINT) AS deg, r AS rank_micro
       |FROM r3 ORDER BY doc_id""".stripMargin
  }

  /** q_cluster_stats oracle: the closure chain plus size/edge stats per
    * component label. */
  private def clusterStatsOracle: String =
    s"""WITH RECURSIVE $dedupClosureCtes,
       |clusters AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |sizes AS (
       |  SELECT cluster_id, count(*) AS n_docs FROM clusters
       |  GROUP BY cluster_id),
       |je AS (
       |  SELECT e.da, e.jacc, c.cluster_id AS cid
       |  FROM (SELECT da, db, jacc FROM jpairs WHERE jacc >= 0.2) e
       |  JOIN clusters c ON c.doc_id = e.da),
       |estats AS (
       |  SELECT cid, count(*) AS n_edges, min(jacc) AS min_jacc,
       |    max(jacc) AS max_jacc
       |  FROM je GROUP BY cid)
       |SELECT cluster_id, n_docs, n_edges,
       |  round(n_edges / (n_docs * (n_docs - 1) / 2), 6) AS density,
       |  min_jacc, max_jacc
       |FROM sizes JOIN estats ON cluster_id = cid
       |ORDER BY cluster_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_clusters" -> dedupClustersOracle,
    "q_dedup_keep" -> dedupKeepOracle,
    "q_cluster_stats" -> clusterStatsOracle,
    "q_pagerank" -> pagerankOracle,
    "q_train_prep" -> trainPrepOracle,
    "q_ann_buckets" -> annBucketsOracle,
    "q_ann_recall" -> annRecallOracle,
    "q_ann_recall_pq" -> annRecallPqOracle,
    "q_dedup_cosine_lsh" -> bandedCosineOracle(3, 4),
    "q_kmeans" -> kmeansOracle,
    "q_dedup_cosine" -> bandedCosineOracle(4, 3),
    "q_minhash_lsh" -> minhashOracle,
    "q_minhash_est" -> minhashEstOracle,
    "q_simhash" -> simhashOracle,
    "q_simhash_dedup" -> simhashDedupOracle,
    "q_ann_pq" ->
      s"""WITH ${pqChainCtes("vec_id < 3", "")}
        |SELECT qid, vec_id, adc_units, dot, rn FROM res
        |ORDER BY qid, rn""".stripMargin,
    "q_ann_ivfpq" -> ivfPqSql,
    "q_ann_ivfpq_del" -> ivfPqDelSql,
    // the standing-store twin is gated by the SAME SQL — stored codes
    // are row-identical to the in-query encode (deterministic argmin)
    "q_ann_ivfpq_idx" -> ivfPqSql,
    "q_ann_ivf" ->
      s"""WITH ${ivfChainCtes("vec_id < 3", IvfNprobe, "")}
        |SELECT qid, cid, vec_id, cos_sim, rn FROM res
        |ORDER BY qid, rn""".stripMargin,
    "q_ann_recall_curve" -> annRecallCurveOracle,
    "q_ann_ivf_kmeans" ->
      s"""WITH ${ivfKmFrontCtes("")},
        |${ivfKmTailCtes("vec_id < 3", KmIvfNprobe, "", "")}
        |SELECT qid, cid, vec_id, cos_sim, rn FROM res
        |ORDER BY qid, rn""".stripMargin,
    "q_pipeline_corpus" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    len(string_split(text,' ')) AS n_toks,
        |    len(list_distinct(string_split(text,' '))) * 1.0
        |      / len(string_split(text,' ')) AS raw_uniq
        |  FROM documents),
        |clean AS (SELECT * FROM base WHERE n_toks >= 20 AND raw_uniq >= 0.3),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS bpe_budget,
        |  round(sum(n_toks) / count(*), 4) AS avg_toks
        |FROM clean JOIN keepers USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_tokens" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | round(sum(n_chars) / count(*), 4) AS avg_chars,
        | round(sum(len(string_split(text,' '))) / count(*), 4) AS avg_toks,
        | round(sum(len(list_filter(string_split(text,' '),
        |     t -> t = 'the' OR t = 'a' OR t = 'of'))) * 1.0
        |   / sum(len(string_split(text,' '))), 6) AS stop_ratio
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS token
        |  FROM documents),
        |prof AS (
        |  SELECT lang AS plang, token FROM (
        |    SELECT lang, token, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, token) AS rn
        |    FROM tok GROUP BY lang, token) WHERE rn <= 20),
        |dtok AS (SELECT DISTINCT doc_id, token FROM tok),
        |votes AS (
        |  SELECT doc_id, plang, count(*) AS votes
        |  FROM dtok JOIN prof USING (token) GROUP BY doc_id, plang),
        |pred AS (
        |  SELECT doc_id, plang FROM (
        |    SELECT doc_id, plang,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY votes DESC, plang) AS rn
        |    FROM votes) WHERE rn = 1)
        |SELECT d.lang, p.plang, count(*) AS n
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY d.lang, p.plang ORDER BY lang, plang""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id, n_toks,
        | round(raw_uniq, 6) AS uniq_ratio,
        | round(0.5 * raw_uniq + 0.5 * least(n_toks / 100.0, 1.0), 6) AS score
        |FROM (
        |  SELECT doc_id,
        |    len(string_split(text,' ')) AS n_toks,
        |    len(list_distinct(string_split(text,' '))) * 1.0
        |      / len(string_split(text,' ')) AS raw_uniq
        |  FROM documents)
        |ORDER BY doc_id LIMIT 100000""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, len(string_split(text,' ')) AS n_ws_tokens, n_chars,
        | CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
    "q_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id LIMIT 100000",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_dups, md5(text) AS h
        |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) >= 5 THEN
        |      [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
        |    ELSE [array_to_string(t, ' ')] END)) AS sh
        |  FROM t),
        |ns AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db,
        |  round(inter / (na.n + nb.n - inter), 6) AS jacc
        |FROM pairs
        |JOIN ns na ON da = na.doc_id JOIN ns nb ON db = nb.doc_id
        |WHERE 5 * inter >= na.n + nb.n - inter
        |ORDER BY da, db""".stripMargin,
    "q_sim_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    round(
        |      list_sum(list_transform(list_zip(e.embedding, q.qv),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(q.qv,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid)
        |SELECT qid, vec_id, cos_sim, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
        |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,
    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    round(
        |      list_sum(list_transform(list_zip(e.embedding, q.qv),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(q.qv,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |  FROM embeddings e, q WHERE e.label <> q.qlabel)
        |SELECT qid, vec_id, cos_sim, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,
  )
}
