package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.{Tables, TxRelation, TxTable}

/** Mergeable-sketch operators — the 100 TB shapes for membership,
  * frequency, cardinality and quantiles, each built DECLARATIVELY
  * (sketch-as-a-table) so the whole construction stays inside Catalyst
  * codegen and, critically, can be mirrored verbatim in the DuckDB
  * oracle: every op below is exact-match oracled, including the
  * sketch's false positives / estimation error.
  *
  * Why sketch-as-a-table instead of an opaque binary blob (Spark's
  * `count_min_sketch`/HLL buffers): a (key, cell, value) table IS the
  * sketch — partial aggregation gives the per-partition sketches, the
  * final hash-agg is the merge (sum for CMS, max for HLL, bit-union for
  * Bloom), the result is a few-KB relation that broadcasts to probe any
  * stream — and every intermediate is inspectable and oracle-checkable.
  * At 100 TB each sketch build is ONE map-side-combining hash agg to a
  * bounded row count (≤ d·w, ≤ m, ≤ 2^p rows), independent of corpus
  * size; probes are broadcast joins. Reference anchor: SURVEY §2 B11
  * (approx distinct) and B23 (near-dup/membership) — these extend that
  * row family with the standard sketch ladder.
  *
  * All hashes derive from [[LlmOps.md5Long]] (oracle-reproducible; a
  * production deployment swaps xxhash64, same shapes).
  */
object Sketches {

  // ------------------------------------------------------ Bloom filter

  private val BloomK = 3
  private val BloomM = 131072L // 2^17 bit positions

  /** j-th Bloom bit position of a string column. */
  private def bloomBit(c: Column, j: Int): Column =
    LlmOps.md5Long(concat(lit(s"$j|"), c)) % BloomM

  private def bloomBitSql(expr: String, j: Int): String =
    s"${LlmOps.h15(s"'$j|' || $expr")} % $BloomM"

  /** Bloom-prefiltered decontamination — the scale path under
    * q_decontam. The benchmark shingle set is reduced to a Bloom filter
    * materialized as a DISTINCT bit-position relation (≤ m = 2^17 rows,
    * a few hundred KB — vs the full benchmark shingle strings), which
    * broadcasts to every executor; corpus shingles pass through k = 3
    * broadcast semi-joins (map-side filters, NO shuffle of the corpus)
    * and only the survivors — true matches plus the Bloom's false
    * positives — reach the exact verification join against the real
    * shingle set. No false negatives (a Bloom guarantee, pinned in
    * SketchesSpec by equality with q_decontam on the shared columns);
    * `n_cand` exposes the false-positive overhead and is exact-match
    * oracled by mirroring all three hash probes in SQL.
    *
    * At 100 TB the exact set no longer broadcasts but the bit relation
    * still does; the prefilter drops the overwhelming majority of the
    * corpus before the (then shuffled) verification join. */
  def qBloomDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = LlmOps.shingles(spark, sfDir)
    val bench = sh.filter(col("doc_id") % 20 === 0)
      .select(col("sh").as("bsh")).distinct()
    val bits = bench.select(explode(array(
        (0 until BloomK).map(j => bloomBit(col("bsh"), j)): _*)).as("bit"))
      .distinct()
    var cand = sh.filter(col("doc_id") % 20 =!= 0)
    for (j <- 0 until BloomK)
      cand = cand.join(broadcast(bits), bloomBit(col("sh"), j) === col("bit"),
        "left_semi")
    // count, not countDistinct: (doc_id, sh) is distinct by construction
    // (shingles explodes a per-doc array_distinct), semi-joins never
    // duplicate, and `bsh` is a distinct set so the left join matches at
    // most once per row — two distinct-aggs here forced an Expand that
    // doubled the aggregate's input for nothing (guide §2.4)
    cand.join(broadcast(bench), col("sh") === col("bsh"), "left")
      .groupBy("doc_id", "n")
      .agg(count(col("sh")).as("n_cand"),
        count(when(col("bsh").isNotNull, col("sh"))).as("n_shared"))
      .select(col("doc_id"), col("n_cand"), col("n_shared"),
        round(col("n_shared") / col("n"), 6).as("contam_ratio"))
      .filter(col("n_shared") >= 3)
      .orderBy("doc_id")
  }

  // ------------------------------------------------- count-min sketch

  private val CmsD = 3
  private val CmsW = 1024L

  private def cmsBucket(c: Column, j: Int): Column =
    LlmOps.md5Long(concat(lit(s"$j|"), c)) % CmsW

  /** Count-min sketch frequency estimation with exact calibration. The
    * sketch is d × w = 3 × 1024 (row, cell) counters built in ONE
    * hash agg over the token stream (merge = cell-wise sum — exactly
    * Spark's partial/final aggregation, so the build is map-side
    * combining by construction); the estimate for a token is
    * min over rows of its cell counter, an upper bound on the true
    * count. Probes are the top-20 exact tokens (the calibration a
    * pipeline runs on a sample before trusting the sketch corpus-wide,
    * same methodology as q_minhash_est); `overest` is the collision
    * inflation. The CMS estimate is deterministic under any
    * partitioning (counter addition commutes), so the oracle mirrors
    * the full sketch cell-for-cell. At 100 TB: sketch stays 3072 rows
    * regardless of corpus size, probes are a broadcast join. */
  def qCmsFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = tok.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val probes = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    val sketch = tok.select(explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"), cmsBucket(col("tok"), j).as("bucket"))): _*))
        .as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probeCells = probes.select(col("tok"), col("exact_cnt"),
        explode(array((0 until CmsD).map(j =>
          struct(lit(j).as("j"), cmsBucket(col("tok"), j).as("bucket"))): _*))
          .as("jb"))
      .select(col("tok"), col("exact_cnt"),
        col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    probeCells.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overest"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  // ------------------------------- standing (incremental) CMS tier

  /** THE retracted ingest day for both sketch-retraction tiers
    * ([[qIncrCmsDel]]'s negated cells, [[qIncrHllDel]]'s segment drop).
    * One definition feeds the DataFrame filters AND the interpolated
    * oracle SQL (review r16: independently hardcoded `1`s on the two
    * sides would let the gate go vacuous or falsely fail if either
    * drifted). Days are doc_id % 3 ∈ {0, 1, 2}. */
  private[graft] val RetractedDay = 1L

  /** Session memo + root for [[buildIncrCms]] ([[buildIncrHll]]
    * discipline). */
  private val builtCms =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())
  private def cmsRoot(sfDir: String, kind: String = ""): String =
    "/tmp/graft_txsketch_cms" + kind + "_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current.pid

  /** One batch's CMS cell relation (j, bucket, cnt) — ≤ d·w rows. */
  private[graft] def cmsCells(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .select(explode(array((0 until CmsD).map(j =>
        struct(lit(j).cast("long").as("j"),
          cmsBucket(col("tok"), j).as("bucket"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Standing CMS cell store: per-ingest-day cell appends (exactly-once
    * txn per day), read = cell-wise SUM — counter addition is the CMS
    * merge, so the served sketch equals the from-scratch corpus sketch
    * cell for cell. */
  private[graft] def buildIncrCms(spark: SparkSession, sfDir: String,
      kind: String = ""): String = {
    val root = cmsRoot(sfDir, kind)
    val key = s"$kind:${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")
    if (!builtCms.contains(key)) builtCms.synchronized {
      if (!builtCms.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txsketch_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        TxTable.createEmpty(root, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("j",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType))), "bucket")
        val docs = Tables.documents(spark, sfDir)
        (0L to 2L).foreach { b =>
          TxTable.appendBatch(spark, root, "incr_cms", b,
            cmsCells(docs.filter(col("doc_id") % 3 === b)), nFiles = 1)
        }
        builtCms.add(key)
      }
    }
    root
  }

  /** Top-20 probe calibration of a token frame against a (j, bucket,
    * cnt) cell sketch — the reporting tail shared by both standing-CMS
    * entries ([[qIncrCms]], [[qIncrCmsDel]]). */
  private[graft] def cmsProbeReport(tok: DataFrame, sketch: DataFrame): DataFrame = {
    val probes = tok.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    val probeCells = probes.select(col("tok"), col("exact_cnt"),
        explode(array((0 until CmsD).map(j =>
          struct(lit(j).cast("long").as("j"),
            cmsBucket(col("tok"), j).as("bucket"))): _*)).as("jb"))
      .select(col("tok"), col("exact_cnt"),
        col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    probeCells.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** INCREMENTALLY-MAINTAINED frequency sketch — the CMS member of the
    * standing-sketch family ([[qIncrHll]] = min-merge cardinality,
    * [[qIncrQsketch]] = re-filter quantiles, this = SUM-merge counters;
    * a Bloom bit store is the same append-log shape with distinct-on-
    * read and is subsumed by these three). Maintenance work is ∝ batch
    * (one hash agg to ≤ d·w cells + a bounded append); the read sums
    * ≤ days·d·w cells. Probes here are the top-20 corpus-exact tokens —
    * the same CALIBRATION reporting device as [[qCmsFreq]] (production
    * probes arbitrary keys against the broadcast merged cells; the
    * exact side exists only to exhibit the overestimate). Oracle: the
    * from-scratch whole-corpus sketch — counter addition commutes, so
    * the standing store must reproduce it exactly. */
  def qIncrCms(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildIncrCms(spark, sfDir)
    val sketch = TxRelation.read(spark, root)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    cmsProbeReport(Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok")), sketch)
  }

  /** RETRACTION in the standing CMS — the sketch-family counterpart of
    * the index-tier tombstones, exploiting that SUM-merge (alone in the
    * family) is INVERTIBLE: a retracted ingest day lands as ONE
    * exactly-once append of its cell relation NEGATED, and the
    * cell-wise sum thereafter equals the from-scratch sketch of the
    * surviving corpus — exactly, not approximately, which the oracle
    * (the full chain over the survivors) verifies. Nothing is rewritten
    * (the log stays append-only; folding it away is the usual
    * maintenance); work is ∝ the retracted day. HLL/KLL registers are
    * NOT invertible — their retraction story is the per-day log itself:
    * drop a day's segments and the read serves the remaining days'
    * sketch, the retention-window pattern. Probes are the survivors'
    * top-20 exact tokens (calibration reporting, as [[qIncrCms]]). */
  def qIncrCmsDel(spark: SparkSession, sfDir: String): DataFrame = {
    // own store root — retraction must never mutate q_incr_cms's log
    val root = buildIncrCms(spark, sfDir, kind = "d")
    val docs = Tables.documents(spark, sfDir)
    // retract the RetractedDay: its negated cells, exactly-once
    TxTable.appendBatch(spark, root, "incr_cms_del", 1L,
      cmsCells(docs.filter(col("doc_id") % 3 === RetractedDay))
        .select(col("j"), col("bucket"), (-col("cnt")).as("cnt")),
      nFiles = 1)
    val sketch = TxRelation.read(spark, root)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    cmsProbeReport(docs.filter(col("doc_id") % 3 =!= RetractedDay)
      .select(explode(split(col("text"), " ")).as("tok")), sketch)
  }

  // ------------------------------------------------------ HyperLogLog

  private val HllP = 8
  private val HllM = 1L << HllP // 256 registers
  private val HllW = 60 - HllP // md5Long is 60-bit; w keeps the rest
  private val HllScale = 1L << (HllW + 1) // integer weight of an empty register

  /** αm² · 2^(w+1) — the whole numerator as ONE Scala-computed double
    * whose exact decimal repr is embedded in both the query and the
    * oracle, so the engines never re-derive it with their own
    * literal/decimal semantics (DuckDB parses bare `0.7213` as DECIMAL,
    * not DOUBLE). */
  private val HllNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * (HllM.toDouble * HllM.toDouble) *
      HllScale.toDouble

  /** Declarative HyperLogLog per-source distinct-SHINGLE estimate with
    * exact calibration. Register index = hash % m; the remaining 52
    * hash bits w map to the INTEGER register weight 2^(w+1−rank) (rank
    * = leading-zero count + 1, so weight = 2^(i+1) where 2^i ≤ w) via a
    * generated 52-branch integer-threshold CASE — no float log, no
    * platform-specific bit builtins; registers = groupBy(source, idx)
    * .min(weight) — min/max-merge IS Spark's partial aggregation, the
    * textbook mergeable sketch. The harmonic denominator Σ2^(−Mⱼ) is
    * assembled scaled by 2^(w+1) in EXACT long arithmetic (≤ m·2^53 =
    * 2⁶¹, no overflow; empty registers contribute 2^(w+1) each), so the
    * only floating-point ops are one long→double cast and one division
    * — bit-identical across engines, rounded at 4 dp.
    *
    * Shingles, not tokens: the synthetic vocabulary is ~31 words per
    * source, and raw HLL without the small-range (linear-counting)
    * correction is wildly biased when n ≪ m — measured +2300% on
    * per-source tokens at p=10. The correction needs ln, whose last-ulp
    * behavior is libm-specific (breaks the float-parity rule), so
    * instead the op targets 5-gram shingle cardinality (n/m ≈ 5, the
    * raw estimator's valid regime; measured mean error −0.9%/+0.1% at
    * sf0.001/sf0.01, max |err| ≈ 2.5σ of the 1.04/√256 = 6.5% std
    * err). `err_pct` reports the realized error against the exact
    * count. At 100 TB: 20 sources × ≤256 register rows total from one
    * hash agg, merge-friendly across shards — the distinct-count shape
    * when countDistinct's shuffle is the bottleneck (and the mergeable
    * twin of q_approx_distinct's opaque HLL++ buffer). */
  def qHllEst(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = hllShingles(Tables.documents(spark, sfDir))
    val est = hllEstimate(hllRegisters(sh))
    val exact = sh.groupBy("source")
      .agg(countDistinct(col("sh")).as("n_exact"))
    exact.join(est, Seq("source"))
      .select(col("source"), col("n_exact"), round(col("hll_raw"), 4).as("hll_est"),
        round((col("hll_raw") - col("n_exact")) / col("n_exact") * 100.0, 4)
          .as("err_pct"))
      .orderBy("source")
  }

  /** (source, sh) per-source distinct 5-gram shingles — the same
    * construction as LlmOps.docShingles, inlined with `source` so the
    * plan stays scan→explode→agg (no doc_id join). */
  private[graft] def hllShingles(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val shsExpr = array_distinct(
      when(size(t) >= 5,
        transform(sequence(lit(1), size(t) - 4),
          i => concat_ws(" ", slice(t, i, lit(5)))))
        .otherwise(array(concat_ws(" ", t))))
    docs.select(col("source"), explode(shsExpr).as("sh"))
  }

  /** (source, idx, weight) register rows for a (source, sh) frame —
    * ONE map-side-combining hash agg to ≤ sources·m rows. */
  private[graft] def hllRegisters(sh: DataFrame): DataFrame = {
    val h = LlmOps.md5Long(col("sh"))
    // w >= 2^i  ⇒  rank = HllW - i  ⇒  weight = 2^(HllW+1-rank) = 2^(i+1)
    val weight = (HllW - 1 to 0 by -1).foldLeft(null: Column) { (acc, i) =>
      val clause = (col("w") >= lit(1L << i), lit(1L << (i + 1)))
      if (acc == null) when(clause._1, clause._2) else acc.when(clause._1, clause._2)
    }.otherwise(lit(1L))
    sh.select(col("source"), (h % HllM).as("idx"),
        shiftrightunsigned(h, HllP).as("w"))
      .select(col("source"), col("idx"), weight.as("weight"))
      .groupBy("source", "idx").agg(min(col("weight")).as("weight"))
  }

  /** (source, hll_raw) harmonic estimate over min-merged registers. */
  private[graft] def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy("source")
      .agg((sum(col("weight")) +
        (lit(HllM) - count(lit(1))) * lit(HllScale)).as("denom"))
      .select(col("source"),
        (lit(HllNum) / col("denom").cast("double")).as("hll_raw"))

  /** The same 52-branch weight CASE, spelled for DuckDB. */
  private def hllWeightSql: String = {
    val branches = (HllW - 1 to 0 by -1).map(i =>
      s"WHEN w >= ${1L << i} THEN ${1L << (i + 1)}").mkString(" ")
    s"CASE $branches ELSE 1 END"
  }

  // --------------------------------------- standing (incremental) tier

  /** Session memo for [[buildIncrHll]], keyed on (session, sfDir,
    * content stamp) so a regenerated corpus rebuilds instead of serving
    * stale registers — the same freshness discipline as the other
    * standing-store memos (Incremental.builtIdx, GraphAnn). */
  private val builtHll =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Per-process store root — pid-scoped for shared-/tmp hygiene (two
    * JVMs would clobber each other's first builds); production persists
    * the table and never builds it inside the query. */
  private def hllRoot(sfDir: String): String =
    "/tmp/graft_txsketch_hll_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current.pid

  /** Build the STANDING HLL register store: an append-only tx-table LOG
    * of per-batch register relations. The corpus arrives as three
    * simulated ingest days (doc_id % 3); each day appends ONLY its own
    * batch's ≤ sources·m register rows via the exactly-once
    * [[graft.io.TxTable.appendBatch]] txn action (a replayed day is a
    * no-op, same contract as the dedup index admission). Nothing
    * corpus-sized is ever rewritten: per-day work is one hash agg over
    * the day's documents plus a ≤ sources·m-row append. */
  private[graft] def buildIncrHll(spark: SparkSession, sfDir: String)
      : String = {
    val root = hllRoot(sfDir)
    val key = s"${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")
    if (!builtHll.contains(key)) builtHll.synchronized {
      if (!builtHll.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txsketch_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        TxTable.createEmpty(root, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("idx",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("weight",
            org.apache.spark.sql.types.LongType))), "idx")
        val docs = Tables.documents(spark, sfDir)
        (0L to 2L).foreach { b =>
          TxTable.appendBatch(spark, root, "incr_hll", b,
            hllRegisters(hllShingles(docs.filter(col("doc_id") % 3 === b))),
            nFiles = 1)
        }
        builtHll.add(key)
      }
    }
    root
  }

  /** Day-attributed variant of the register store for the RETENTION
    * tier ([[qIncrHllDel]]): same build discipline, but each appended
    * register row carries its ingest day, which is what makes a
    * non-invertible sketch retractable at day granularity. Own root —
    * the plain entry's store stays day-free. */
  private[graft] def buildIncrHllDel(spark: SparkSession, sfDir: String)
      : String = {
    val root = "/tmp/graft_txsketch_hlld_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current.pid
    val key = s"d:${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")
    if (!builtHll.contains(key)) builtHll.synchronized {
      if (!builtHll.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txsketch_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        TxTable.createEmpty(root, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("day",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("idx",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("weight",
            org.apache.spark.sql.types.LongType))), "idx")
        val docs = Tables.documents(spark, sfDir)
        (0L to 2L).foreach { b =>
          TxTable.appendBatch(spark, root, "incr_hll_del", b,
            hllRegisters(hllShingles(docs.filter(col("doc_id") % 3 === b)))
              .select(lit(b).as("day"), col("source"), col("idx"),
                col("weight")), nFiles = 1)
        }
        builtHll.add(key)
      }
    }
    root
  }

  /** RETRACTION for the NON-invertible sketches — the retention-window
    * pattern the CMS tier's negated-cell trick ([[qIncrCmsDel]]) can't
    * give HLL or the KLL-class store: min-merge has no inverse, so a
    * dropped ingest day is retracted by DROPPING ITS LOG SEGMENTS.
    * The store carries day attribution; the read windows to surviving
    * days and min-merges those registers only, and the result is the
    * from-scratch sketch of the surviving corpus EXACTLY (each day's
    * registers are a pure function of that day's documents — dropping
    * a segment is dropping its documents), which the oracle verifies.
    * The physical form of the drop is the usual log fold restricted to
    * survivors (overwrite with the windowed min-merge — IncrSketchSpec
    * pins estimate invariance); at 100 TB with calendar-partitioned
    * segment files it is a metadata-only file drop. */
  def qIncrHllDel(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildIncrHllDel(spark, sfDir)
    val regs = TxRelation.read(spark, root)
      .filter(col("day") =!= RetractedDay) // retention window
      .groupBy("source", "idx").agg(min(col("weight")).as("weight"))
    hllEstimate(regs)
      .select(col("source"), round(col("hll_raw"), 4).as("hll_est"))
      .orderBy("source")
  }

  /** INCREMENTALLY-MAINTAINED cardinality estimate — the standing-
    * statistics tier of [[qHllEst]]. A 100 TB pipeline re-reads its
    * per-source distinct-shingle estimate after every ingest; rescanning
    * the corpus each time (q_hll_est's shape) is linear in CORPUS, this
    * tier is linear in BATCH: the standing store holds each ingest
    * day's register relation as an appended log segment, and the read
    * is min(weight) over ≤ days·sources·m tiny rows followed by the
    * harmonic fold. Because min-merge is associative and commutative
    * (THE mergeable-sketch property), the served estimate is BIT-EQUAL
    * to the from-scratch whole-corpus sketch — the oracle recomputes
    * exactly that in DuckDB, so the gate proves the incremental
    * maintenance loses nothing. Folding the log (overwrite with the
    * min-aggregated registers, bounding the store at sources·m rows
    * regardless of day count) is maintenance, not semantics:
    * IncrSketchSpec pins fold-invariance and exactly-once day replay. */
  def qIncrHll(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildIncrHll(spark, sfDir)
    val regs = TxRelation.read(spark, root)
      .groupBy("source", "idx").agg(min(col("weight")).as("weight"))
    hllEstimate(regs)
      .select(col("source"), round(col("hll_raw"), 4).as("hll_est"))
      .orderBy("source")
  }

  // ------------------------------------------------ sampled quantiles

  private val Quantiles = Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99)

  /** Hash-sampled quantiles with exact calibration. Exact per-group
    * percentiles need a full sort (or an exact aggregate whose state is
    * the whole value multiset) — the non-scalable baseline; the scale
    * path estimates them on a deterministic 5% hash sample
    * (md5(orderkey|linenumber) % 20 = 0 — reproducible, unlike
    * Bernoulli `sample()`). Both paths use the POSITIONAL (discrete)
    * quantile — value at row ceil(q·n) of the value-sorted group — so
    * every output is an actual input datum: no interpolation
    * arithmetic, bit-exact across engines with no rounding at all.
    * SketchesSpec pins the sample estimates against the exact values;
    * the realized gap at 5% sampling is the calibration a pipeline
    * reads before trusting sampled quantiles corpus-wide. */
  def qQuantileSample(spark: SparkSession, sfDir: String): DataFrame = {
    def quantiles(df: DataFrame, suffix: String): DataFrame = {
      val w = Window.partitionBy("l_returnflag").orderBy("v")
      val wAll = Window.partitionBy("l_returnflag")
      val aggs = Quantiles.map { case (nm, q) =>
        max(when(col("rn") === ceil(col("n") * q).cast("long"), col("v")))
          .as(s"p${nm}_$suffix")
      }
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("l_returnflag")
        .agg(aggs.head, aggs.tail: _*)
    }
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"),
        (LlmOps.md5Long(concat(col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string"))) % 20).as("bucket"))
    val ex = quantiles(base, "ex")
    val sm = quantiles(base.filter(col("bucket") === 0), "sm")
    ex.join(sm, Seq("l_returnflag")).orderBy("l_returnflag")
  }

  // ------------------------------------- mergeable quantile sketch

  /** Target sample size per group (the sketch's space bound: the
    * sample is ~k/2..k rows in expectation at any corpus size). */
  private[ops] val QskK = 256L
  private val QskMaxLvl = 40

  /** 2^level(n): the sampling modulus for a group of n rows — the
    * smallest power-of-two with n ≤ k·2^level, as a generated integer
    * threshold CASE (the q_hll_est device: no float log, exact
    * cross-engine). */
  private def qskPow(n: Column): Column =
    (0 until QskMaxLvl).foldLeft(null: Column) { (acc, l) =>
      val clause = (n <= lit(QskK * (1L << l)), lit(1L << l))
      if (acc == null) when(clause._1, clause._2)
      else acc.when(clause._1, clause._2)
    }.otherwise(lit(1L << QskMaxLvl))

  /** The same CASE, spelled for DuckDB. */
  private def qskPowSql: String = {
    val branches = (0 until QskMaxLvl).map(l =>
      s"WHEN n <= ${QskK * (1L << l)} THEN ${1L << l}").mkString(" ")
    s"CASE $branches ELSE ${1L << QskMaxLvl} END"
  }

  /** MERGEABLE QUANTILE SKETCH — the bounded-size quantile structure
    * closing the sketch family (vs [[qQuantileSample]]'s fixed-rate
    * sample, whose size grows linearly with the corpus). KLL-class
    * hierarchical sampling with the randomized compaction replaced by
    * HASH-DETERMINISTIC level selection: a row survives at level L iff
    * `rowHash % 2^L = 0`, and a group of n rows publishes level(n) =
    * smallest L with n ≤ k·2^L — so the sketch is (summary: per-group
    * n) + (sample: the surviving rows, ~k of them whatever n is, each
    * representing 2^L rows).
    *
    * The decisive property hash-determinism buys over coin-flip KLL:
    * the sketch is a PURE FUNCTION of the underlying multiset, so
    * - merge = union summaries (n adds), re-filter the union of
    *   samples at the combined level — shard levels are ≤ the merged
    *   level (level is monotone in n) so every merged survivor is
    *   present in some shard sample: NO information is ever missing;
    * - merge is exactly associative AND equals the from-scratch sketch
    *   of the union, bit for bit (QuantileSketchSpec), not merely
    *   error-bound-preserving;
    * - the whole construction (build, merge, estimate) is integer
    *   arithmetic + positional ranks — exact-match oracled.
    * Estimates are positional quantiles of the sample (every output an
    * actual datum; sample std err ~1/√k on ranks). At 100 TB: build is
    * one count + one hash-filtered scan, per-shard sketches are ≤k-row
    * relations that ship to the driver or any reducer, and daily merges
    * touch only sketch rows — the cross-shard quantile shape. */
  private[graft] def qsketchBuild(rows: DataFrame): (DataFrame, DataFrame) = {
    val summary = rows.groupBy("grp").agg(count(lit(1)).as("n"))
    val sample = rows.join(broadcast(summary), "grp")
      .filter(col("h") % qskPow(col("n")) === 0)
      .select("grp", "h", "v")
    (summary, sample)
  }

  /** Merge any number of (summary, sample) sketches: add counts,
    * re-filter the sample union at the combined level. */
  private[graft] def qsketchMerge(
      parts: Seq[(DataFrame, DataFrame)]): (DataFrame, DataFrame) = {
    val summary = parts.map(_._1).reduce(_.unionByName(_))
      .groupBy("grp").agg(sum(col("n")).as("n"))
    val sample = parts.map(_._2).reduce(_.unionByName(_))
      .join(broadcast(summary), "grp")
      .filter(col("h") % qskPow(col("n")) === 0)
      .select("grp", "h", "v")
    (summary, sample)
  }

  /** Positional quantile estimates from a sketch: value at sample rank
    * ceil(q·m), deterministic (v, h) order. */
  private[graft] def qsketchEstimate(summary: DataFrame,
      sample: DataFrame): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("v", "h")
    val wAll = Window.partitionBy("grp")
    val aggs = max(col("m")).as("m") +: Quantiles.map { case (nm, q) =>
      max(when(col("rn") === ceil(col("m") * q).cast("long"), col("v")))
        .as(s"p${nm}_est")
    }
    // LEFT join from summary: a group whose sample came out empty (no
    // row with h % 2^L == 0 — possible, if unlikely at k=256) must
    // still appear, reporting n with m=0 and null estimates, not
    // silently vanish (r11 advice)
    summary.join(
      sample.withColumn("rn", row_number().over(w))
        .withColumn("m", count(lit(1)).over(wAll))
        .groupBy("grp").agg(aggs.head, aggs.tail: _*),
      Seq("grp"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
  }

  /** The oracled entry: sketch lineitem prices per return flag, report
    * the sketch geometry (n, m) and its estimates against the exact
    * positional quantiles — the calibration read before trusting the
    * sketch corpus-wide. (The 3-shard merge-associativity story is
    * spec-gated in QuantileSketchSpec: merged ≡ from-scratch, any
    * grouping.) */
  def qQuantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    // qskBase is the ONE definition of the deterministic row hash the
    // incremental tier's bit-equality contract shares (review r16)
    val base = qskBase(spark, sfDir)
    val (summary, sample) = qsketchBuild(base)
    val est = qsketchEstimate(summary, sample)
    val w = Window.partitionBy("grp").orderBy("v")
    val wAll = Window.partitionBy("grp")
    val exAggs = Quantiles.map { case (nm, q) =>
      max(when(col("rn") === ceil(col("n") * q).cast("long"), col("v")))
        .as(s"p${nm}_ex")
    }
    val exact = base.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("grp").agg(exAggs.head, exAggs.tail: _*)
    est.join(exact, Seq("grp"))
      .select(col("grp").as("l_returnflag"), col("n"), col("m"),
        col("p50_est"), col("p90_est"), col("p99_est"),
        col("p50_ex"), col("p90_ex"), col("p99_ex"))
      .orderBy("l_returnflag")
  }

  // ------------------------------- standing (incremental) qsketch tier

  /** Session memo + roots for [[buildIncrQsk]] — the [[buildIncrHll]]
    * discipline (content-stamp freshness, pid-scoped /tmp hygiene). */
  private val builtQsk =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())
  private def qskRoot(kind: String, sfDir: String): String =
    "/tmp/graft_txsketch_qsk" + kind + "_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current.pid

  /** (grp, v, h) sketch input: lineitem prices per return flag, the
    * same deterministic row hash as [[qQuantileSketch]]. */
  private def qskBase(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("grp"), col("l_extendedprice").as("v"),
      LlmOps.md5Long(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))).as("h"))

  /** Build the STANDING quantile-sketch store: a summary log (each
    * ingest day's per-group counts) and a sample log (each day's OWN
    * sketch sample, filtered at the DAY's level). Work per day is the
    * day's one-pass sketch build plus two bounded appends; nothing
    * corpus-sized is rewritten. Each day lands under the same
    * (appId, batchId) txn on both tables — a replay re-converges
    * per-table (each append is independently watermark-absorbed), the
    * same multi-table admission story as the dedup index family. */
  private[graft] def buildIncrQsk(spark: SparkSession, sfDir: String)
      : (String, String) = {
    val sroot = qskRoot("s", sfDir)
    val proot = qskRoot("p", sfDir)
    val key = s"${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/lineitem.parquet")
    if (!builtQsk.contains(key)) builtQsk.synchronized {
      if (!builtQsk.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txsketch_")
        Seq(sroot, proot).foreach { r =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
        }
        // cluster keys must be integral (manifest min/max stats ride
        // the key): gk = md5Long(grp) for the summary — the fp table's
        // `ck` idiom — and the row hash for the sample log
        TxTable.createEmpty(sroot, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("gk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("grp",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))), "gk")
        TxTable.createEmpty(proot, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("grp",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))), "h")
        val base = qskBase(spark, sfDir)
        (0L to 2L).foreach { b =>
          val (summary, sample) = qsketchBuild(base.filter(col("h") % 3 === b))
          TxTable.appendBatch(spark, sroot, "incr_qsk", b,
            summary.select(LlmOps.md5Long(col("grp")).as("gk"),
              col("grp"), col("n")), nFiles = 1)
          TxTable.appendBatch(spark, proot, "incr_qsk", b, sample, nFiles = 1)
        }
        builtQsk.add(key)
      }
    }
    (sroot, proot)
  }

  /** INCREMENTALLY-MAINTAINED quantile sketch — the standing tier of
    * [[qQuantileSketch]], completing the incremental-sketch family
    * next to [[qIncrHll]] (cardinality = min-merge registers; quantiles
    * = the hash-deterministic KLL-class sketch, whose merge is a
    * re-filter). The read merges the logs exactly as [[qsketchMerge]]
    * does: counts add, and the union of per-day samples is re-filtered
    * at the COMBINED level — sound because level is monotone in n, so
    * every combined-level survivor already survived its own day's
    * filter: no information is ever missing from the logs. Served
    * estimates are therefore BIT-EQUAL to the from-scratch sketch of
    * the whole corpus, which is what the oracle recomputes. Store
    * size: ≤ days·(groups + ~k·groups) rows regardless of corpus size;
    * folding the logs (overwrite with the merged summary/re-filtered
    * sample) bounds it by ~k·groups with no read-side change —
    * IncrSketchSpec pins fold invariance and day replay. */
  def qIncrQsketch(spark: SparkSession, sfDir: String): DataFrame = {
    val (sroot, proot) = buildIncrQsk(spark, sfDir)
    val summary = TxRelation.read(spark, sroot).select("grp", "n")
      .groupBy("grp").agg(sum(col("n")).as("n"))
    val sample = TxRelation.read(spark, proot)
      .join(broadcast(summary), "grp")
      .filter(col("h") % qskPow(col("n")) === 0)
      .select("grp", "h", "v")
    qsketchEstimate(summary, sample)
      .select(col("grp").as("l_returnflag"), col("n"), col("m"),
        col("p50_est"), col("p90_est"), col("p99_est"))
      .orderBy("l_returnflag")
  }

  /** Log-fold maintenance for the standing qsketch store: overwrite the
    * summary log with the merged per-group counts and the sample log
    * with the union re-filtered at the combined level — byte-for-byte
    * the read path's merge, materialized, so reads before and after are
    * identical (IncrSketchSpec) and the store is bounded by ~k·groups
    * rows however many days have landed. */
  private[graft] def foldIncrQsk(spark: SparkSession, sroot: String,
      proot: String): Unit = {
    val summary = TxRelation.read(spark, sroot).select("grp", "n")
      .groupBy("grp").agg(sum(col("n")).as("n"))
      .cache()
    summary.count() // pin before the overwrites change what reads see
    val refiltered = TxRelation.read(spark, proot)
      .join(broadcast(summary), "grp")
      .filter(col("h") % qskPow(col("n")) === 0)
      .select("grp", "h", "v")
      .cache()
    refiltered.count()
    TxTable.overwrite(spark, sroot,
      summary.select(LlmOps.md5Long(col("grp")).as("gk"), col("grp"),
        col("n")), nFiles = 1)
    TxTable.overwrite(spark, proot, refiltered, nFiles = 1)
    summary.unpersist()
    refiltered.unpersist()
  }

  // --------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_decontam" -> (qBloomDecontam _),
    "q_cms_freq" -> (qCmsFreq _),
    "q_hll_est" -> (qHllEst _),
    "q_incr_hll" -> (qIncrHll _),
    "q_incr_hll_del" -> (qIncrHllDel _),
    "q_incr_cms" -> (qIncrCms _),
    "q_incr_cms_del" -> (qIncrCmsDel _),
    "q_quantile_sample" -> (qQuantileSample _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "q_incr_qsketch" -> (qIncrQsketch _),
  )

  private def shinglesCte: String =
    """t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM (
      |    SELECT doc_id, list_distinct(
      |      CASE WHEN len(t) >= 5 THEN
      |        [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
      |      ELSE [array_to_string(t, ' ')] END) AS shs
      |    FROM t))""".stripMargin

  /** The from-scratch CMS calibration chain (tok -> exact top-20
    * probes -> cells -> per-probe min) over any documents restriction
    * (`tokWhere` = "" or a WHERE clause) -- shared by the standing-CMS
    * oracle (full corpus), the negated-cell retraction oracle
    * (survivor days), and the cross-tier retraction capstone
    * (q_retract_e2e, survivor docs). */
  private[graft] def cmsOracleWhere(tokWhere: String): String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
       |  $tokWhere),
       |exact AS (SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY tok),
       |probes AS (
       |  SELECT tok, exact_cnt FROM exact
       |  ORDER BY exact_cnt DESC, tok LIMIT 20),
       |cells AS (
       |  SELECT j, bucket, count(*) AS cnt FROM (
       |    SELECT 0 AS j, ${LlmOps.h15("'0|' || tok")} % $CmsW AS bucket FROM tok
       |    UNION ALL SELECT 1, ${LlmOps.h15("'1|' || tok")} % $CmsW FROM tok
       |    UNION ALL SELECT 2, ${LlmOps.h15("'2|' || tok")} % $CmsW FROM tok)
       |  GROUP BY j, bucket),
       |pc AS (
       |  SELECT tok, exact_cnt, 0 AS j, ${LlmOps.h15("'0|' || tok")} % $CmsW AS bucket FROM probes
       |  UNION ALL SELECT tok, exact_cnt, 1, ${LlmOps.h15("'1|' || tok")} % $CmsW FROM probes
       |  UNION ALL SELECT tok, exact_cnt, 2, ${LlmOps.h15("'2|' || tok")} % $CmsW FROM probes)
       |SELECT tok, exact_cnt, cms_est FROM (
       |  SELECT pc.tok, pc.exact_cnt, min(cells.cnt) AS cms_est
       |  FROM pc JOIN cells ON pc.j = cells.j AND pc.bucket = cells.bucket
       |  GROUP BY pc.tok, pc.exact_cnt)
       |ORDER BY exact_cnt DESC, tok""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bloom_decontam" ->
      s"""WITH $shinglesCte,
         |bench AS (SELECT DISTINCT sh AS bsh FROM sh WHERE doc_id % 20 = 0),
         |bits AS (SELECT DISTINCT bit FROM (
         |  SELECT ${bloomBitSql("bsh", 0)} AS bit FROM bench
         |  UNION ALL SELECT ${bloomBitSql("bsh", 1)} FROM bench
         |  UNION ALL SELECT ${bloomBitSql("bsh", 2)} FROM bench)),
         |cand AS (
         |  SELECT doc_id, n, sh FROM sh
         |  WHERE doc_id % 20 <> 0
         |    AND ${bloomBitSql("sh", 0)} IN (SELECT bit FROM bits)
         |    AND ${bloomBitSql("sh", 1)} IN (SELECT bit FROM bits)
         |    AND ${bloomBitSql("sh", 2)} IN (SELECT bit FROM bits))
         |SELECT doc_id, n_cand, n_shared,
         |  round(n_shared / n, 6) AS contam_ratio FROM (
         |  SELECT c.doc_id, c.n, count(DISTINCT c.sh) AS n_cand,
         |    count(DISTINCT CASE WHEN b.bsh IS NOT NULL THEN c.sh END) AS n_shared
         |  FROM cand c LEFT JOIN bench b ON c.sh = b.bsh
         |  GROUP BY c.doc_id, c.n)
         |WHERE n_shared >= 3 ORDER BY doc_id""".stripMargin,
    "q_cms_freq" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |exact AS (SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY tok),
         |probes AS (
         |  SELECT tok, exact_cnt FROM exact
         |  ORDER BY exact_cnt DESC, tok LIMIT 20),
         |cells AS (
         |  SELECT j, bucket, count(*) AS cnt FROM (
         |    SELECT 0 AS j, ${LlmOps.h15("'0|' || tok")} % $CmsW AS bucket FROM tok
         |    UNION ALL SELECT 1, ${LlmOps.h15("'1|' || tok")} % $CmsW FROM tok
         |    UNION ALL SELECT 2, ${LlmOps.h15("'2|' || tok")} % $CmsW FROM tok)
         |  GROUP BY j, bucket),
         |pc AS (
         |  SELECT tok, exact_cnt, 0 AS j, ${LlmOps.h15("'0|' || tok")} % $CmsW AS bucket FROM probes
         |  UNION ALL SELECT tok, exact_cnt, 1, ${LlmOps.h15("'1|' || tok")} % $CmsW FROM probes
         |  UNION ALL SELECT tok, exact_cnt, 2, ${LlmOps.h15("'2|' || tok")} % $CmsW FROM probes)
         |SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS overest FROM (
         |  SELECT pc.tok, pc.exact_cnt, min(cells.cnt) AS cms_est
         |  FROM pc JOIN cells ON pc.j = cells.j AND pc.bucket = cells.bucket
         |  GROUP BY pc.tok, pc.exact_cnt)
         |ORDER BY exact_cnt DESC, tok""".stripMargin,
    "q_hll_est" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text,' ') AS t FROM documents),
         |shs AS (
         |  SELECT source, unnest(list_distinct(
         |    CASE WHEN len(t) >= 5 THEN
         |      [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
         |    ELSE [array_to_string(t, ' ')] END)) AS sh
         |  FROM t),
         |hashed AS (
         |  SELECT source, h % $HllM AS idx, h // $HllM AS w FROM (
         |    SELECT source, ${LlmOps.h15("sh")} AS h FROM shs)),
         |regs AS (
         |  SELECT source, idx, min($hllWeightSql) AS weight
         |  FROM hashed GROUP BY source, idx),
         |est AS (
         |  SELECT source, CAST($HllNum AS DOUBLE) / CAST(
         |    CAST(sum(weight) AS BIGINT) + ($HllM - count(*)) * $HllScale
         |    AS DOUBLE) AS hll_raw
         |  FROM regs GROUP BY source),
         |exact AS (
         |  SELECT source, count(DISTINCT sh) AS n_exact FROM shs GROUP BY source)
         |SELECT exact.source AS source, n_exact, round(hll_raw, 4) AS hll_est,
         |  round((hll_raw - n_exact) / n_exact * 100.0, 4) AS err_pct
         |FROM exact JOIN est ON exact.source = est.source
         |ORDER BY exact.source""".stripMargin,
    // the incremental CMS must reproduce the from-scratch corpus
    // sketch cell for cell (counter addition commutes)
    "q_incr_cms" -> cmsOracleWhere(""),
    // retraction by negated cells must reproduce the from-scratch
    // sketch of the SURVIVING corpus exactly (sum-merge invertibility)
    "q_incr_cms_del" ->
      cmsOracleWhere(s"WHERE doc_id % 3 <> $RetractedDay"),
    // dropping a day's segments must serve the SURVIVOR corpus's
    // from-scratch sketch (each day's registers are a pure function of
    // that day's documents)
    "q_incr_hll_del" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text,' ') AS t FROM documents
         |  WHERE doc_id % 3 <> $RetractedDay),
         |shs AS (
         |  SELECT source, unnest(list_distinct(
         |    CASE WHEN len(t) >= 5 THEN
         |      [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
         |    ELSE [array_to_string(t, ' ')] END)) AS sh
         |  FROM t),
         |hashed AS (
         |  SELECT source, h % $HllM AS idx, h // $HllM AS w FROM (
         |    SELECT source, ${LlmOps.h15("sh")} AS h FROM shs)),
         |regs AS (
         |  SELECT source, idx, min($hllWeightSql) AS weight
         |  FROM hashed GROUP BY source, idx)
         |SELECT source, round(CAST($HllNum AS DOUBLE) / CAST(
         |    CAST(sum(weight) AS BIGINT) + ($HllM - count(*)) * $HllScale
         |    AS DOUBLE), 4) AS hll_est
         |FROM regs GROUP BY source
         |ORDER BY source""".stripMargin,
    // the incremental store's served estimate must be BIT-EQUAL to the
    // from-scratch whole-corpus sketch (min-merge associativity) — the
    // oracle IS that from-scratch sketch
    "q_incr_hll" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text,' ') AS t FROM documents),
         |shs AS (
         |  SELECT source, unnest(list_distinct(
         |    CASE WHEN len(t) >= 5 THEN
         |      [array_to_string(t[i:i+4],' ') for i in range(1, len(t)-3)]
         |    ELSE [array_to_string(t, ' ')] END)) AS sh
         |  FROM t),
         |hashed AS (
         |  SELECT source, h % $HllM AS idx, h // $HllM AS w FROM (
         |    SELECT source, ${LlmOps.h15("sh")} AS h FROM shs)),
         |regs AS (
         |  SELECT source, idx, min($hllWeightSql) AS weight
         |  FROM hashed GROUP BY source, idx)
         |SELECT source, round(CAST($HllNum AS DOUBLE) / CAST(
         |    CAST(sum(weight) AS BIGINT) + ($HllM - count(*)) * $HllScale
         |    AS DOUBLE), 4) AS hll_est
         |FROM regs GROUP BY source
         |ORDER BY source""".stripMargin,
    // the standing tier serves the IDENTICAL sketch (merge = re-filter,
    // a pure function of the multiset) — the oracle is the from-scratch
    // whole-corpus sketch, estimates only
    "q_incr_qsketch" -> {
      def estSel = Quantiles.map { case (nm, q) =>
        s"max(CASE WHEN rn = CAST(ceil(m * $q) AS BIGINT) THEN v END) AS p${nm}_est"
      }.mkString(",\n    ")
      s"""WITH base AS (
         |  SELECT l_returnflag AS grp, l_extendedprice AS v,
         |    ${LlmOps.h15("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")} AS h
         |  FROM lineitem),
         |cnt AS (SELECT grp, count(*) AS n FROM base GROUP BY grp),
         |lv AS (SELECT grp, n, $qskPowSql AS pow FROM cnt),
         |samp AS (
         |  SELECT b.grp, b.h, b.v FROM base b JOIN lv ON b.grp = lv.grp
         |  WHERE b.h % lv.pow = 0),
         |r AS (
         |  SELECT grp, h, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rn,
         |    count(*) OVER (PARTITION BY grp) AS m
         |  FROM samp),
         |est AS (
         |  SELECT grp, max(m) AS m, $estSel
         |  FROM r GROUP BY grp)
         |SELECT lv.grp AS l_returnflag, lv.n, coalesce(est.m, 0) AS m,
         |  p50_est, p90_est, p99_est
         |FROM lv LEFT JOIN est ON lv.grp = est.grp
         |ORDER BY l_returnflag""".stripMargin
    },
    "q_quantile_sketch" -> {
      def estSel = Quantiles.map { case (nm, q) =>
        s"max(CASE WHEN rn = CAST(ceil(m * $q) AS BIGINT) THEN v END) AS p${nm}_est"
      }.mkString(",\n    ")
      def exSel = Quantiles.map { case (nm, q) =>
        s"max(CASE WHEN rn = CAST(ceil(n * $q) AS BIGINT) THEN v END) AS p${nm}_ex"
      }.mkString(",\n    ")
      s"""WITH base AS (
         |  SELECT l_returnflag AS grp, l_extendedprice AS v,
         |    ${LlmOps.h15("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")} AS h
         |  FROM lineitem),
         |cnt AS (SELECT grp, count(*) AS n FROM base GROUP BY grp),
         |lv AS (SELECT grp, n, $qskPowSql AS pow FROM cnt),
         |samp AS (
         |  SELECT b.grp, b.h, b.v FROM base b JOIN lv ON b.grp = lv.grp
         |  WHERE b.h % lv.pow = 0),
         |r AS (
         |  SELECT grp, h, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rn,
         |    count(*) OVER (PARTITION BY grp) AS m
         |  FROM samp),
         |est AS (
         |  SELECT grp, max(m) AS m, $estSel
         |  FROM r GROUP BY grp),
         |rx AS (
         |  SELECT grp, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
         |    count(*) OVER (PARTITION BY grp) AS n
         |  FROM base),
         |ex AS (
         |  SELECT grp, $exSel
         |  FROM rx GROUP BY grp)
         |SELECT lv.grp AS l_returnflag, lv.n, est.m,
         |  p50_est, p90_est, p99_est, p50_ex, p90_ex, p99_ex
         |FROM lv JOIN est ON lv.grp = est.grp JOIN ex ON lv.grp = ex.grp
         |ORDER BY l_returnflag""".stripMargin
    },
    "q_quantile_sample" -> {
      def qsel(suffix: String) = Quantiles.map { case (nm, q) =>
        s"max(CASE WHEN rn = CAST(ceil(n * $q) AS BIGINT) THEN v END) AS p${nm}_$suffix"
      }.mkString(",\n    ")
      s"""WITH base AS (
         |  SELECT l_returnflag, l_extendedprice AS v,
         |    ${LlmOps.h15("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")} % 20 AS bucket
         |  FROM lineitem),
         |ex AS (
         |  SELECT l_returnflag, ${qsel("ex")}
         |  FROM (
         |    SELECT l_returnflag, v,
         |      row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
         |      count(*) OVER (PARTITION BY l_returnflag) AS n
         |    FROM base)
         |  GROUP BY l_returnflag),
         |sm AS (
         |  SELECT l_returnflag, ${qsel("sm")}
         |  FROM (
         |    SELECT l_returnflag, v,
         |      row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
         |      count(*) OVER (PARTITION BY l_returnflag) AS n
         |    FROM base WHERE bucket = 0)
         |  GROUP BY l_returnflag)
         |SELECT ex.l_returnflag, p50_ex, p90_ex, p99_ex, p50_sm, p90_sm, p99_sm
         |FROM ex JOIN sm ON ex.l_returnflag = sm.l_returnflag
         |ORDER BY ex.l_returnflag""".stripMargin
    },
  )
}
