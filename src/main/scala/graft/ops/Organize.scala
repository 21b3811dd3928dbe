package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Round-7 corpus-organization operators — the steps that turn a
  * cleaned/deduped corpus into TRAINING INPUT: deterministic
  * train/val/test splitting, global shuffle into shards, CCNet-style
  * perplexity bucketing, a per-source corpus "data card" audit, and
  * embedding-space outlier pruning.
  *
  * Scale design (100 TB):
  *  - Split assignment is a pure per-row hash (scan→project, zero
  *    shuffles); only the tiny report aggregates.
  *  - Shard shuffle is hash-partition + sort WITHIN each shard — never
  *    a global sort. The window's partition key IS the shard key, so
  *    the plan is one exchange on shard, then a per-partition sort:
  *    exactly the layout a 1000-executor write wants.
  *  - Perplexity bucketing needs a per-language total order, and
  *    languages are few: one exchange on lang, per-partition sort,
  *    ntile — no global coordination.
  *  - The data card reduces the corpus to |sources|-sized relations
  *    per metric before any join; joins are between tiny aggregates.
  *  - Embedding outliers: centroids are |labels|×dim rows — broadcast
  *    back over the exploded vectors, so the corpus-side cost is one
  *    explode + two scan-side aggregates, no vector-vs-vector pairs.
  *  - Determinism/oracle parity: hashes are [[LlmOps.md5Long]]; all
  *    cross-row float math is quantized to integer micro-units first
  *    (order-insensitive exact sums), and every surviving float op is a
  *    fixed written sequence of IEEE ops on exact integers — identical
  *    in Spark and DuckDB — rounded once.
  *
  * Reference anchor: dataframe_expressions exposes the capture surface
  * (`dataframe_expressions.DataFrame` attribute/filter algebra); the
  * concrete organization steps mirror published pipeline practice
  * (CCNet's per-language perplexity terciles; fixed-hash splits).
  */
object Organize {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** Deterministic train/val/test split (90/5/5) by a salted hash of
    * the doc id — reproducible at any parallelism, no RNG state, and a
    * doc's split never changes when the corpus grows (the property that
    * keeps eval sets stable across corpus refreshes). Report: per
    * (source, split) doc and token counts. */
  def qSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(
      LlmOps.md5Long(concat(lit("split:"), col("doc_id").cast("string"))),
      lit(100L))
    val split = when(bucket < 90, lit("train"))
      .when(bucket < 95, lit("val")).otherwise(lit("test"))
    docs(spark, sfDir)
      .select(col("source"), split.as("split"),
        size(org.apache.spark.sql.functions.split(col("text"), " ")).as("nt"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_toks"))
      .orderBy("source", "split")
  }

  /** Shard count for [[qShuffleShards]]. */
  private val NShards = 8

  /** Deterministic global shuffle for training order: every doc gets a
    * shard (hash mod [[NShards]]) and a position within its shard
    * (rank of its hash key). The plan is ONE exchange on the shard key
    * and a sort within each shard partition — a global training-order
    * shuffle with no global sort, which is how a 100 TB corpus is
    * actually laid out for data loaders (shard files, locally
    * ordered). */
  def qShuffleShards(spark: SparkSession, sfDir: String): DataFrame = {
    val key = LlmOps.md5Long(concat(lit("shuf:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    docs(spark, sfDir)
      .select(col("doc_id"), key.as("skey"),
        pmod(key, lit(NShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** CCNet-style perplexity bucketing: score every doc with the
    * corpus-trained bigram LM ([[Curate.lmScoreOf]], integer
    * micro-units end to end), then split EACH LANGUAGE into
    * head/middle/tail terciles by score (head = most fluent). Per-lang
    * windows keep the sort per-partition; the report is |langs|×3
    * rows. Single-token docs carry no bigram and are excluded, like
    * q_lm_score. */
  def qPplBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val scored = Curate.lmScoreOf(d).select(col("doc_id"), col("lm_micro"))
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val tile = ntile(3).over(
      Window.partitionBy("lang").orderBy(col("lm_micro").desc, col("doc_id")))
    scored.withColumn("t", tile)
      .withColumn("bucket",
        when(col("t") === 1, lit("head"))
          .when(col("t") === 2, lit("middle")).otherwise(lit("tail")))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("lm_micro")).as("min_micro"),
        max(col("lm_micro")).as("max_micro"),
        expr("sum(lm_micro) div count(1)").as("avg_micro"))
      .orderBy("lang", "bucket")
  }

  /** Per-source corpus data card — the audit table a dataset release
    * ships: doc/token/char totals, language spread, dominant language,
    * and how many docs are exact duplicates of ANY corpus doc. Every
    * metric reduces to a |sources|- or |sources×langs|-sized relation
    * before joining; the duplicate layer reuses the exact-fingerprint
    * shape of q_dedup_exact (hash agg on md5, then a semi join back). */
  def qDataCard(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("source"), col("lang"),
      col("n_chars"),
      size(org.apache.spark.sql.functions.split(col("text"), " ")).as("nt"),
      md5(col("text")).as("fp"))
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum(col("nt")).as("n_toks"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val topLang = d.groupBy("source", "lang").agg(count(lit(1)).as("ld"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("ld").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("ld").as("top_lang_docs"))
    val dupFp = d.groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("fp")
    val dups = d.join(dupFp, Seq("fp"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("dd"))
    base.join(topLang, Seq("source"))
      .join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_toks"), col("n_chars"),
        col("n_langs"), col("top_lang"), col("top_lang_docs"),
        coalesce(col("dd"), lit(0L)).as("dup_docs"))
      .orderBy("source")
  }

  /** Quantization scale for [[qEmbOutliers]] — bounds every exact
    * integer accumulation well inside 64 bits at any realistic SF
    * (|q| ≤ 1e4·|x|, dim 64; see the overflow audit in the scaladoc
    * below). */
  private val QScale = 10000.0

  /** Embedding-space outlier pruning: cosine of every vector to its
    * label centroid, flagging the 5 farthest per label — the "drop
    * mislabeled / off-manifold examples" curation step. The centroid is
    * used UN-normalized (cosine is scale-invariant), so it stays an
    * exact integer sum vector: elements quantize to 1e-4 units
    * (scan-side), per-(label,dim) sums are exact longs, and the per-
    * vector dot/norms are exact long folds — sums are order-insensitive
    * at any parallelism, and the one surviving float expression
    * (dot/(√·√)) is computed identically by both engines from exact
    * integers. Overflow audit at sf0.1 (5 000 vecs/label, |x|<1):
    * |S_i| ≤ 5e7, S_i² ≤ 2.5e15, dot(q,S) ≤ 64·1e4·5e7 = 3.2e13 —
    * all ≪ 2⁶³. Centroids are |labels|×dim rows → broadcast joins;
    * corpus-side cost is one explode + two scan-side aggregates. */
  def qEmbOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val q = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"), col("pos"),
        floor(col("x").cast("double") * lit(QScale)).cast("long").as("q"))
    val cent = q.groupBy("label", "pos").agg(sum(col("q")).as("s"))
    val cnorm = cent.groupBy("label").agg(sum(col("s") * col("s")).as("ss"))
    val perVec = q.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(sum(col("q") * col("s")).as("ds"), sum(col("q") * col("q")).as("qq"))
    val cosC = round(
      col("ds").cast("double") /
        (sqrt(col("qq").cast("double")) * sqrt(col("ss").cast("double"))), 6)
    perVec.join(broadcast(cnorm), Seq("label"))
      .select(col("label"), col("vec_id"), cosC.as("cos_c"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("label").orderBy(col("cos_c"), col("vec_id")))
        .cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("label", "rnk")
  }

  /** Stratified quality thresholding — drop each source's own bottom
    * quality quartile, rather than one global cutoff (a global cut
    * empties low-quality sources entirely and leaves high-quality
    * sources untouched; per-source stratification is how mixed-corpus
    * pipelines actually filter). Scores are [[LlmOps.qQualityScore]]'s
    * deterministic composite; the quartile is a per-source window
    * (ntile over the (score, doc_id) total order — one exchange on
    * source, per-partition sort). Report: per-source kept counts and
    * the realized threshold. */
  def qQualityCut(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = LlmOps.qualityScoreOf(docs(spark, sfDir))
      .select(col("doc_id"), col("score"))
      .join(docs(spark, sfDir).select(col("doc_id"), col("source")), Seq("doc_id"))
    val tile = ntile(4).over(
      Window.partitionBy("source").orderBy(col("score"), col("doc_id")))
    scored.withColumn("q", tile)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") > 1, 1L).otherwise(0L)).as("n_kept"),
        min(when(col("q") > 1, col("score"))).as("kept_min_score"),
        max(col("score")).as("max_score"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_cut" -> (qQualityCut _),
    "q_split" -> (qSplit _),
    "q_shuffle_shards" -> (qShuffleShards _),
    "q_ppl_buckets" -> (qPplBuckets _),
    "q_data_card" -> (qDataCard _),
    "q_emb_outliers" -> (qEmbOutliers _))

  val oracle: Map[String, String] = Map(
    "q_quality_cut" ->
      """WITH scored AS (
        |  SELECT d.doc_id, d.source,
        |    round(0.5 * (len(list_distinct(string_split(d.text,' '))) * 1.0
        |        / len(string_split(d.text,' ')))
        |      + 0.5 * least(len(string_split(d.text,' ')) / 100.0, 1.0), 6)
        |      AS score
        |  FROM documents d),
        |tiled AS (
        |  SELECT source, score,
        |    ntile(4) OVER (PARTITION BY source
        |      ORDER BY score, doc_id) AS q
        |  FROM scored)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN q > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min(CASE WHEN q > 1 THEN score END) AS kept_min_score,
        |  max(score) AS max_score
        |FROM tiled GROUP BY source ORDER BY source""".stripMargin,
    "q_split" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN h < 90 THEN 'train'
        |         WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
        |    len(string_split(text, ' ')) AS nt
        |  FROM (SELECT *,
        |          ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |            % 100 AS h
        |        FROM documents))
        |SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_toks
        |FROM d GROUP BY source, split ORDER BY source, split""".stripMargin,
    "q_shuffle_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS skey
        |  FROM documents)
        |SELECT doc_id, skey % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY skey % 8
        |    ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,
    "q_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |p AS MATERIALIZED (
        |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
        |  FROM t, unnest(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |big AS (SELECT prev, cur, count(*) AS cb FROM p GROUP BY prev, cur),
        |ctx AS (SELECT prev, sum(cb) AS c1 FROM big GROUP BY prev),
        |probs AS (
        |  SELECT big.prev, big.cur,
        |    CAST(floor(1000000.0 * cb / c1) AS BIGINT) AS micro
        |  FROM big JOIN ctx ON big.prev = ctx.prev),
        |scored AS (
        |  SELECT doc_id, CAST(sum(micro) // count(*) AS BIGINT) AS lm_micro
        |  FROM p JOIN probs ON p.prev = probs.prev AND p.cur = probs.cur
        |  GROUP BY doc_id),
        |tiled AS (
        |  SELECT d.lang, s.lm_micro,
        |    ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.lm_micro DESC, s.doc_id) AS t
        |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
        |SELECT lang,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  CAST(min(lm_micro) AS BIGINT) AS min_micro,
        |  CAST(max(lm_micro) AS BIGINT) AS max_micro,
        |  CAST(sum(lm_micro) // count(*) AS BIGINT) AS avg_micro
        |FROM tiled GROUP BY lang, t ORDER BY lang, bucket""".stripMargin,
    "q_data_card" ->
      """WITH d AS MATERIALIZED (
        |  SELECT source, lang, n_chars,
        |    len(string_split(text, ' ')) AS nt, md5(text) AS fp
        |  FROM documents),
        |base AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_toks,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    count(DISTINCT lang) AS n_langs
        |  FROM d GROUP BY source),
        |lc AS (
        |  SELECT source, lang, count(*) AS ld FROM d GROUP BY source, lang),
        |top AS (
        |  SELECT source, lang AS top_lang, ld AS top_lang_docs FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY ld DESC, lang) AS rn FROM lc)
        |  WHERE rn = 1),
        |dupfp AS (SELECT fp FROM d GROUP BY fp HAVING count(*) > 1),
        |dups AS (
        |  SELECT source, count(*) AS dd
        |  FROM d WHERE fp IN (SELECT fp FROM dupfp) GROUP BY source)
        |SELECT base.source AS source, n_docs, n_toks, n_chars, n_langs,
        |  top_lang, CAST(top_lang_docs AS BIGINT) AS top_lang_docs,
        |  CAST(COALESCE(dd, 0) AS BIGINT) AS dup_docs
        |FROM base JOIN top ON base.source = top.source
        |  LEFT JOIN dups ON base.source = dups.source
        |ORDER BY source""".stripMargin,
    "q_emb_outliers" ->
      """WITH q AS MATERIALIZED (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, i AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
        |cent AS (
        |  SELECT label, pos, CAST(sum(q) AS BIGINT) AS s
        |  FROM q GROUP BY label, pos),
        |cnorm AS (
        |  SELECT label, CAST(sum(s * s) AS BIGINT) AS ss
        |  FROM cent GROUP BY label),
        |pv AS (
        |  SELECT q.vec_id, q.label,
        |    CAST(sum(q.q * cent.s) AS BIGINT) AS ds,
        |    CAST(sum(q.q * q.q) AS BIGINT) AS qq
        |  FROM q JOIN cent ON q.label = cent.label AND q.pos = cent.pos
        |  GROUP BY q.vec_id, q.label),
        |cosd AS (
        |  SELECT pv.label, pv.vec_id,
        |    round(CAST(ds AS DOUBLE) /
        |      (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(ss AS DOUBLE))), 6) AS cos_c
        |  FROM pv JOIN cnorm ON pv.label = cnorm.label)
        |SELECT label, vec_id, cos_c, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY label
        |    ORDER BY cos_c, vec_id) AS BIGINT) AS rnk FROM cosd)
        |WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin)
}
