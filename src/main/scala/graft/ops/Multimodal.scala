package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal-column plumbing (builder brief: binary payloads + typed
  * metadata, decode/feature-extract as batched per-partition UDFs).
  *
  * The decode step is REAL for images: payloads whose magic bytes mark
  * them as PNG/JPEG/GIF/BMP are decoded with the JDK's built-in
  * `javax.imageio.ImageIO` (no external libs needed), and the resize is
  * an actual Graphics2D raster op. Non-image payloads (e.g. the text
  * corpus viewed as binary) fall back to the deterministic `fakeDecode`
  * stand-in, which doubles as the swap point for codecs the JDK lacks
  * (video/audio). Everything around the decoder — binary column schema,
  * typed metadata struct, Dataset encoders, `mapPartitions` batch-shape
  * (the Scala analog of `mapInPandas`: one iterator per partition,
  * amortized per-batch setup) — is the same real Spark plumbing either
  * way. q_mm_decode drives the REAL path end-to-end with generated PNG
  * payloads whose dimensions are deterministic functions of doc_id, so
  * even the real decode carries an exact SQL oracle.
  *
  * Scale: payloads stay columnar binary end-to-end (no driver collect);
  * feature extraction is per-partition with setup cost amortized across
  * the partition's rows, exactly how a real decoder pool would run.
  */
object Multimodal {

  // ImageIO's default stream cache is a temp FILE per image — per-row
  // /tmp churn that left the image ops hostage to host storage tenancy
  // (the round-16 drift watch: 1.5–2× wobble with clean CPU probes).
  // The in-memory cache is decode-identical. Invoked EXPLICITLY at the
  // head of every mapPartitions decode/encode closure (idempotent
  // static toggle, review r16) rather than as an object-init side
  // effect — per-partition setup cannot depend on initializer ordering
  // and doesn't flip a process-global for unrelated ImageIO users
  // until a graft image op actually runs on that JVM.
  private def disableImageIoTempFileCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  case class MMRecord(doc_id: Long, modality: String, payload: Array[Byte],
    mime: String)
  case class MMFeature(doc_id: Long, n_bytes: Long, width: Int, height: Int,
    channels: Int, rs_width: Int, rs_height: Int)

  /** Binary-payload view over `documents` (utf-8 payload = the text —
    * the only binary source in the testdata; schema matches what an
    * image/audio table would carry). */
  def mmTable(spark: SparkSession, sfDir: String): Dataset[MMRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("text").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))
      .as[MMRecord]
  }

  /** FALLBACK decoder for non-image payloads — deterministic stand-in
    * (derives "pixel" dimensions from payload bytes). Also the swap
    * point for codecs the JDK cannot read (video/audio). */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val w = 16 + (payload.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 16 + (payload.lift(1).getOrElse(0: Byte) & 0x3f)
    (w, h, 3)
  }

  /** Aspect-preserving target-dimension math: fit into 32×32 (integer
    * math, deterministic — shared by the real resize and the fallback,
    * and mirrored by the SQL oracles). */
  private[graft] def resizeStub(w: Int, h: Int): (Int, Int) = {
    val m = math.max(w, h)
    (math.max(1, w * 32 / m), math.max(1, h * 32 / m))
  }

  /** Magic-byte sniff: cheap pre-check so the text corpus never pays an
    * ImageIO reader probe per row. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||                        // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  /** REAL image decode via the JDK's built-in `javax.imageio.ImageIO`
    * (PNG/JPEG/GIF/BMP — no external libraries): None when the payload
    * is not a decodable image, in which case callers fall back to
    * [[fakeDecode]]. */
  private[graft] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** REAL aspect-preserving resize (Graphics2D raster draw) into the
    * [[resizeStub]] target box; returns the resized image's ACTUAL
    * dimensions — equal to the stub math by construction, which is what
    * keeps the real path exactly oracle-able. */
  private[graft] def realResize(img: java.awt.image.BufferedImage): (Int, Int) = {
    val (tw, th) = resizeStub(img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    try g.drawImage(
      img.getScaledInstance(tw, th, java.awt.Image.SCALE_FAST), 0, 0, null)
    finally g.dispose()
    (out.getWidth, out.getHeight)
  }

  /** Batched per-partition feature extraction — `mapInPandas` analog:
    * per-partition setup happens once, rows stream through decode →
    * resize → feature columns. Image payloads take the REAL
    * ImageIO/Graphics2D path; everything else the deterministic
    * fallback. */
  def extractFeatures(records: Dataset[MMRecord]): Dataset[MMFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup (pool/native handles would go here)
      disableImageIoTempFileCache()
      it.map { r =>
        decodeImage(r.payload) match {
          case Some(img) =>
            val (rw, rh) = realResize(img)
            MMFeature(r.doc_id, r.payload.length.toLong, img.getWidth,
              img.getHeight, img.getRaster.getNumBands, rw, rh)
          case None =>
            val (w, h, c) = fakeDecode(r.payload)
            val (rw, rh) = resizeStub(w, h)
            MMFeature(r.doc_id, r.payload.length.toLong, w, h, c, rw, rh)
        }
      }
    }
  }

  /** Deterministic per-doc PNG payload: a (8 + id%16)×(8 + (id/16)%16)
    * RGB gradient, encoded with the JDK's ImageIO — a REAL PNG file
    * (magic bytes, IHDR, zlib-compressed IDAT), generated engine-side
    * per partition so no fixture files ship with the repo and the
    * dimensions stay pure functions of doc_id (what lets q_mm_decode
    * carry an exact SQL oracle). */
  private[graft] def pngPayload(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 37 + y * 101 + docId) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class MMFrames(doc_id: Long, n_frames: Long, n_sampled: Long,
    first_frame_bytes: Long)

  /** Frame-sampling plumbing (video/audio analog): split the payload
    * into fixed 64-byte frames, keep every 4th (a real decoder would
    * seek keyframes; the chunking/batching shape is identical). Pure
    * integer arithmetic → fully oracle-able. */
  def frameSample(records: Dataset[MMRecord], frameBytes: Int = 64,
    every: Int = 4): Dataset[MMFrames] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val frames = r.payload.grouped(frameBytes).toIndexedSeq
        val sampled = frames.indices.filter(_ % every == 0).map(frames)
        MMFrames(r.doc_id, frames.length.toLong, sampled.length.toLong,
          sampled.headOption.map(_.length.toLong).getOrElse(0L))
      }
    }
  }

  def qMmFrames(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(mmTable(spark, sfDir)).toDF()
      .orderBy("doc_id").limit(100000)

  /** B1/B22 oracled slice of the plumbing: payload byte length (ASCII
    * text → equals n_chars; checked against DuckDB's octet_length). */
  def qMmBytes(spark: SparkSession, sfDir: String): DataFrame =
    mmTable(spark, sfDir).toDF()
      .select(col("doc_id"), col("modality"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id").limit(100000)

  /** Feature-extraction output. The decode is stubbed but DETERMINISTIC
    * integer arithmetic over payload bytes, so it is fully oracle-able:
    * the oracle mirrors fakeDecode/resizeStub in SQL (valid while the
    * corpus is pure ASCII — byte 1/2 == codepoint 1/2; verified
    * octet_length == length corpus-wide). */
  def qMmFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mmTable(spark, sfDir)).toDF().orderBy("doc_id").limit(100000)

  /** The REAL-decode path end-to-end: per-doc generated PNG payloads
    * (ImageIO encode) → magic sniff → ImageIO decode → Graphics2D
    * resize. Output drops n_bytes (PNG size is encoder-dependent, not
    * oracle-able) and keeps the decoded/resized dimensions, which are
    * deterministic functions of doc_id — full exact oracle. A spec
    * additionally pins known dimensions for fixed ids. */
  def qMmDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val recs = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        disableImageIoTempFileCache() // pngPayload's ImageIO.write side
        it.map(id => MMRecord(id, "image", pngPayload(id), "image/png"))
      }
    extractFeatures(recs).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        col("rs_width"), col("rs_height"))
      .orderBy("doc_id").limit(100000)
  }

  case class MMHash(doc_id: Long, phash_hi: Long, phash_lo: Long)

  /** 64-bit AVERAGE HASH (aHash — the pHash family's integer-exact
    * member) over a decoded image: integer grayscale (299/587/114
    * milli-weights), an 8×8 block grid with floor-division boundaries
    * (every image here is ≥ 8×8), per-block integer mean, bit k = 1
    * iff block k's mean ≥ the integer mean of the 64 block means.
    * All-integer arithmetic end to end, so the REAL ImageIO decode
    * path stays exactly oracle-able (PNG is lossless and the generated
    * gradient's pixels are pure functions of (x, y, doc_id) — the
    * oracle recomputes the same grid from the formula without ever
    * decoding). Split into two non-negative 32-bit halves so neither
    * engine touches the sign bit of a 64-bit value. */
  private[graft] def aHash(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](64)
    val cnts = Array.ofDim[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) & 0xffffff
        val gray = (((rgb >> 16) & 255) * 299 + ((rgb >> 8) & 255) * 587 +
          (rgb & 255) * 114) / 1000
        val k = (y * 8 / h) * 8 + (x * 8 / w)
        sums(k) += gray
        cnts(k) += 1
        x += 1
      }
      y += 1
    }
    val bm = Array.tabulate(64)(k => sums(k) / cnts(k))
    val overall = bm.sum / 64
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      if (bm(k) >= overall) {
        if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
      }
      k += 1
    }
    (hi, lo)
  }

  /** The REAL-decode aHash frame (doc_id, phash_hi, phash_lo) shared
    * by the exact and banded dedup entries: generated PNG payloads →
    * ImageIO decode → [[aHash]], one per-partition projection. */
  private def phashFrame(spark: SparkSession, sfDir: String): DataFrame =
    phashFrameWhere(spark, sfDir, lit(true))

  /** [[phashFrame]] restricted to a doc predicate — the standing-index
    * tier hashes the corpus and batch splits separately (private[graft]:
    * the cross-tier capstones build their own instances). */
  private[graft] def phashFrameWhere(spark: SparkSession, sfDir: String,
      pred: Column): DataFrame =
    phashFrameIds(Tables.documents(spark, sfDir).filter(pred)
      .select(col("doc_id")))

  /** The decode+hash projection over an arbitrary id frame — the
    * ingest capstone hashes the CHANGE FEED's ids (consumers never
    * read the base table). */
  private[graft] def phashFrameIds(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        disableImageIoTempFileCache() // both the write and read sides
        it.map { id =>
          val img = decodeImage(pngPayload(id)).getOrElse(
            throw new IllegalStateException(
              s"generated PNG for doc $id failed to decode"))
          val (hi, lo) = aHash(img)
          MMHash(id, hi, lo)
        }
      }.toDF()
  }

  /** MULTIMODAL × DEDUP composed: perceptual-hash image dedup over the
    * REAL decode path — generated PNG payloads → ImageIO decode →
    * [[aHash]] → exact-hash keep/drop (first doc_id per hash wins, the
    * q_dedup_keep policy). The per-partition batch shape is
    * [[extractFeatures]]'s; at 100 TB the hash is a per-row projection
    * (decode + 64 integer block means — no shuffle) and the keep
    * decision is one hash aggregate on the 64-bit key, exactly the
    * exact-dedup shape with phash standing in for md5(text). The
    * near-dup tier above this is [[qMmPhashNear]] — the SimHash
    * banding recipe over the same hashes, lossless at hamming ≤ 3. */
  def qMmPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("phash_hi", "phash_lo")
    phashFrame(spark, sfDir)
      .withColumn("keep",
        when(col("doc_id") === min(col("doc_id")).over(w), 1L).otherwise(0L))
      .orderBy("doc_id").limit(100000)
  }

  /** MULTIMODAL × NEAR-DUP (r14 verdict item 2 — the claim the exact
    * tier's scaladoc made, now an oracled entry): banded-hamming image
    * near-dup search over the aHash bits, the q_simhash_dedup recipe
    * applied verbatim. The 64-bit hash bands into 4×16-bit keys
    * (pigeonhole: hamming ≤ 3 ⇒ at least one band identical, so the
    * banded equi-join is a LOSSLESS candidate generator at this
    * radius — MultimodalSpec proves equality to brute hamming truth),
    * candidates verify by exact popcount over both 32-bit halves
    * JOIN-SIDE, and each doc keeps its best neighbor through the
    * partial-agg min(struct(hamming, db)) — a hash aggregate, not a
    * window, so the shuffle carries ≤1 row per doc per task however
    * hot a band bucket gets. At 100 TB this is the image-dedup pass:
    * hash = per-row projection (decode + 64 integer block means),
    * candidates = bucketed equi-join, decision = one partial agg. */
  def qMmPhashNear(spark: SparkSession, sfDir: String): DataFrame = {
    val hashed = phashFrame(spark, sfDir)
    val bandStructs = array(
      struct(lit(0).as("band"),
        col("phash_lo").bitwiseAND(lit(65535L)).as("bkey")),
      struct(lit(1).as("band"),
        shiftright(col("phash_lo"), 16).bitwiseAND(lit(65535L)).as("bkey")),
      struct(lit(2).as("band"),
        col("phash_hi").bitwiseAND(lit(65535L)).as("bkey")),
      struct(lit(3).as("band"),
        shiftright(col("phash_hi"), 16).bitwiseAND(lit(65535L)).as("bkey")))
    val bands = hashed.select(col("doc_id"), col("phash_hi"),
        col("phash_lo"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val best = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (bit_count(col("a.phash_hi").bitwiseXOR(col("b.phash_hi"))) +
          bit_count(col("a.phash_lo").bitwiseXOR(col("b.phash_lo"))))
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .groupBy(col("da"))
      .agg(min(struct(col("hamming"), col("db"))).as("best"))
    best.select(col("da").as("doc_id"), col("best.db").as("nbr"),
        col("best.hamming").as("hamming"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // Standing phash index tier (r16 verdict item 3) — the multimodal
  // mirror of Incremental's standing dedup indexes: text near-dup got
  // bucketed tx-table band stores with exactly-once admission and
  // retraction in r12–r16, while image near-dup still recomputed the
  // aHash bands in-query every run. At 100 TB of images the production
  // shape is THIS: the 4×16-bit band relation persisted ONCE in a
  // bucketed ACID table (band ordinal folded into the key, so the
  // single bucket column IS the whole join key — the Incremental.bandsOf
  // trick), each ingest day hashing and appending only its own batch
  // (exactly-once under the (appId, batchId) txn watermark), and the
  // daily near-dup check one bucketed equi-join where the corpus side
  // never re-shuffles (zero Exchange above the index scan — pinned in
  // BucketedIndexSpec) and never re-DECODES: the decode+hash cost, the
  // dominant term for images, is paid once per image ever. Retraction
  // (takedowns — for images a routine legal event) is the established
  // contract: ONE exactly-once tombstone commit, anti-join masks at
  // read, per-bucket compaction for physical deletion; oracle = a
  // fresh index on the survivor corpus.
  // ---------------------------------------------------------------------

  /** The ingest split (mirrors Incremental.isBatch): standing corpus =
    * doc_id % 10 < 8, today's batch = the rest. */
  private def isBatchImg: Column = col("doc_id") % 10 >= 8

  /** The retraction split: 1-in-10 corpus images (disjoint from the
    * batch) — mirrors the oracle's survivor predicate. */
  private def isDroppedImg: Column = col("doc_id") % 10 === 7

  /** Folded band rows (doc_id, phash_hi, phash_lo, bkey) of a hash
    * frame: bkey = band·2¹⁶ + the band's 16-bit slice, so ONE column
    * is the complete candidate-join key (equal bkey ⇔ equal (band,
    * slice)) — what lets the standing store bucket on a single column
    * and still get bucket-set pruning for selective probes. */
  private[graft] def phashBandsFolded(h: DataFrame): DataFrame =
    h.select(col("doc_id"), col("phash_hi"), col("phash_lo"),
      explode(array(
        col("phash_lo").bitwiseAND(lit(65535L)),
        lit(65536L) + shiftright(col("phash_lo"), 16).bitwiseAND(lit(65535L)),
        lit(131072L) + col("phash_hi").bitwiseAND(lit(65535L)),
        lit(196608L) + shiftright(col("phash_hi"), 16).bitwiseAND(lit(65535L))
      )).as("bkey"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"), col("bkey"))

  /** Cross-group near-dup core: each BATCH doc's best corpus neighbor
    * at hamming ≤ 3 — the banded candidate join (lossless at this
    * radius by the [[qMmPhashNear]] pigeonhole), exact two-half
    * popcount verify, per-doc partial-agg argmin. Multi-band duplicate
    * candidates are absorbed by the min, so no DISTINCT shuffles the
    * candidate set. */
  private[graft] def phashNearAgainst(batchBands: DataFrame,
      corpusBands: DataFrame): DataFrame =
    corpusBands.as("c").join(batchBands.as("b"),
        col("c.bkey") === col("b.bkey"))
      .select(col("b.doc_id").as("doc_id"), col("c.doc_id").as("nbr"),
        (bit_count(col("b.phash_hi").bitwiseXOR(col("c.phash_hi"))) +
          bit_count(col("b.phash_lo").bitwiseXOR(col("c.phash_lo"))))
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .groupBy("doc_id")
      .agg(min(struct(col("hamming"), col("nbr"))).as("best"))
      .select(col("doc_id"), col("best.nbr").as("nbr"),
        col("best.hamming").as("hamming"))

  /** Session memo for the standing stores ([[graft.ops.Incremental]]'s
    * content-stamp discipline: a regenerated corpus rebuilds instead of
    * serving stale bands). */
  private val builtPhashIdx =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Pid-scoped store roots (shared-/tmp hygiene; production persists
    * the index across runs and never builds it inside a query). */
  private def phashIdxRoot(kind: String, sfDir: String): String =
    "/tmp/graft_txphash_" + kind + "_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current.pid

  private val PhashBuckets = 8

  /** Create the standing band table at `root` from a corpus-ids hash
    * frame — bucketed by the folded band key, cluster key = bkey (the
    * integral key the manifest stats ride). */
  private[graft] def buildPhashTable(spark: SparkSession, hashes: DataFrame,
      root: String): Unit =
    graft.io.TxTable.createBucketed(spark, root, phashBandsFolded(hashes),
      "bkey", Seq("bkey"), PhashBuckets)

  /** The standing corpus band index (built once per session, memoized
    * on the corpus content stamp). */
  private[graft] def buildPhashIndex(spark: SparkSession, sfDir: String)
      : String = {
    val root = phashIdxRoot("band", sfDir)
    val key = s"${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")
    if (!builtPhashIdx.contains(key)) builtPhashIdx.synchronized {
      if (!builtPhashIdx.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txphash_")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        buildPhashTable(spark,
          phashFrameWhere(spark, sfDir, !isBatchImg), root)
        builtPhashIdx.add(key)
      }
    }
    root
  }

  /** Admit a batch's hashes into the standing index — one atomic
    * bucket-preserving append; with `txn` = (appId, batchId) a replayed
    * admission is absorbed (exactly-once, the Incremental.admitBatch
    * contract). */
  private[graft] def admitPhashBatch(spark: SparkSession, root: String,
      hashes: DataFrame, txn: Option[(String, Long)] = None): Unit = {
    val rows = phashBandsFolded(hashes)
    txn match {
      case Some((app, b)) =>
        graft.io.TxTable.appendBatch(spark, root, app, b, rows)
      case None => graft.io.TxTable.append(spark, root, rows)
    }
  }

  /** The index under the tombstone mask (retraction tier): dead docs'
    * band rows leave candidate generation the moment the tombstone
    * commit lands, before any compaction. */
  private[graft] def livePhashIndex(spark: SparkSession, bandT: String,
      tombT: String): DataFrame =
    graft.io.TxRelation.read(spark, bandT)
      .join(graft.io.TxRelation.read(spark, tombT).select(col("doc_id")),
        Seq("doc_id"), "left_anti")

  /** Physical deletion between rebuilds: per-bucket compaction with
    * the same mask — bucket placement (value-hashed on bkey) and txn
    * watermarks survive, reads are unchanged (IncrPhashSpec pins it). */
  private[graft] def compactPhashIndex(spark: SparkSession, bandT: String,
      tombT: String): Long = {
    val tombs = graft.io.TxRelation.read(spark, tombT).select(col("doc_id"))
    graft.io.TxTable.compactBuckets(spark, bandT,
      _.join(tombs, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("phash_hi"), col("phash_lo"), col("bkey")))
  }

  /** Session-idempotent DELETE fixture: own roots (retraction must not
    * thrash q_incr_phash's store), corpus index + tombstone table, the
    * [[isDroppedImg]] slice retracted exactly-once (the shared
    * [[Incremental.retractDocs]] tombstone contract — already-dead ids
    * are no-ops, replayed batches absorb wholesale). */
  private[graft] def buildPhashDeleteIndex(spark: SparkSession,
      sfDir: String): (String, String) = {
    val bandT = phashIdxRoot("delband", sfDir)
    val tombT = phashIdxRoot("deltomb", sfDir)
    val key = s"del:${System.identityHashCode(spark)}:$sfDir:" +
      Housekeeping.contentStamp(s"$sfDir/documents.parquet")
    if (!builtPhashIdx.contains(key)) builtPhashIdx.synchronized {
      if (!builtPhashIdx.contains(key)) {
        Housekeeping.reapDeadPidDirs(new java.io.File("/tmp"),
          "graft_txphash_")
        Seq(bandT, tombT).foreach { r =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
        }
        buildPhashTable(spark,
          phashFrameWhere(spark, sfDir, !isBatchImg), bandT)
        graft.io.TxTable.createTombTable(tombT, "doc_id")
        Incremental.retractDocs(spark,
          Tables.documents(spark, sfDir)
            .filter(!isBatchImg && isDroppedImg).select(col("doc_id")),
          tombT, deletedAtV = 1L, txn = Some(("incr_phash_del", 1L)))
        builtPhashIdx.add(key)
      }
    }
    (bandT, tombT)
  }

  /** MULTIMODAL near-dup through the STANDING index: today's batch is
    * decoded + hashed (the only per-run image work), banded under the
    * store's folded scheme, and equi-joined against the standing
    * corpus band table — corpus rows arrive pre-bucketed on the join
    * key (zero Exchange above the index scan, BucketedIndexSpec) and
    * the corpus images are never re-decoded. Output: each batch doc's
    * best corpus neighbor at hamming ≤ 3 (lossless banding). Oracle:
    * the q_mm_phash_near chain with candidates restricted to
    * corpus × batch. */
  def qIncrPhash(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildPhashIndex(spark, sfDir)
    val batch = phashBandsFolded(phashFrameWhere(spark, sfDir, isBatchImg))
    phashNearAgainst(batch, graft.io.TxRelation.read(spark, root))
      .orderBy("doc_id")
  }

  /** RETRACTION in the standing image index: after the delete batch,
    * a dropped corpus image generates no candidates — the serve reads
    * through the tombstone mask ([[livePhashIndex]]). Oracle: a fresh
    * index on the survivor corpus (the established rebuild contract). */
  def qIncrPhashDel(spark: SparkSession, sfDir: String): DataFrame = {
    val (bandT, tombT) = buildPhashDeleteIndex(spark, sfDir)
    val batch = phashBandsFolded(phashFrameWhere(spark, sfDir, isBatchImg))
    phashNearAgainst(batch, livePhashIndex(spark, bandT, tombT))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_bytes" -> (qMmBytes _),
    "q_mm_features" -> (qMmFeatures _),
    "q_mm_frames" -> (qMmFrames _),
    "q_mm_decode" -> (qMmDecode _),
    "q_mm_phash_dedup" -> (qMmPhashDedup _),
    "q_mm_phash_near" -> (qMmPhashNear _),
    "q_incr_phash" -> (qIncrPhash _),
    "q_incr_phash_del" -> (qIncrPhashDel _),
  )

  /** Shared oracle chain: aHash replayed WITHOUT decoding — the
    * gradient PNG's pixels are pure functions of (x, y, doc_id), so
    * the SQL regenerates the pixel grid, grays it with the same
    * integer milli-weights, folds the same 8×8 floor-division blocks,
    * and packs the same two 32-bit halves; ends in `ph`
    * (doc_id, phash_hi, phash_lo). All-integer (// division). */
  private val phashCtes: String =
    """d AS (
      |  SELECT doc_id, CAST(8 + doc_id % 16 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS h
      |  FROM documents),
      |pxx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM pxx),
      |pxr AS (
      |  SELECT doc_id, w, h, x, y,
      |    ((x * 37 + y * 101 + doc_id) & 16777215) AS rgb
      |  FROM px),
      |g AS (
      |  SELECT doc_id, ((y * 8) // h) * 8 + ((x * 8) // w) AS k,
      |    (((rgb >> 16) & 255) * 299 + ((rgb >> 8) & 255) * 587
      |     + (rgb & 255) * 114) // 1000 AS gray
      |  FROM pxr),
      |bm AS (SELECT doc_id, k, sum(gray) // count(*) AS m
      |  FROM g GROUP BY doc_id, k),
      |ov AS (SELECT doc_id, sum(m) // 64 AS o FROM bm GROUP BY doc_id),
      |bits AS (
      |  SELECT b.doc_id, b.k,
      |    CASE WHEN b.m >= v.o THEN 1 ELSE 0 END AS bit
      |  FROM bm b JOIN ov v ON v.doc_id = b.doc_id),
      |ph AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN k >= 32
      |      THEN bit * ((1::BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT)
      |      AS phash_hi,
      |    CAST(sum(CASE WHEN k < 32
      |      THEN bit * ((1::BIGINT) << k) ELSE 0 END) AS BIGINT)
      |      AS phash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

  /** Oracle for the standing-index tier: the [[phashCtes]] chain with
    * FOLDED band keys and candidates restricted to corpus × batch;
    * `corpusExtra` further restricts the corpus side — the retraction
    * oracle passes the survivor predicate, making the SQL a fresh
    * index on the surviving corpus. */
  private[graft] def incrPhashOracle(corpusExtra: String): String =
    incrPhashOracleWhere(s"DOC % 10 < 8$corpusExtra", "DOC % 10 >= 8")

  /** The banded near-dup chain over ARBITRARY corpus/batch predicates
    * (DOC-templated) — the ingest capstone passes its grown corpus
    * (original split ∪ admitted day) and its day-2 batch. */
  private[graft] def incrPhashOracleWhere(corpusWhere: String,
      batchWhere: String): String =
    s"""WITH $phashCtes,
       |bands AS (
       |  SELECT doc_id, phash_hi, phash_lo,
       |    b * 65536 + CASE WHEN b = 0 THEN phash_lo & 65535
       |         WHEN b = 1 THEN (phash_lo >> 16) & 65535
       |         WHEN b = 2 THEN phash_hi & 65535
       |         ELSE (phash_hi >> 16) & 65535 END AS bkey
       |  FROM ph, unnest(range(0, 4)) AS u(b)),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS bd, c.doc_id AS cd,
       |    c.phash_hi AS hc, c.phash_lo AS lc,
       |    b.phash_hi AS hb, b.phash_lo AS lb
       |  FROM bands c JOIN bands b ON c.bkey = b.bkey
       |  WHERE ${corpusWhere.replace("DOC", "c.doc_id")}
       |    AND ${batchWhere.replace("DOC", "b.doc_id")}),
       |ham AS (
       |  SELECT bd, cd,
       |    CAST(bit_count(xor(hc, hb)) + bit_count(xor(lc, lb))
       |      AS INTEGER) AS hamming
       |  FROM cand
       |  WHERE bit_count(xor(hc, hb)) + bit_count(xor(lc, lb)) <= 3)
       |SELECT bd AS doc_id, cd AS nbr, hamming FROM (
       |  SELECT bd, cd, hamming, row_number() OVER (PARTITION BY bd
       |    ORDER BY hamming, cd) AS rn FROM ham)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_incr_phash" -> incrPhashOracle(""),
    // fresh index on the surviving corpus — the retraction contract
    "q_incr_phash_del" -> incrPhashOracle(" AND c.doc_id % 10 <> 7"),
    // fakeDecode: w = 16 + (byte1 & 0x3f), h = 16 + (byte2 & 0x3f), c=3;
    // resizeStub: aspect-preserving integer fit into 32x32
    "q_mm_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | 16 + (ascii(substr(text, 1, 1)) & 63) AS width,
        | 16 + (coalesce(ascii(substr(text, 2, 1)), 0) & 63) AS height,
        | CAST(3 AS INTEGER) AS channels,
        | CAST(greatest(1, ((16 + (ascii(substr(text,1,1)) & 63)) * 32)
        |   // greatest(16 + (ascii(substr(text,1,1)) & 63),
        |              16 + (coalesce(ascii(substr(text,2,1)), 0) & 63))) AS INTEGER) AS rs_width,
        | CAST(greatest(1, ((16 + (coalesce(ascii(substr(text,2,1)), 0) & 63)) * 32)
        |   // greatest(16 + (ascii(substr(text,1,1)) & 63),
        |              16 + (coalesce(ascii(substr(text,2,1)), 0) & 63))) AS INTEGER) AS rs_height
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
    "q_mm_bytes" ->
      """SELECT doc_id, 'text' AS modality,
        | octet_length(encode(text)) AS n_bytes
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
    // n_frames = ceil(bytes/64); every-4th sampling keeps ceil(n/4);
    // first sampled frame is frame 0 → min(64, bytes) bytes long.
    // real ImageIO decode of generated PNGs: dims are pure functions of
    // doc_id (w = 8 + id%16, h = 8 + (id//16)%16, 3-band BGR), resize is
    // the aspect-preserving 32-box fit — all integer math
    "q_mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 16 AS INTEGER) AS width,
        |    CAST(8 + (doc_id // 16) % 16 AS INTEGER) AS height
        |  FROM documents)
        |SELECT doc_id, width, height, CAST(3 AS INTEGER) AS channels,
        |  CAST(greatest(1, width * 32 // greatest(width, height)) AS INTEGER) AS rs_width,
        |  CAST(greatest(1, height * 32 // greatest(width, height)) AS INTEGER) AS rs_height
        |FROM d ORDER BY doc_id LIMIT 100000""".stripMargin,
    "q_mm_phash_dedup" ->
      s"""WITH $phashCtes
        |SELECT doc_id, phash_hi, phash_lo,
        |  CAST(CASE WHEN doc_id = min(doc_id)
        |    OVER (PARTITION BY phash_hi, phash_lo) THEN 1 ELSE 0 END
        |    AS BIGINT) AS keep
        |FROM ph ORDER BY doc_id LIMIT 100000""".stripMargin,
    // the banded near-dup tier: 4×16-bit bands over the same hashes,
    // DISTINCT candidate pairs (the Spark side's duplicate multi-band
    // hits are absorbed by the argmin instead), exact two-half
    // popcount, per-doc (hamming, db) argmin — the simhash oracle's
    // shape over the ph chain
    "q_mm_phash_near" ->
      s"""WITH $phashCtes,
        |bands AS (
        |  SELECT doc_id, phash_hi, phash_lo, b,
        |    CASE WHEN b = 0 THEN phash_lo & 65535
        |         WHEN b = 1 THEN (phash_lo >> 16) & 65535
        |         WHEN b = 2 THEN phash_hi & 65535
        |         ELSE (phash_hi >> 16) & 65535 END AS bkey
        |  FROM ph, unnest(range(0, 4)) AS u(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, a.phash_hi AS ha,
        |    a.phash_lo AS la, b.doc_id AS db, b.phash_hi AS hb,
        |    b.phash_lo AS lb
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id <> b.doc_id),
        |ham AS (
        |  SELECT da, db,
        |    CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb))
        |      AS INTEGER) AS hamming
        |  FROM cand
        |  WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3)
        |SELECT da AS doc_id, db AS nbr, hamming FROM (
        |  SELECT da, db, hamming, row_number() OVER (PARTITION BY da
        |    ORDER BY hamming, db) AS rn FROM ham)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id,
        | CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
        | CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled,
        | least(64, octet_length(encode(text))) AS first_frame_bytes
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
  )
}
