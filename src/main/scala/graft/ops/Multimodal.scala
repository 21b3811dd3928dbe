package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
      // per-partition decoder setup would go here (pool/native handles)
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
      .mapPartitions(_.map(id =>
        MMRecord(id, "image", pngPayload(id), "image/png")))
    extractFeatures(recs).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        col("rs_width"), col("rs_height"))
      .orderBy("doc_id").limit(100000)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_bytes" -> (qMmBytes _),
    "q_mm_features" -> (qMmFeatures _),
    "q_mm_frames" -> (qMmFrames _),
    "q_mm_decode" -> (qMmDecode _),
  )

  val oracle: Map[String, String] = Map(
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
    "q_mm_frames" ->
      """SELECT doc_id,
        | CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
        | CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled,
        | least(64, octet_length(encode(text))) AS first_frame_bytes
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
  )
}
