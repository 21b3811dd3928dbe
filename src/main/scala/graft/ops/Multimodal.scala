package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal-column plumbing (builder brief: binary payloads + typed
  * metadata, decode/feature-extract as batched per-partition UDFs).
  *
  * Real decoders (image/audio libs) are not in this container, so the
  * DECODE STEP IS A DETERMINISTIC FAKE (`fakeDecode` — derives "pixel"
  * dimensions from payload bytes). Everything around it — binary column
  * schema, typed metadata struct, Dataset encoders, `mapPartitions`
  * batch-shape (the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup) — is real Spark plumbing and is
  * tested.
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

  /** STUBBED decoder — deterministic stand-in for an image decode.
    * A real deployment swaps ONLY this function. */
  private[ops] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val w = 16 + (payload.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 16 + (payload.lift(1).getOrElse(0: Byte) & 0x3f)
    (w, h, 3)
  }

  /** STUBBED resize — aspect-preserving fit into 32×32 (integer math,
    * deterministic); a real deployment swaps in the image library call. */
  private[ops] def resizeStub(w: Int, h: Int): (Int, Int) = {
    val m = math.max(w, h)
    (math.max(1, w * 32 / m), math.max(1, h * 32 / m))
  }

  /** Batched per-partition feature extraction — `mapInPandas` analog:
    * per-partition setup happens once, rows stream through decode →
    * resize → feature columns. */
  def extractFeatures(records: Dataset[MMRecord]): Dataset[MMFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (pool/native handles)
      it.map { r =>
        val (w, h, c) = fakeDecode(r.payload)
        val (rw, rh) = resizeStub(w, h)
        MMFeature(r.doc_id, r.payload.length.toLong, w, h, c, rw, rh)
      }
    }
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_bytes" -> (qMmBytes _),
    "q_mm_features" -> (qMmFeatures _),
    "q_mm_frames" -> (qMmFrames _),
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
    "q_mm_frames" ->
      """SELECT doc_id,
        | CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
        | CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled,
        | least(64, octet_length(encode(text))) AS first_frame_bytes
        |FROM documents ORDER BY doc_id LIMIT 100000""".stripMargin,
  )
}
