package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload round-trip, batched feature
  * extraction shape, and the REAL ImageIO decode path (generated PNGs →
  * magic sniff → decode → Graphics2D resize; fakeDecode stays the
  * fallback for non-image payloads). */
class MultimodalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  test("binary payload length matches source text (ASCII corpus)") {
    val n = Multimodal.qMmBytes(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    n.count() shouldBe docs.count()
    import org.apache.spark.sql.functions._
    val joined = n.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("n_chars"))
    joined.count() shouldBe 0L
  }

  test("feature extraction is deterministic, per-row, and schema-typed") {
    val f1 = Multimodal.qMmFeatures(spark, sf).collect()
    val f2 = Multimodal.qMmFeatures(spark, sf).collect()
    f1 shouldBe f2
    f1.length.toLong shouldBe spark.read.parquet(s"$sf/documents.parquet").count()
    all(f1.map(_.getInt(2))) should (be >= 16 and be <= 79)   // width
    all(f1.map(_.getInt(4))) shouldBe 3                        // channels
    // resize: fits 32×32, preserves which side is longer
    all(f1.map(_.getInt(5))) should be <= 32                   // rs_width
    all(f1.map(_.getInt(6))) should be <= 32                   // rs_height
    f1.foreach { r =>
      math.max(r.getInt(5), r.getInt(6)) shouldBe 32
      (r.getInt(2) >= r.getInt(3)) shouldBe (r.getInt(5) >= r.getInt(6))
    }
  }

  test("pngPayload is a real PNG and ImageIO decodes known dimensions") {
    // doc_id 5  → 13×8; doc_id 100 → 12×14 (w = 8 + id%16, h = 8 + (id/16)%16)
    val p5 = Multimodal.pngPayload(5L)
    p5.take(4) shouldBe Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    val img5 = Multimodal.decodeImage(p5).get
    (img5.getWidth, img5.getHeight, img5.getRaster.getNumBands) shouldBe ((13, 8, 3))
    val img100 = Multimodal.decodeImage(Multimodal.pngPayload(100L)).get
    (img100.getWidth, img100.getHeight) shouldBe ((12, 14))
    // non-image payloads are sniffed out and take the fallback
    Multimodal.decodeImage("just some text".getBytes("UTF-8")) shouldBe None
    // real resize produces exactly the stub-math target box
    Multimodal.realResize(img100) shouldBe Multimodal.resizeStub(12, 14)
  }

  test("q_mm_decode runs the real decode distributed, dims are id-derived") {
    val rows = Multimodal.qMmDecode(spark, sf).collect()
    rows.length.toLong shouldBe spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getInt(1) shouldBe (8 + (id % 16)).toInt            // width
      r.getInt(2) shouldBe (8 + ((id / 16) % 16)).toInt     // height
      r.getInt(3) shouldBe 3                                // channels
    }
  }

  test("aHash: uniform image → all-ones hash; identical images → equal hash") {
    def img(w: Int, h: Int)(px: (Int, Int) => Int) = {
      val i = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, px(x, y))
      i
    }
    // uniform: every block mean equals the overall mean, >= holds for
    // all 64 bits → both halves are the full 32-bit mask
    val uni = Multimodal.aHash(img(16, 16)((_, _) => 0x808080))
    uni shouldBe ((0xffffffffL, 0xffffffffL))
    // top-half dark, bottom-half light: exactly the bottom 4 block
    // rows (bits 32..63) are >= the overall mean
    val split = Multimodal.aHash(img(16, 16)((_, y) =>
      if (y < 8) 0x000000 else 0xffffff))
    split shouldBe ((0xffffffffL, 0L))
    // determinism / content-addressing: same pixels → same hash, one
    // changed pixel → (here) a different hash
    val a = Multimodal.aHash(img(20, 12)((x, y) => (x * 37 + y * 101) & 0xffffff))
    val b = Multimodal.aHash(img(20, 12)((x, y) => (x * 37 + y * 101) & 0xffffff))
    a shouldBe b
    // the dedup decision rides hash equality, exactly like md5(text)
    // in q_dedup_exact — pinned end-to-end by the q_mm_phash_dedup
    // oracle; this unit pin is the hash function's own contract
  }

  test("banded aHash near-dup is LOSSLESS at hamming <= 3: equals brute truth") {
    // brute truth from the collected hashes (500 docs -> 125k pairs,
    // driver-side): per doc, the (hamming, nbr)-min neighbor among ALL
    // pairs at hamming <= 3 — no banding anywhere in the truth path
    val hs = SparkEntry.queries("q_mm_phash_dedup")(spark, sf)
      .select("doc_id", "phash_hi", "phash_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = scala.collection.mutable.Map[Long, (Int, Long)]()
    for ((da, ha, la) <- hs; (db, hb, lb) <- hs if da != db) {
      val ham = java.lang.Long.bitCount(ha ^ hb) +
        java.lang.Long.bitCount(la ^ lb)
      val ord = implicitly[Ordering[(Int, Long)]]
      if (ham <= 3 && truth.get(da).forall(t => ord.lt((ham, db), t)))
        truth(da) = (ham, db)
    }
    val banded = SparkEntry.queries("q_mm_phash_near")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(1)))).toMap
    // pigeonhole (4 bands x 16 bits, radius 3): the banded result is
    // not merely a subset — it is EQUAL to the brute truth
    banded shouldBe truth.toMap
    banded.size should be > 0
  }
}
