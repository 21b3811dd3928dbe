package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload round-trip + batched feature
  * extraction shape (decode itself is a documented deterministic stub). */
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
}
