package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q_train_prep emits the shard MANIFEST; this spec performs the write
  * it describes — the per-doc frame landed as partitioned parquet, one
  * directory per (split, shard), the physical layout a training data
  * loader mounts — and proves a FRESH read reproduces the manifest
  * exactly-once: same per-shard counts and token sums, same doc_id
  * content (order-insensitive hash), no duplicates, no losses. */
class ShardRoundTripSpec extends AnyFunSuite with Matchers {
  import TestSpark.{sf, spark}

  private val outDir = "/tmp/graft_shards"

  private def cleanDir(p: String): Unit = {
    val f = new java.io.File(p)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
  }

  test("packed shards round-trip: fresh read reproduces the manifest exactly-once") {
    cleanDir(outDir)
    val docs = graft.ops.LlmOps.trainPrepDocs(spark, sf)
    docs.write.partitionBy("split", "shard").parquet(outDir)

    // one directory per manifest row, and nothing else
    val manifest = SparkEntry.queries("q_train_prep")(spark, sf).collect()
    manifest.length should be > 0
    val expectDirs = manifest.map(r =>
      s"split=${r.getAs[String]("split")}/shard=${r.getAs[Long]("shard")}").toSet
    val actualDirs = for {
      s <- new java.io.File(outDir).listFiles().toSeq
      if s.isDirectory
      h <- s.listFiles().toSeq if h.isDirectory
    } yield s"${s.getName}/${h.getName}"
    actualDirs.toSet shouldBe expectDirs

    // fresh read → identical manifest (counts AND token sums); partition
    // directory values infer as INT — normalize back to the written LONG
    val readBack = spark.read.parquet(outDir)
      .withColumn("shard", col("shard").cast("long"))
    val reAgg = readBack.groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_toks"))
      .orderBy("split", "shard").collect()
    reAgg.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe
      manifest.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq

    // content equality, not just counts: per-shard order-insensitive
    // doc_id hash (sum AND xor of md5-derived longs) matches the
    // pre-write frame — exactly-once landing, no substituted rows.
    // Both aggregates on purpose: xor alone cancels pairs of identical
    // per-row hashes (an even number of duplicated doc_ids would slip
    // through), the wrapping sum catches exactly that case.
    def contentHash(df: org.apache.spark.sql.DataFrame) = df
      .select(col("split"), col("shard"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("split", "shard")
      .agg(expr("bit_xor(h)").as("hx"), // order-insensitive, overflow-free
        // 40-bit mask before the sum: ANSI mode faults a wrapping
        // sum(60-bit); 2^40 · rows stays < 2^63 up to ~8M rows/shard
        sum(col("h").bitwiseAND(lit((1L << 40) - 1))).as("hs"),
        count(lit(1)).as("n"))
      .orderBy("split", "shard")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    contentHash(readBack) shouldBe contentHash(docs)

    // global exactly-once: no doc appears twice, none lost
    readBack.count() shouldBe docs.count()
    readBack.select("doc_id").distinct().count() shouldBe docs.count()
  }
}
