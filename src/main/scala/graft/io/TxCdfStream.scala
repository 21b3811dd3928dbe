package graft.io

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
  ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STREAMING change-data-feed source over the [[TxTable]] commit log —
  * the micro-batch twin of the batch [[TxTable.changes]]: offsets ARE
  * committed versions, every micro-batch is `changes(fromV, toV]` for
  * its offset range (reading only the files those commits touched —
  * O(changed data), never a table scan), and a `commit_v` column
  * stamps each row with its range end so downstream consumers see the
  * per-commit decomposition. This is the public lakehouse recipe
  * (Delta's streaming source: the log is the write-ahead log, readers
  * tail it), and the shape the incremental-dedup chain consumes — only
  * the day's commits ever move, which is the whole 100 TB story.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("tx-cdf")
  *     .option("root", "/data/tx/orders")
  *     .option("startingVersion", "0")     // emit changes AFTER this
  *     .option("maxVersionsPerBatch", "1") // per-commit batches
  *     .load()
  * }}}
  *
  * Exactly-once: offsets live in the query's checkpoint; a restart
  * resumes from the last committed version and replays nothing (the
  * commit log is immutable history, so `changes` over a fixed range is
  * deterministic — TxCdfStreamSpec pins restart behavior). Admission
  * control ([[SupportsAdmissionControl]]) bounds each batch to
  * `maxVersionsPerBatch` commits; Trigger.AvailableNow drains to the
  * version captured at query start, in those same bounded steps.
  * VACUUM interaction: ranges below the retention floor fail loudly at
  * [[TxTable.snapshot]]'s gate — set `startingVersion` at or above the
  * floor. */
final class TxCdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "tx-cdf"

  private def cdfSchema(root: String): StructType = {
    val s = TxTable.snapshot(root)
    new StructType(s.schema.fields)
      .add("change_type", StringType).add("commit_v", LongType)
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]):
      (String, StructType) =
    ("tx-cdf", cdfSchema(parameters.getOrElse("root",
      throw new IllegalArgumentException("tx-cdf requires option 'root'"))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("tx-cdf requires option 'root'"))
    new TxCdfSource(ctx, root, cdfSchema(root),
      parameters.getOrElse("startingVersion", "0").toLong,
      parameters.getOrElse("maxVersionsPerBatch", "1").toInt)
  }
}

/** Shared V1 admission-control scaffolding for tx streaming sources
  * whose OFFSETS ARE COMMITTED VERSIONS ([[TxCdfSource]],
  * [[TxAppendSource]]): offset (de)serialization, the AvailableNow
  * drain target, the per-batch version clamp, and the no-op
  * commit/stop lifecycle. Offset handling has exactly one home — the
  * two sources cannot drift. */
private[io] trait VersionOffsetSource extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  protected def root: String

  /** AvailableNow drain target, captured once at query start. */
  @volatile private var availableTarget: Long = -1L

  protected def toV(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = TxTable.versions(root).max

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Newest admissible end version from `cur`: the log head, clamped
    * to the AvailableNow target and to `cur + maxPerBatch`. */
  protected def clampTarget(cur: Long, maxPerBatch: Int): Long = {
    val newest = TxTable.versions(root).max
    val target =
      if (availableTarget >= 0) math.min(newest, availableTarget) else newest
    math.min(target, cur + maxPerBatch).max(cur)
  }

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control path")

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[io] final class TxCdfSource(ctx: SQLContext,
    protected val root: String, override val schema: StructType,
    startingVersion: Long, maxVersionsPerBatch: Int)
    extends VersionOffsetSource {
  require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")

  /** The column-id mapping matching the DECLARED stream schema, captured
    * at source creation — the translation anchor for slice alignment:
    * a commit's slice reads under ITS version's logical names, and ids
    * (stable for a column's lifetime) are what connect those names to
    * the declared schema across renames in either direction. */
  private val headCols: Seq[TxTable.TxCol] = TxTable.snapshot(root).colMap
  private val headIdOf: Map[String, Int] =
    headCols.map(c => c.name -> c.id).toMap

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val cur = Option(start).map(toV).getOrElse(startingVersion)
    LongOffset(clampTarget(cur, maxVersionsPerBatch))
  }

  /** One micro-batch = the union of PER-COMMIT CDF slices
    * `(v−1, v]` for v in `(start, end]`, each stamped with ITS OWN
    * commit version — so `commit_v` is exact however many commits a
    * batch covers (with maxVersionsPerBatch > 1 the old range-end
    * stamp misattributed interior commits' rows; r11 advice). The
    * per-commit diffs still run the full stats-pruned batch machinery
    * of [[TxTable.changes]], and the slice count is bounded by the
    * admission control (`maxVersionsPerBatch`). The plan is wrapped as
    * a streaming-flagged `LogicalRDD` (the FileStreamSource recipe via
    * [[GraftStreamingShim]]). */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(o => toV(o)).getOrElse(startingVersion)
    val e = toV(end)
    val df =
      if (e <= s) // engine replays an empty range on some restarts
        ctx.sparkSession.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else (s + 1 to e).map { v =>
        val slice = TxTable.changes(ctx.sparkSession, root, v - 1, v)
          .withColumn("commit_v", lit(v))
        // changes() emits key-first; the shim binds the RDD to the
        // declared schema PURELY BY POSITION, so reorder explicitly —
        // a non-leading cluster key would otherwise read swapped slots.
        // Alignment is BY COLUMN ID, not logical name (r19 advice): a
        // slice reads under its OWN version's logical names, so after a
        // RENAME a name-keyed alignment would silently NULL the renamed
        // column's data for every pre-rename commit in a from-scratch
        // replay (checkpoint loss). The id is stable for the column's
        // lifetime — translate declared name → head id → that id's name
        // at the slice's version. Only a column truly absent at v
        // (added later, or dropped-and-re-added: fresh id) NULL-fills,
        // exactly how the table itself reads pre-evolution rows.
        val nameAtV = TxTable.snapshot(root, Some(v)).colMap
          .map(c => c.id -> c.name).toMap
        val have = slice.columns.toSet
        slice.select(schema.fields.map { f =>
          if (f.name == "change_type" || f.name == "commit_v") col(f.name)
          else headIdOf.get(f.name).flatMap(nameAtV.get) match {
            case Some(n) if have(n) => col(n).as(f.name)
            case _ => lit(null).cast(f.dataType).as(f.name)
          }
        }.toSeq: _*)
      }.reduce(_ unionAll _)
    GraftStreamingShim.streamingDataFrame(
      ctx.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      schema, df.queryExecution.toRdd)
  }
}
