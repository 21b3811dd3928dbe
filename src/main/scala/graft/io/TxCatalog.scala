package graft.io

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession,
  SQLContext}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete,
  SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation,
  TableScan}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL/catalog surface for [[TxTable]] — the DataSourceV2 `TableCatalog`
  * that lets plain SQL text reach transactional tables, including time
  * travel through Spark's own syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.tx", classOf[TxCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.tx.base", "/data/warehouse")
  *   spark.sql("CREATE TABLE tx.orders (…) TBLPROPERTIES ('cluster_key'='okey')")
  *   spark.sql("CREATE TABLE tx.t2 TBLPROPERTIES ('cluster_key'='k') AS SELECT …")
  *   spark.sql("SELECT * FROM tx.orders")                      // latest
  *   spark.sql("SELECT * FROM tx.orders VERSION AS OF 1")      // commit 1
  *   spark.sql("SELECT * FROM tx.orders TIMESTAMP AS OF '…'")  // by time
  *   spark.sql("INSERT INTO tx.orders SELECT …")               // append
  *   spark.sql("INSERT OVERWRITE tx.orders SELECT …")          // atomic replace
  *   spark.sql("ALTER TABLE tx.orders ADD COLUMNS (note STRING)") // meta-only
  *   spark.sql("DELETE FROM tx.orders WHERE …")                // MOR dv
  *   spark.sql("UPDATE tx.orders SET … WHERE …")               // COW
  *   spark.sql("MERGE INTO tx.orders USING … ON … WHEN …")     // COW
  *   spark.sql("SELECT * FROM tx.`orders$history`")            // commit log
  *   spark.readStream.table("tx.orders")                       // append stream
  * }}}
  *
  * This is the public lakehouse integration shape (Delta's
  * `DeltaCatalog` + `DeltaTableV2`): the catalog resolves identifiers
  * to table roots under its `base` directory (namespace segments are
  * subdirectories) and PINS the snapshot at load time, so one SQL
  * statement reads one consistent version even while writers commit.
  * `VERSION AS OF` routes through `loadTable(ident, version)` and
  * `TIMESTAMP AS OF` through `loadTable(ident, timestampMicros)` —
  * resolved against commit publish times ([[TxTable.versionAtTimestamp]]).
  *
  * Read execution has two tiers:
  *  - with [[graft.expressions.GraftExtensions]] installed, the
  *    [[graft.plans.TxCatalogReads]] analyzer rule swaps the relation
  *    for the native [[TxRelation]] plan — stats-pruned
  *    [[TxFileIndex]], vectorized parquet, whole-stage codegen, and
  *    the metadata-only count rewrite all apply to SQL text exactly as
  *    to the Scala API;
  *  - without extensions, the [[TxV2Table]] falls back to a `V1Scan`
  *    (full-fidelity MOR read, no file pruning) so the catalog is
  *    correct stand-alone.
  *
  * Writes: `INSERT INTO` appends via the V1 write fallback →
  * [[TxTable.append]]; `INSERT OVERWRITE` → [[TxTable.overwrite]]
  * (single-commit atomic replace); `ALTER TABLE ADD COLUMNS` →
  * [[TxTable.evolveSchema]] (meta-only widening); `DELETE FROM` via
  * `SupportsDelete` →
  * [[TxTable.deleteMorWhere]] (dv-only commits); `UPDATE` and
  * `MERGE INTO` via the [[graft.plans.TxCatalogReads]] command lowering
  * onto [[TxTable.updateWhere]]/[[TxTable.merge]]; `CREATE TABLE`/CTAS
  * require `TBLPROPERTIES ('cluster_key'='<col>')` — the layout
  * decision is never defaulted. Maintenance is SQL too:
  * `OPTIMIZE <t> [ZORDER BY (…)]` and `VACUUM <t> RETAIN FROM <v>`
  * via the [[graft.plans.TxSqlParser]] parser extension, resolved
  * against this catalog's pinned base ([[TxCatalog.resolveRoot]]).
  */
final class TxCatalog extends TableCatalog {

  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).getOrElse("/tmp")
  }

  override def name(): String = catalogName

  /** Identifiers are PATH SEGMENTS under base — a backtick-quoted name
    * carrying a separator or ".." would escape the base directory (and
    * dropTable DELETES directories), so refuse anything that is not a
    * plain segment. Applied to EVERY identifier/namespace consumer. */
  private def validated(segs: Seq[String]): Seq[String] = {
    segs.foreach { s =>
      require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
        s != "." && s != "..",
        s"illegal tx table identifier segment '$s'")
    }
    segs
  }

  private def rootOf(ident: Identifier): String =
    (base +: validated(ident.namespace.toSeq :+ ident.name)).mkString("/")

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val fullName =
      (catalogName +: (ident.namespace.toSeq :+ ident.name)).mkString(".")
    if (ident.name.endsWith("$history")) {
      // metadata table (the Iceberg `t$history` idiom): DESCRIBE
      // HISTORY as queryable SQL — one row per commit, pure log
      // metadata, pinned at load time like every other read.
      // VERSION/TIMESTAMP AS OF on the metadata table is refused, not
      // silently ignored (r11 advice): history is about ALL commits —
      // filter on its `version` column instead
      if (version.isDefined) throw new UnsupportedOperationException(
        s"VERSION/TIMESTAMP AS OF is not supported on $fullName — the " +
          "history table always lists every commit; filter its " +
          "`version` column instead")
      val root = (base +: validated(ident.namespace.toSeq :+
        ident.name.stripSuffix("$history"))).mkString("/")
      if (TxTable.versions(root).isEmpty) throw new NoSuchTableException(ident)
      return new TxHistoryTable(root, fullName)
    }
    val root = rootOf(ident)
    if (TxTable.versions(root).isEmpty) throw new NoSuchTableException(ident)
    new TxV2Table(root, TxTable.snapshot(root, version), fullName)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — Spark hands the literal as a string. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF <t>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident,
      Some(TxTable.versionAtTimestamp(rootOf(ident), timestampMicros / 1000L)))

  override def tableExists(ident: Identifier): Boolean =
    TxTable.versions(rootOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File(
      (base +: validated(namespace.toSeq)).mkString("/"))
    if (!dir.isDirectory) Array.empty
    else dir.listFiles().toSeq
      .filter(d => d.isDirectory && TxTable.versions(d.getPath).nonEmpty)
      .map(d => Identifier.of(namespace, d.getName)).toArray
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new java.io.File(rootOf(ident))
    val existed = TxTable.versions(dir.getPath).nonEmpty
    if (existed) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    existed
  }

  /** `CREATE TABLE tx.<t> (…) TBLPROPERTIES ('cluster_key'='<col>'
    * [, 'stats_cols'='a,b'])` — an empty meta-only v0 commit; CTAS then
    * appends the query result through the V1 write path (Spark's
    * non-staging catalog protocol: createTable, then AppendData). The
    * cluster key is REQUIRED: it is the table's layout/identity
    * decision and defaulting it silently would bake a wrong pruning
    * story into every later read. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "tx tables are range-clustered on the cluster key; PARTITIONED BY " +
        "is not supported")
    val key = Option(properties.get("cluster_key")).getOrElse(
      throw new IllegalArgumentException(
        "CREATE TABLE requires TBLPROPERTIES ('cluster_key'='<column>') — " +
          "the integral column the table clusters, prunes, and deletes by"))
    val statsCols = Option(properties.get("stats_cols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val root = rootOf(ident)
    TxTable.createEmpty(root, schema, key, statsCols)
    load(ident, None)
  }

  /** `ALTER TABLE tx.<t> ADD COLUMNS (…)` — a metadata-only
    * schema-widening commit ([[TxTable.evolveSchema]]); existing files
    * are never touched (absent columns read as null).
    * `RENAME COLUMN` / `DROP COLUMN` — metadata-only commits through
    * the column-id mapping ([[TxTable.renameColumn]] /
    * [[TxTable.dropColumn]]): files keep their stored (phys) column
    * names forever, renames re-label at read/write time, drops retire
    * the phys name so a re-add never resurrects stale bytes, and time
    * travel below the change replays the old meta. Only TOP-LEVEL
    * changes are supported — nested/position changes would silently
    * re-bind positional INSERTs, so they fail loudly instead. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    val adds = changes.flatMap {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 &&
          a.position() == null =>
        // NOT NULL adds are refused like Delta refuses them: every
        // pre-evolution row projects the column as null, so a
        // nullable=false field would let the optimizer constant-fold
        // `x IS NULL` to false over rows where it is in fact null
        if (!a.isNullable) throw new UnsupportedOperationException(
          s"ALTER ADD COLUMNS: '${a.fieldNames.head}' NOT NULL is not " +
            "supported — existing rows read added columns as null")
        val f = StructField(a.fieldNames.head, a.dataType, nullable = true)
        Some(if (a.comment != null) f.withComment(a.comment) else f)
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        TxTable.renameColumn(root, r.fieldNames.head, r.newName)
        None
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        TxTable.dropColumn(root, d.fieldNames.head)
        None
      case cc: TableChange.ColumnChange if cc.fieldNames.length > 1 =>
        // the column-id mapping covers TOP-LEVEL columns; a nested
        // field lives inside a stored parquet group, so a mapped
        // nested rename/drop would need per-file struct re-projection
        // plumbing the mapping doesn't model — refuse loudly and name
        // the explicit path instead of half-supporting it
        throw new UnsupportedOperationException(
          s"ALTER on nested field '${cc.fieldNames.mkString(".")}' is " +
            "not supported on tx tables — column-id mapping covers " +
            "top-level columns only. Workaround: rebuild into a new " +
            "table (CREATE + INSERT ... SELECT with a restructured " +
            "named_struct), rewriting data once instead of silently " +
            "re-binding stored nested bytes")
      case c => throw new UnsupportedOperationException(
        s"ALTER change $c not supported on tx tables (only top-level " +
          "ADD COLUMNS appended at the end, RENAME COLUMN and DROP " +
          "COLUMN — FIRST/AFTER positions would silently re-bind " +
          "positional INSERTs; layout changes go through OPTIMIZE)")
    }
    if (adds.nonEmpty) TxTable.evolveSchema(root, adds)
    load(ident, None)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

object TxCatalog {
  /** Resolve identifier parts to a table root via the session's CACHED
    * catalog instance (`CatalogManager`) — the SAME instance every
    * other SQL statement resolves against, with its base pinned at
    * `initialize` time, so the maintenance commands
    * (`OPTIMIZE`/`VACUUM`, [[graft.plans.TxSqlParser]]) can never
    * target a different root than the session's reads/writes (a
    * re-pointed conf key does not re-point an already-loaded catalog).
    * Single-part identifiers use the session's CURRENT catalog (the
    * `USE <cat>` state), like every other statement. Path-segment
    * validation and base-joining are the catalog's own `rootOf` — one
    * copy of the escape-the-base check. A non-tx catalog is refused
    * loudly: OPTIMIZE against some other catalog's table must never
    * resolve into a bogus path. */
  def resolveRoot(spark: SparkSession, parts: Seq[String]): String = {
    require(parts.nonEmpty, "empty table identifier")
    val cm = spark.sessionState.catalogManager
    val (plugin, segs) =
      if (parts.size == 1) (cm.currentCatalog, parts)
      else (cm.catalog(parts.head), parts.tail)
    plugin match {
      case tx: TxCatalog =>
        tx.rootOf(Identifier.of(segs.init.toArray, segs.last))
      case other => throw new IllegalArgumentException(
        s"'${other.name()}' is not a registered tx catalog — " +
          "OPTIMIZE/VACUUM apply only to tx tables")
    }
  }
}

/** One loaded tx table, snapshot pinned at `loadTable` time (statement-
  * level snapshot isolation — the version a query analyzed against is
  * the version it reads, commits racing the query notwithstanding). */
final class TxV2Table(val root: String, val snap: TxTable.Snapshot,
    identName: String) extends Table with SupportsRead with SupportsWrite
    with SupportsDelete {

  override def name(): String = identName
  override def schema(): StructType = snap.schema

  // TRUNCATE (not OVERWRITE_BY_FILTER): a full INSERT OVERWRITE lowers
  // to an always-true OverwriteByExpression, which TRUNCATE admits;
  // advertising the filter capability without a SupportsOverwrite
  // builder would let filter overwrites pass analysis and then die in
  // write planning — refusing them at analysis is the loud path
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def properties(): util.Map[String, String] =
    Map("location" -> root, "provider" -> "graft-tx",
      "cluster_key" -> snap.key, "snapshot_version" -> snap.version.toString)
      .asJava

  /** Stand-alone read path (no extensions): a `V1Scan` over the pinned
    * snapshot's MOR relation. Correct but unpruned — the
    * [[graft.plans.TxCatalogReads]] rule replaces the whole relation
    * with the stats-pruning native plan before this is ever built. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = snap.schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = snap.schema
            override def buildScan(): RDD[Row] =
              TxRelation.readPinned(context.sparkSession, root, snap).rdd
          }.asInstanceOf[T]
      }
    }

  /** `DELETE FROM tx.<t> WHERE …` — the filters Spark pushes translate
    * to a Column condition over [[TxTable.deleteMorWhere]]: kilobytes
    * written (a deletion-vector commit), zero data files rewritten,
    * stats-pruned dead-key scan, strict-commit concurrency. An
    * untranslatable condition fails analysis loudly (no silent
    * full-scan fallback); a bare DELETE FROM (no WHERE) tombstones
    * everything — compaction reclaims. */
  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(f => TxV2Table.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val cond = filters.toSeq.map(f => TxV2Table.filterToColumn(f).getOrElse(
      throw new UnsupportedOperationException(s"untranslatable filter $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    TxTable.deleteMorWhere(SparkSession.active, root, cond)
  }

  /** `INSERT INTO` → [[TxTable.append]] (blind-rebase atomic commit,
    * stats collected); `INSERT OVERWRITE` → [[TxTable.overwrite]]: the
    * planner marks the builder via `SupportsTruncate.truncate()` (a
    * full-table `INSERT OVERWRITE` lowers to OverwriteByExpression with
    * an always-true condition), and ONE commit swaps the live file set
    * — readers see old or new, never a mix, and the pre-overwrite
    * version stays travelable. The analyzer has already cast/reordered
    * the query to the table schema; append/overwrite re-align by name. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              if (replace || overwrite)
                TxTable.overwrite(data.sparkSession, root, data)
              else TxTable.append(data.sparkSession, root, data)
          }
      }
    }
}

/** Read-only metadata table behind `tx.`<t>$history``: the commit log
  * as rows (version, action tallies, rows added, schema_change) —
  * [[TxTable.history]] materialized at LOAD time (statement-level
  * pinning, like every tx read; the log slice is O(#commits) driver
  * metadata, never data I/O). No write/delete capabilities: DML against
  * a metadata table fails analysis. */
final class TxHistoryTable(root: String, identName: String)
    extends Table with SupportsRead {

  private val pinned: DataFrame =
    TxTable.history(SparkSession.active, root).orderBy("version")
  private val rows: Seq[Row] = pinned.collect().toSeq

  override def name(): String = identName
  override def schema(): StructType = pinned.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = pinned.schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = pinned.schema
            override def buildScan(): RDD[Row] =
              context.sparkContext.parallelize(rows, 1)
          }.asInstanceOf[T]
      }
    }
}

object TxV2Table {
  /** V1 source Filter → Column, total on the shapes SQL DELETE
    * produces; None marks an untranslatable filter (canDeleteWhere
    * then refuses and analysis fails loudly). */
  private[io] def filterToColumn(f: sources.Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case sources.Not(c) => filterToColumn(c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
}
