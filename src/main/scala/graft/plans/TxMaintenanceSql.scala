package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface,
  ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType,
  StructType}

import graft.io.{TxCatalog, TxTable}

/** SQL surface for the tx tier's MAINTENANCE acts — the two commands
  * Spark's grammar does not carry, added the public lakehouse way
  * (Delta's `OPTIMIZE` / `VACUUM` SQL via a delegating parser
  * extension, `SparkSessionExtensions.injectParser`):
  *
  * {{{
  *   OPTIMIZE tx.orders                          -- bin-pack compaction
  *   OPTIMIZE tx.orders ZORDER BY (ckey, okey)   -- multi-dim recluster
  *   VACUUM tx.orders RETAIN FROM 3              -- GC below version 3
  * }}}
  *
  * Everything else passes VERBATIM to the session parser — this parser
  * recognizes exactly two statement shapes by regex and never rewrites
  * SQL it does not own. `VACUUM` requires an explicit `RETAIN FROM`
  * horizon (defaulting a GC horizon silently is how tables lose their
  * history); both commands return their outcome as rows (new version /
  * reclaimed file count), the Delta convention. Identifier resolution
  * happens at RUN time against the session's CACHED catalog instance
  * ([[TxCatalog.resolveRoot]] via `CatalogManager`) — the same
  * instance, same pinned base, every other SQL statement resolves
  * against; single-part identifiers follow the session's current
  * catalog (`USE <cat>`), exactly like the analyzer path. */
final class TxSqlParser(delegate: ParserInterface)
    extends ParserInterface {

  // identifier = dot-separated plain or backtick-quoted segments —
  // quoted segments admit everything the catalog's own validation does
  // (hyphens, spaces), so any CREATE-able table is also OPTIMIZE-able
  private val Ident = """(?:[\w$]+|`[^`]+`)(?:\.(?:[\w$]+|`[^`]+`))*"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+(""" + Ident +
      """)\s*(?:ZORDER\s+BY\s*\(([^)]*)\)\s*)?;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+(""" + Ident +
      """)\s+RETAIN\s+FROM\s+(\d+)\s*;?\s*$""").r

  private def maybeCommand(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(tbl, zorder) =>
        val cols = Option(zorder).toSeq.flatMap(_.split(",").toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        // a present-but-degenerate list must not silently demote the
        // statement to a plain compact
        if (zorder != null && cols.isEmpty) throw new IllegalArgumentException(
          s"OPTIMIZE ZORDER BY: no columns in '($zorder)'")
        Some(TxOptimizeCommand(delegate.parseMultipartIdentifier(tbl), cols))
      case VacuumRe(tbl, v) =>
        Some(TxVacuumCommand(delegate.parseMultipartIdentifier(tbl), v.toLong))
      case _ => None
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    maybeCommand(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    maybeCommand(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `OPTIMIZE <tbl> [ZORDER BY (cols)]`: bin-pack compaction, or the
  * multi-dimensional Z-order recluster when dims are given — both drop
  * a log checkpoint at the new version. Returns (version, operation). */
final case class TxOptimizeCommand(parts: Seq[String],
    zorderBy: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = TxCatalog.resolveRoot(spark, parts)
    if (zorderBy.nonEmpty)
      Seq(Row(TxTable.optimize(spark, root, zorderBy),
        s"zorder(${zorderBy.mkString(",")})"))
    else Seq(Row(TxTable.compact(spark, root), "compact"))
  }
}

/** `VACUUM <tbl> RETAIN FROM <version>`: raise the retention floor to
  * `version` and reclaim files unreferenced by any retained version
  * (in-flight-writer age guard applies). Returns the reclaimed count. */
final case class TxVacuumCommand(parts: Seq[String],
    retainFrom: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = TxCatalog.resolveRoot(spark, parts)
    Seq(Row(TxTable.vacuum(root, retainFrom).size.toLong))
  }
}
