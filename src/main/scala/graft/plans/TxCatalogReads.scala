package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction,
  DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, Project,
  SubqueryAlias, UpdateAction, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.io.{TxRelation, TxV2Table}

/** Analyzer (post-hoc resolution) rule that swaps every READ of a
  * [[graft.io.TxCatalog]] table for the native [[TxRelation]] plan —
  * the `HadoopFsRelation` whose `FileIndex` is the manifest. This is
  * how SQL text over `tx.<table>` gets the SAME physical excellence as
  * the Scala API: Catalyst pushes the statement's conjuncts into
  * [[graft.io.TxFileIndex]] (stats-pruned file skipping), the
  * vectorized parquet reader and whole-stage codegen apply, and the
  * [[TxMetadataCount]] optimizer rule can still collapse a bare
  * `count(*)` to manifest arithmetic. (The public analogue is Delta's
  * `DeltaAnalysis` turning `DeltaTableV2` into a `TahoeFileIndex`
  * relation.) Without this rule the catalog still reads correctly
  * through its `V1Scan` fallback — just unpruned.
  *
  * The snapshot was PINNED at `loadTable` time, so the converted plan
  * reads exactly the version the statement resolved (`VERSION AS OF` /
  * `TIMESTAMP AS OF` included). Write commands keep their
  * DataSourceV2 TARGET (the V1 write fallback needs it) — only their
  * source queries are rewritten, as are subquery expressions.
  */
class TxCatalogReads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand =>
      // never convert the write target; INSERT's source may read tx
      w.withNewQuery(rewrite(w.query))
    case d: DeleteFromTable =>
      // DELETE plans against the DSv2 table's SupportsDelete — the
      // target must stay a DSv2 relation
      d
    case u: UpdateTable if u.resolved && txTableOf(u.table).isDefined =>
      // no SupportsRowLevelOperations tier exists here; UPDATE lowers
      // to the format's own copy-on-write writer (the Delta shape)
      TxUpdateCommand(txTableOf(u.table).get.root,
        u.assignments, u.condition)
    case m: MergeIntoTable if m.resolved &&
        txTableOf(m.targetTable).isDefined =>
      convertMerge(m, txTableOf(m.targetTable).get)
    case r: DataSourceV2Relation if r.table.isInstanceOf[TxV2Table] =>
      convert(r)
    case s: StreamingRelationV2 if s.table.isInstanceOf[TxV2Table] =>
      // `spark.readStream.table("tx.<t>")`: the DSv2 streaming relation
      // becomes the V1 tx-append source (initial snapshot + pure-append
      // commit tail; change commits fail loudly or skip per option) —
      // reader options (skipChangeCommits, startingVersion,
      // maxVersionsPerBatch) pass through from `.option(...)`
      convertStream(s)
    case other =>
      other.mapChildren(rewrite).transformExpressions {
        case s: SubqueryExpression => s.withNewPlan(rewrite(s.plan))
      }
  }

  /** The TxV2Table behind a DML target, looking through the
    * SubqueryAlias resolution wraps. */
  private def txTableOf(plan: LogicalPlan): Option[TxV2Table] = plan match {
    case SubqueryAlias(_, child) => txTableOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: TxV2Table => Some(t)
      case _ => None
    }
    case _ => None
  }

  /** MERGE INTO → [[TxMergeCommand]] when the statement fits the
    * source-side-computable canon (see the command's scaladoc); every
    * other shape is refused loudly with a pointer to TxTable.merge. */
  private def convertMerge(m: MergeIntoTable, t: TxV2Table): LogicalPlan = {
    def unsupported(msg: String): Nothing =
      throw new UnsupportedOperationException(
        s"tx MERGE: $msg (TxTable.merge is the general door)")
    if (m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION is not supported")
    val key = t.snap.key
    val tgtOut = m.targetTable.outputSet
    val srcOut = m.sourceTable.outputSet
    def isKey(e: Expression): Boolean = e match {
      case a: AttributeReference => tgtOut.contains(a) && a.name == key
      case _ => false
    }
    val keyExpr = m.mergeCondition match {
      case EqualTo(l, r) if isKey(l) && r.references.subsetOf(srcOut) => r
      case EqualTo(l, r) if isKey(r) && l.references.subsetOf(srcOut) => l
      case other => unsupported(
        s"ON must be an equality on the cluster key '$key' against a " +
          s"source expression (candidate-file pruning rides it); got $other")
    }
    val exprs = (m.matchedActions ++ m.notMatchedActions).flatMap {
      case u: UpdateAction => u.condition.toSeq ++ u.assignments.map(_.value)
      case d: DeleteAction => d.condition.toSeq
      case i: InsertAction => i.condition.toSeq ++ i.assignments.map(_.value)
      case other => unsupported(s"unsupported action $other")
    }
    exprs.filterNot(_.references.subsetOf(srcOut)).foreach { e =>
      unsupported(s"'${e.sql}' references target columns — only " +
        "source-side conditions/payloads are supported here")
    }
    // NOT MATCHED BY SOURCE is the mirror image: its rows have NO
    // source side, so conditions/assignments must be TARGET-only
    val bsExprs = m.notMatchedBySourceActions.flatMap {
      case u: UpdateAction => u.condition.toSeq ++ u.assignments.map(_.value)
      case d: DeleteAction => d.condition.toSeq
      case other => unsupported(
        s"unsupported NOT MATCHED BY SOURCE action $other")
    }
    bsExprs.filterNot(_.references.subsetOf(tgtOut)).foreach { e =>
      unsupported(s"'${e.sql}' references source columns — NOT MATCHED " +
        "BY SOURCE rows have no source side, so only target columns " +
        "may appear")
    }
    TxMergeCommand(t.root, key, m.sourceTable, m.sourceTable.output,
      keyExpr, m.matchedActions, m.notMatchedActions,
      m.notMatchedBySourceActions)
  }

  /** Streaming table read → [[graft.io.TxAppendSourceProvider]] via the
    * V1 streaming relation (the `format("tx-append")` node), output
    * re-exposed under the already-resolved attribute ids. */
  private def convertStream(s: StreamingRelationV2): LogicalPlan = {
    val t = s.table.asInstanceOf[TxV2Table]
    import scala.jdk.CollectionConverters._
    val inner = org.apache.spark.sql.GraftStreamingShim.v1StreamingRelation(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      "tx-append", s.extraOptions.asScala.toMap + ("root" -> t.root))
    Project(s.output.zip(inner.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, inner)
  }

  private def convert(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[TxV2Table]
    val inner = TxRelation.readPinned(spark, t.root, t.snap)
      .queryExecution.analyzed
    // re-expose the native plan's output under the attribute ids the
    // rest of the statement already resolved against
    Project(r.output.zip(inner.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, inner)
  }
}
