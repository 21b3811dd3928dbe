package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable,
  LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
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
    case r: DataSourceV2Relation if r.table.isInstanceOf[TxV2Table] =>
      convert(r)
    case other =>
      other.mapChildren(rewrite).transformExpressions {
        case s: SubqueryExpression => s.withNewPlan(rewrite(s.plan))
      }
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
