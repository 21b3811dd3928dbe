package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.io.TxFileIndex

/** Optimizer rule: an unfiltered, ungrouped `count(*)` over a tx-table
  * relation (io/TxRelation.scala) collapses to a one-row
  * `LocalRelation` computed from the MANIFEST — the add actions carry
  * exact per-file row counts, so the 100 TB `SELECT count(*) FROM t`
  * answers in O(#files) driver metadata without opening a byte of
  * parquet. This is the optimizer-integrated twin of
  * `TxTable.countRows`: the user writes ordinary SQL/DataFrame code
  * (`tx.groupBy().count()`, `SELECT count(*) FROM v`) and Catalyst
  * substitutes the metadata answer; no side API to know about.
  *
  * Strictly conservative match — the rewrite fires only when the count
  * is provably the full live row count:
  *  - grouping is empty and every aggregate is `count(1)`/`count(*)`
  *    (no DISTINCT, no agg filter);
  *  - the child is the bare tx relation, optionally under
  *    attribute-only Projects (column pruning's residue) — any Filter,
  *    Join, or expressionful Project blocks the rewrite;
  *  - the relation's snapshot has no deletion vectors (a MOR table's
  *    read plan carries an anti-join anyway, which already fails the
  *    bare-relation test — the flag is defense in depth).
  * Everything else falls through to the normal scan-and-count plan. */
object TxMetadataCount extends Rule[LogicalPlan] {

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(_, _))), Complete, false,
      None, _) => true
    case _ => false
  }

  /** The TxFileIndex under attribute-only Projects, if that is ALL
    * there is between the Aggregate and the relation. */
  private def bareTxIndex(plan: LogicalPlan): Option[TxFileIndex] =
    plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
        bareTxIndex(child)
      case LogicalRelation(
          HadoopFsRelation(idx: TxFileIndex, _, _, _, _, _), _, _, _, _) =>
        Some(idx)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall {
          case Alias(ae: AggregateExpression, _) => isCountStar(ae)
          case _ => false
        } =>
      bareTxIndex(child) match {
        case Some(idx) if !idx.hasDvs =>
          val n = idx.totalRows
          LocalRelation(
            aggExprs.map(_.toAttribute),
            Seq(InternalRow.fromSeq(aggExprs.map(_ => n))))
        case _ => agg // untracked shape: keep the node untouched
      }
  }
}
