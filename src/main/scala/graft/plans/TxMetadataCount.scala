package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.io.TxFileIndex

/** Optimizer rule: unfiltered, ungrouped manifest-answerable aggregates
  * over a tx-table relation (io/TxRelation.scala) collapse to a
  * one-row `LocalRelation` computed from the MANIFEST — the add
  * actions carry exact per-file row counts and cluster-key [min, max],
  * so the 100 TB `SELECT count(*) / min(key) / max(key) FROM t`
  * answers in O(#files) driver metadata without opening a byte of
  * parquet (the public OptimizeMetadataOnlyQuery shape). The user
  * writes ordinary SQL/DataFrame code; Catalyst substitutes the
  * metadata answer — no side API to know about
  * (`TxTable.countRows` is the explicit twin).
  *
  * Strictly conservative match — the rewrite fires only when every
  * aggregate is provably manifest-answerable:
  *  - grouping is empty; each aggregate is `count(1)`/`count(*)`, or
  *    `min`/`max` of the bare INTEGRAL cluster-key column (whose
  *    per-file minK/maxK are exact longs in every add action; other
  *    columns' stats are advisory doubles and never answer queries);
  *  - the child is the bare tx relation, optionally under
  *    attribute-only Projects (column pruning's residue) — any Filter,
  *    Join, expressionful Project, or alias blocks the rewrite;
  *  - the relation's snapshot has no deletion vectors (a tombstoned
  *    row may hold the extreme; a MOR read plan carries an anti-join
  *    anyway, which already fails the bare-relation test — the flag is
  *    defense in depth).
  * Everything else falls through to the normal scan plan. */
object TxMetadataCount extends Rule[LogicalPlan] {

  private sealed trait MetaAgg
  private case object CountAll extends MetaAgg
  private case object MinKey extends MetaAgg
  private case object MaxKey extends MetaAgg

  private def integralKey(idx: TxFileIndex): Boolean = idx.keyType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def classify(e: AggregateExpression,
      idx: TxFileIndex): Option[MetaAgg] = e match {
    case AggregateExpression(Count(Seq(Literal(_, _))), Complete, false,
      None, _) => Some(CountAll)
    case AggregateExpression(Min(a: Attribute), Complete, false, None, _)
      if a.name == idx.keyName && integralKey(idx) => Some(MinKey)
    case AggregateExpression(Max(a: Attribute), Complete, false, None, _)
      if a.name == idx.keyName && integralKey(idx) => Some(MaxKey)
    case _ => None
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

  /** Manifest long → the key column's runtime value (exact: the key is
    * integral by [[integralKey]]); an empty table yields SQL NULL,
    * matching min/max over zero rows. */
  private def keyVal(idx: TxFileIndex, v: Option[Long]): Any = v match {
    case None => null
    case Some(x) => idx.keyType match {
      case LongType => x
      case IntegerType => x.toInt
      case _ => null // unreachable under integralKey
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      bareTxIndex(child) match {
        case Some(idx) if !idx.hasDvs =>
          val classed = aggExprs.map {
            case Alias(ae: AggregateExpression, _) => classify(ae, idx)
            case _ => None
          }
          if (classed.forall(_.isDefined)) {
            val values = classed.map(_.get).map {
              case CountAll => idx.totalRows
              case MinKey => keyVal(idx, idx.minKey)
              case MaxKey => keyVal(idx, idx.maxKey)
            }
            LocalRelation(aggExprs.map(_.toAttribute),
              Seq(InternalRow.fromSeq(values)))
          } else agg // some aggregate needs real data: keep the scan
        case _ => agg // untracked shape: keep the node untouched
      }
  }
}
