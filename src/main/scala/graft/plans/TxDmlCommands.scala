package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, LogicalPlan, MergeAction, UpdateAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{broadcast, col, lit, when}

/** SQL-DML lowering helpers: resolved plan Expressions are re-bound BY
  * NAME (AttributeReference → UnresolvedAttribute) into Columns, so the
  * command can apply them to whatever DataFrame the TxTable writer
  * builds internally — the exprIds of the statement's relation don't
  * survive into the rewrite read, the names do. */
private[plans] object TxDml {
  def byName(e: Expression): Column = GraftSqlShim.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  })

  def nameOf(e: Expression): String = e match {
    case a: Attribute => a.name
    case u: UnresolvedAttribute => u.name
    case other => throw new UnsupportedOperationException(
      s"assignment target must be a plain column, got $other")
  }
}

/** `UPDATE tx.<t> SET … WHERE …` lowered onto [[graft.io.TxTable
  * .updateWhere]] — the Delta-analysis shape (a resolved DML plan
  * becomes a runnable command over the format's own writer): stats-
  * pruned candidate files, copy-on-write rewrite, assignments evaluated
  * against pre-update rows, strict-commit concurrency, time travel
  * intact. Constructed by [[TxCatalogReads]]. */
final case class TxUpdateCommand(root: String,
    assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val sets = assignments.map(a =>
      TxDml.nameOf(a.key) -> TxDml.byName(a.value))
    graft.io.TxTable.updateWhere(spark, root,
      condition.map(TxDml.byName).getOrElse(lit(true)), sets)
    Seq.empty
  }
}

/** `MERGE INTO tx.<t> USING … ON … WHEN …` lowered onto
  * [[graft.io.TxTable.merge]] (one COW pass over the candidate files).
  * Supported = the canonical shapes whose conditions and payloads are
  * computable from the SOURCE SIDE ALONE plus a matched flag:
  *  - ON `target.<clusterKey> = <source expr>` (equality on the key —
  *    candidate-file pruning depends on it);
  *  - WHEN MATCHED: at most one UPDATE assigning EVERY non-key column,
  *    and/or one DELETE, each optionally conditioned on source columns;
  *  - WHEN NOT MATCHED: at most one INSERT (full column list);
  *  - conditions/assignments referencing TARGET columns (beyond the
  *    key), WHEN NOT MATCHED BY SOURCE, and schema evolution are
  *    refused loudly — those need the row-level-operation tier; the
  *    Scala `TxTable.merge` remains the general door.
  * The matched flag is one semi-probe of the source keys against the
  * live target keys (column-pruned key scan + broadcast of the
  * source-key set); the merge itself re-validates under its own
  * strict-commit loop. */
final case class TxMergeCommand(root: String, keyName: String,
    source: LogicalPlan, sourceOutput: Seq[Attribute], keyExpr: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.io.TxTable.snapshot(root)
    val nonKey = snap.schema.fieldNames.filterNot(_ == keyName).toSeq

    val updAct = matchedActions.collect { case u: UpdateAction => u }
    val delAct = matchedActions.collect { case d: DeleteAction => d }
    val insAct = notMatchedActions.collect { case i: InsertAction => i }
    require(updAct.size <= 1 && delAct.size <= 1 && insAct.size <= 1 &&
      matchedActions.size == updAct.size + delAct.size &&
      notMatchedActions.size == insAct.size,
      "tx MERGE supports at most one matched UPDATE, one matched DELETE " +
        "and one not-matched INSERT; use TxTable.merge for other shapes")

    def assignMap(as: Seq[Assignment]): Map[String, Column] =
      as.map(a => TxDml.nameOf(a.key) -> TxDml.byName(a.value)).toMap
    val upd = updAct.headOption.map(u => assignMap(u.assignments))
    val ins = insAct.headOption.map(i => assignMap(i.assignments))
    upd.foreach { m =>
      val missing = nonKey.filterNot(m.contains)
      require(missing.isEmpty,
        s"matched UPDATE must assign every non-key column (missing " +
          s"${missing.mkString(", ")}); partial updates keep target " +
          "values, which needs the row-level tier — use UPDATE … WHERE " +
          "or TxTable.merge")
    }
    ins.foreach { m =>
      val missing = nonKey.filterNot(m.contains)
      require(missing.isEmpty,
        s"not-matched INSERT must assign every non-key column (missing " +
          s"${missing.mkString(", ")})")
    }

    val src = GraftSqlShim.dataFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], source)
    // matched flag: source keys semi-probed against the live target
    // keys (a column-pruned key scan; the source-key set broadcasts)
    val k = TxDml.byName(keyExpr)
    val tgtKeys = graft.io.TxRelation.read(spark, root)
      .select(col(keyName).cast("long").as("__tk")).distinct()
    val flagged = src.withColumn("__k", k)
      .join(broadcast(tgtKeys), col("__k").cast("long") === col("__tk"),
        "left")
      .withColumn("__matched", col("__tk").isNotNull)

    // first-match-wins action chain (SQL MERGE's clause order)
    def chain(actions: Seq[(Option[Expression], String)]): Column =
      actions.foldRight(lit(null).cast("string")) { case ((c, tag), rest) =>
        when(c.map(TxDml.byName).getOrElse(lit(true)), lit(tag))
          .otherwise(rest)
      }
    val mTags = matchedActions.map {
      case u: UpdateAction => (u.condition, "U")
      case d: DeleteAction => (d.condition, "D")
      case other => throw new UnsupportedOperationException(s"$other")
    }
    val nTags = insAct.map(i => (i.condition, "I"))
    val action = when(col("__matched"), chain(mTags)).otherwise(chain(nTags))

    val payload = nonKey.map { c =>
      val u = upd.map(_(c))
      val i = ins.map(_(c))
      val v = (u, i) match {
        case (Some(uc), Some(ic)) => when(col("__matched"), uc).otherwise(ic)
        case (Some(uc), None) => uc
        case (None, Some(ic)) => ic
        case (None, None) => lit(null) // delete-only merge: unused
      }
      v.cast(snap.schema(c).dataType).as(s"c_$c")
    }
    val changes = flagged.withColumn("__a", action)
      .filter(col("__a").isNotNull) // rows no clause covers: untouched
      .select(col("__k").as("k") +: col("__a").as("action") +: payload: _*)
    graft.io.TxTable.merge(spark, root, changes)
    Seq.empty
  }
}
