package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, LogicalPlan, MergeAction, UpdateAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, when}

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
  * Supported = the canonical shapes whose matched/not-matched
  * conditions and payloads are computable from the SOURCE SIDE ALONE
  * plus a matched flag:
  *  - ON `target.<clusterKey> = <source expr>` (equality on the key —
  *    candidate-file pruning rides it);
  *  - WHEN MATCHED: at most one UPDATE (PARTIAL assignments allowed —
  *    unassigned columns keep their target value; assigning the
  *    cluster key is refused — key rewrites need DELETE+INSERT),
  *    and/or one DELETE, each optionally conditioned on source columns;
  *  - WHEN NOT MATCHED: at most one INSERT — the key column's value
  *    must be (semantically) the ON clause's source expression, since
  *    the row lands under that key; any other key expression is
  *    refused rather than silently rebased. Unassigned non-key
  *    columns insert NULL (the ANSI partial-column-list rule);
  *  - WHEN NOT MATCHED BY SOURCE: at most one DELETE or UPDATE over
  *    TARGET columns only (validated in [[TxCatalogReads]]), lowered
  *    to the merge's [[graft.io.TxTable.MergeBySource]] arm — this
  *    widens candidacy to every live file, exactly as Delta's clause
  *    does, and rides no-op source rows as 'N' markers so "key ∉
  *    source" is decided against ALL source keys;
  *  - matched/not-matched expressions referencing TARGET columns
  *    (beyond the key) and schema evolution are refused loudly; the
  *    Scala `TxTable.merge` remains the general door.
  * The matched flag is one semi-probe of the source keys against the
  * live target keys (column-pruned key scan + broadcast of the
  * source-key set); the merge itself re-validates under its own
  * strict-commit loop. */
final case class TxMergeCommand(root: String, keyName: String,
    source: LogicalPlan, sourceOutput: Seq[Attribute], keyExpr: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction] = Seq.empty)
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
    require(notMatchedBySourceActions.size <= 1,
      "tx MERGE supports at most one NOT MATCHED BY SOURCE action")

    def assignMap(as: Seq[Assignment]): Map[String, Column] =
      as.map(a => TxDml.nameOf(a.key) -> TxDml.byName(a.value)).toMap
    updAct.foreach { u =>
      // silent key rewrites were the r11 advice's medium finding: an
      // UPDATE SET <key>=… used to be DROPPED from the payload — refuse
      if (u.assignments.exists(a => TxDml.nameOf(a.key) == keyName))
        throw new UnsupportedOperationException(
          s"tx MERGE: UPDATE may not assign the cluster key '$keyName' " +
            "(rows live under their key; use DELETE + INSERT)")
    }
    insAct.foreach { i =>
      // the inserted row lands under the ON key expression (__k), so an
      // INSERT key value that isn't that expression would be silently
      // rebased — refuse unless the two are semantically equal
      i.assignments.collectFirst {
        case a if TxDml.nameOf(a.key) == keyName => a.value
      } match {
        case Some(v) if v.semanticEquals(keyExpr) => ()
        case Some(v) => throw new UnsupportedOperationException(
          s"tx MERGE: INSERT must set '$keyName' to the ON clause's " +
            s"source expression ${keyExpr.sql} (rows land under it); " +
            s"got ${v.sql}")
        case None => throw new UnsupportedOperationException(
          s"tx MERGE: INSERT must assign the cluster key '$keyName'")
      }
    }
    val upd = updAct.headOption.map(u => assignMap(u.assignments))
    val ins = insAct.headOption.map(i => assignMap(i.assignments))
    // partial matched UPDATE: unassigned non-key columns keep their
    // target values via the merge's carryOnUpdate arm
    val carry: Set[String] =
      upd.map(m => nonKey.filterNot(m.contains).toSet).getOrElse(Set.empty)

    val bySource = notMatchedBySourceActions.headOption.map {
      case d: DeleteAction => graft.io.TxTable.MergeBySource("D",
        d.condition.map(TxDml.byName).getOrElse(lit(true)), Seq.empty)
      case u: UpdateAction =>
        if (u.assignments.exists(a => TxDml.nameOf(a.key) == keyName))
          throw new UnsupportedOperationException(
            s"tx MERGE: NOT MATCHED BY SOURCE UPDATE may not assign the " +
              s"cluster key '$keyName'")
        graft.io.TxTable.MergeBySource("U",
          u.condition.map(TxDml.byName).getOrElse(lit(true)),
          u.assignments.map(a => TxDml.nameOf(a.key) -> TxDml.byName(a.value)))
      case other => throw new UnsupportedOperationException(
        s"tx MERGE: unsupported NOT MATCHED BY SOURCE action $other")
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
      val u = upd.flatMap(_.get(c)) // partial UPDATE: carried cols absent
      val i = ins.map(m => m.getOrElse(c, lit(null))) // ANSI: absent → NULL
      val v = (u, i) match {
        case (Some(uc), Some(ic)) => when(col("__matched"), uc).otherwise(ic)
        case (Some(uc), None) => uc
        case (None, Some(ic)) => ic
        case (None, None) => lit(null) // carried or delete-only: unused
      }
      v.cast(snap.schema(c).dataType).as(s"c_$c")
    }
    val tagged = flagged.withColumn("__a", action)
    val changes = (if (bySource.isDefined)
        // 'N' presence markers: by-source decides "key ∉ source" against
        // EVERY source key, so no-op rows must ride along
        tagged.withColumn("__a", coalesce(col("__a"), lit("N")))
      else tagged.filter(col("__a").isNotNull)) // untouched rows drop
      .select(col("__k").as("k") +: col("__a").as("action") +: payload: _*)
    graft.io.TxTable.merge(spark, root, changes,
      carryOnUpdate = carry, bySource = bySource)
    Seq.empty
  }
}
