package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.types.DayTimeIntervalType
import org.apache.spark.sql.catalyst.plans.{AsOfJoinDirection, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.AsOfJoin
import org.apache.spark.sql.graft.PlanBridge

/** As-of join through Catalyst's native `AsOfJoin` LOGICAL NODE (SURVEY
  * §2 B8, tier-"custom plan" of the §4.2 ladder) — the whole-operator
  * alternative to the union+last window formulation in
  * [[graft.ops.Joins.qJoinAsof]].
  *
  * DEMONSTRATION TIER, NOT PRODUCTION: see the Scale paragraph below —
  * Catalyst's own lowering plans a nested-loop over the full right side
  * when left as-of keys are near-distinct, so the crosswalk routes
  * production as-of work to q_join_asof / q_join_asof_merge and keeps
  * this node as the API-completeness record of the native operator.
  *
  * Catalyst has carried a first-class `AsOfJoin` logical operator since
  * 3.3 (`catalyst/plans/logical/basicLogicalOperators.scala`) for the
  * pandas-on-Spark `merge_asof` frontend, together with the optimizer
  * lowering `RewriteAsOfJoin` — but exposes NO Scala API for it. This is
  * that missing API: we build the resolved logical node directly from the
  * two child DataFrames' analyzed plans and hand it to the session via
  * [[org.apache.spark.sql.graft.PlanBridge]]; Spark's own
  * `RewriteAsOfJoin` then lowers it (left-outer join on the `by` key +
  * min-struct aggregate over the matching right rows).
  *
  * Semantics (direction=backward, allowExactMatches=true): for each left
  * row, the right row with the greatest `rightOn <= leftOn` among equal
  * `by` keys; unmatched left rows survive with NULL right columns
  * (LeftOuter). Tie-break at EQUAL `rightOn`: the lowering's
  * `min(struct(orderExpr, right.cols...))` picks the smallest remaining
  * right tuple — the OPPOSITE of qJoinAsof's documented largest-event-id
  * rule. AsofNativeSpec proves the two agree row-for-row on the events
  * data (ns timestamps make equal-ts ties a measure-zero case) and
  * documents the divergence for data where ties are real.
  *
  * Scale: the ACTUAL lowered plan (read from the optimizer, not the
  * docs) is three-stage: (1) Inner join of the DISTINCT left as-of keys
  * against the ENTIRE right side on the time predicate alone — the `by`
  * equality is NOT in this join, so it plans as BroadcastNestedLoopJoin:
  * O(|distinct leftOn| · M) comparisons; (2) `min_by` aggregate per
  * (leftOn, by) pair; (3) LeftOuter equi join back to the left side.
  * That is fine when distinct as-of keys are FEW (quantized timestamps,
  * bar close times) and catastrophic when they are ~N (raw event-time
  * ns timestamps, exactly this data) — it measures FASTER here
  * (tools.AsofBench sf0.1: 0.25 s vs 0.42 s) only because N is small
  * locally. The union+last window formulation (ops.Joins.qJoinAsof, one
  * shuffle, O(1) running state) remains the 100 TB production shape;
  * this node is the API-completeness path and the honest record of what
  * Catalyst's own lowering does.
  */
object AsOfJoinOp {

  /** `left ASOF LEFT JOIN right ON by-equality AND rightOn <= leftOn`
    * (backward, exact matches allowed). Column arguments must come from
    * the two DataFrames (`df("col")`) so they carry resolved attribute
    * references; left and right must not share output attribute ids.
    * The tolerance is a plain Duration, turned into a day-time-interval
    * LITERAL here — a lazily-parsed `expr("INTERVAL ...")` column node
    * would not be converted on this manual plan-construction path. */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftOn: Column, rightOn: Column,
      leftBy: Column, rightBy: Column,
      tolerance: Option[java.time.Duration] = None): DataFrame = {
    val plan = AsOfJoin(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      PlanBridge.expr(leftOn),
      PlanBridge.expr(rightOn),
      Some(EqualTo(PlanBridge.expr(leftBy), PlanBridge.expr(rightBy))),
      LeftOuter,
      tolerance.map(d => Literal(d.toNanos / 1000L, DayTimeIntervalType())),
      allowExactMatches = true,
      AsOfJoinDirection("backward"))
    PlanBridge.ofRows(left.sparkSession, plan)
  }
}
