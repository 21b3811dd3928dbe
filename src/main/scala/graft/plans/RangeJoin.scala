package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Cast, Expression, GreaterThan, GreaterThanOrEqual, JoinedRow,
  LessThan, LessThanOrEqual, PredicateHelper, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Point-in-interval RANGE JOIN as a native physical operator (SURVEY §2
  * B7; the full tier-(c) ladder of §4.2: logical pattern → Strategy →
  * custom SparkPlan, registered via GraftExtensions.injectPlannerStrategy).
  *
  * Spark has no range-join operator: an inner join whose condition is
  * `point >= lo AND point <= hi` plans as BroadcastNestedLoopJoin — every
  * stream row is compared against EVERY build row, O(N·M) comparisons.
  * This operator broadcasts the (small) interval side sorted by `lo`
  * together with a prefix-max of `hi`, and each stream partition answers
  * each point with one binary search plus a backward walk that stops as
  * soon as `prefixMaxHi < point` — O(N·log M + matches). The prefix-max
  * bound makes the walk exact for ARBITRARY (overlapping, unsorted-hi)
  * intervals, not just fixed-width bands.
  *
  * At the 100 TB design point this is the dimension-banded-join shape
  * (sensor calibration windows, price validity ranges, IP→geo buckets):
  * the fact side streams through unchanged — no shuffle, no explosion —
  * and the dimension side ships once per executor exactly like a
  * broadcast hash join, with the log-M probe replacing the full scan.
  *
  * Measured (tools.RangeBench, sf0.1, warm best-of-2): with a small
  * build side (supplier, M≈1.5k) the probe cost is noise — parity with
  * BroadcastNestedLoopJoin (0.86×). With the full customer table as the
  * build side (M=15k) the custom operator runs **4.0×** faster (0.60 s
  * vs 2.41 s), and the separation grows with M: nested-loop work is
  * N·M while ours is N·log M + matches.
  *
  * Conservative capture (RangeJoinStrategy): INNER join whose condition
  * is EXACTLY one lower and one upper bound on the same left-side numeric
  * expression, both bounds computed purely from the right side, and the
  * right side under the session's autoBroadcastJoinThreshold. Anything
  * else — an equi conjunct, a residual predicate, a mirrored orientation,
  * big build side — falls through to Spark's own planning (returning Nil
  * from a Strategy is free). Comparisons are evaluated in double after a
  * numeric widening cast on BOTH bounds and point — same comparison
  * semantics as Spark's own binary comparison over mixed numeric types.
  */
case class GraftRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    pointKey: Expression,
    loBound: Expression,
    hiBound: Expression,
    strictLo: Boolean,
    strictHi: Boolean) extends BinaryExecNode {

  override def nodeName: String = "GraftRangeJoin"
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftRangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // Build: collect + sort the interval side on the driver (gated small
    // by the strategy), then one broadcast — the same data movement as a
    // broadcast hash join build.
    val boundsProj = UnsafeProjection.create(
      Seq(Cast(loBound, DoubleType), Cast(hiBound, DoubleType)), right.output)
    val entries = right.executeCollect().flatMap { r =>
      val b = boundsProj(r)
      if (b.isNullAt(0) || b.isNullAt(1)) None // NULL bound never matches
      else Some((GraftRangeJoinExec.norm(b.getDouble(0)),
        GraftRangeJoinExec.norm(b.getDouble(1)), r))
    }.sortBy(_._1) // Ordering.Double.TotalOrdering: NaN largest, = itself
    val n = entries.length
    val lo = new Array[Double](n)
    val hi = new Array[Double](n)
    val rows = new Array[InternalRow](n)
    val pmaxHi = new Array[Double](n)
    var m = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      lo(i) = entries(i)._1; hi(i) = entries(i)._2; rows(i) = entries(i)._3
      // NaN-largest max, consistent with the comparison semantics below
      if (java.lang.Double.compare(hi(i), m) > 0) m = hi(i)
      pmaxHi(i) = m
      i += 1
    }
    val bc = sparkContext.broadcast((lo, hi, pmaxHi, rows))
    val pointExpr = Cast(pointKey, DoubleType)
    val leftOutput = left.output
    val outAttrs = output
    val sLo = strictLo
    val sHi = strictHi

    left.execute().mapPartitions({ iter =>
      val (blo, bhi, bpmax, brows) = bc.value
      val bn = blo.length
      val pointProj = UnsafeProjection.create(Seq(pointExpr), leftOutput)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { srow =>
        val p = pointProj(srow)
        if (p.isNullAt(0) || bn == 0) Iterator.empty
        else {
          // All comparisons via Double.compare = Spark's nan-safe double
          // ordering (NaN largest, NaN = NaN), with -0.0 normalized to
          // 0.0 on both sides — matching what the BroadcastNestedLoop
          // fallback computes (RangeJoinSpec pins parity on NaN/-0.0).
          val pv = GraftRangeJoinExec.norm(p.getDouble(0))
          // upper bound: first index whose lo fails the lower-bound test
          // (lo > pv, or lo >= pv when strict) — candidates are [0, ub)
          var a = 0; var b = bn
          while (a < b) {
            val mid = (a + b) >>> 1
            val c = java.lang.Double.compare(blo(mid), pv)
            val ok = if (sLo) c < 0 else c <= 0
            if (ok) a = mid + 1 else b = mid
          }
          val ub = a
          new Iterator[InternalRow] {
            private var j = ub - 1
            private def matches(k: Int): Boolean = {
              val c = java.lang.Double.compare(bhi(k), pv)
              if (sHi) c > 0 else c >= 0
            }
            private def dead(k: Int): Boolean = {
              val c = java.lang.Double.compare(bpmax(k), pv)
              if (sHi) c <= 0 else c < 0
            }
            private def advance(): Unit =
              while (j >= 0 && !dead(j) && !matches(j)) j -= 1
            advance()
            override def hasNext: Boolean = j >= 0 && !dead(j)
            override def next(): InternalRow = {
              val out = resultProj(joined(srow, brows(j)))
              j -= 1; advance()
              out
            }
          }
        }
      }
    }, preservesPartitioning = false)
  }
}

object GraftRangeJoinExec {
  /** -0.0 → 0.0 (Spark compares the two equal; Double.compare does not). */
  @inline def norm(d: Double): Double = if (d == 0.0) 0.0 else d
}

/** Captures the range-join logical pattern for [[GraftRangeJoinExec]];
  * injected via `GraftExtensions.injectPlannerStrategy` so it is tried
  * before Spark's built-in join strategies. */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  /** A conjunct normalized to a bound on the left-side point expression:
    * (point, bound, isLower, isStrict). */
  private def normalize(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean, Boolean)] = {
    def fromL(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(l.outputSet) && !x.references.exists(a => r.outputSet.contains(a))
    def fromR(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(r.outputSet) && !x.references.exists(a => l.outputSet.contains(a))
    e match {
      case GreaterThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, true, false))
      case GreaterThan(a, b) if fromL(a) && fromR(b) => Some((a, b, true, true))
      case LessThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, false, false))
      case LessThan(a, b) if fromL(a) && fromR(b) => Some((a, b, false, true))
      // mirrored argument order: bound cmp point
      case GreaterThanOrEqual(b, a) if fromL(a) && fromR(b) => Some((a, b, false, false))
      case GreaterThan(b, a) if fromL(a) && fromR(b) => Some((a, b, false, true))
      case LessThanOrEqual(b, a) if fromL(a) && fromR(b) => Some((a, b, true, false))
      case LessThan(b, a) if fromL(a) && fromR(b) => Some((a, b, true, true))
      case _ => None
    }
  }

  /** Kill switch (mirrors `spark.sql.optimizer.excludedRules` for the
    * injected optimizer rule): `SET spark.graft.rangeJoin.enabled=false`
    * falls back to Spark's own planning (BroadcastNestedLoopJoin). */
  val EnabledKey = "spark.graft.rangeJoin.enabled"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), _) =>
      if (SQLConf.get.getConfString(EnabledKey, "true") != "true") return Nil
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.size != 2 || threshold <= 0 ||
        r.stats.sizeInBytes > threshold) return Nil
      (normalize(conjuncts(0), l, r), normalize(conjuncts(1), l, r)) match {
        case (Some((p1, lo, true, s1)), Some((p2, hi, false, s2)))
            if p1.semanticEquals(p2) &&
              p1.dataType.isInstanceOf[NumericType] &&
              lo.dataType.isInstanceOf[NumericType] &&
              hi.dataType.isInstanceOf[NumericType] =>
          GraftRangeJoinExec(planLater(l), planLater(r), p1, lo, hi, s1, s2) :: Nil
        case (Some((p1, hi, false, s1)), Some((p2, lo, true, s2)))
            if p1.semanticEquals(p2) &&
              p1.dataType.isInstanceOf[NumericType] &&
              lo.dataType.isInstanceOf[NumericType] &&
              hi.dataType.isInstanceOf[NumericType] =>
          GraftRangeJoinExec(planLater(l), planLater(r), p1, lo, hi, s2, s1) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}
