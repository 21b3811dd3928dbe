package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType,
  FloatType, LongType}

import graft.expressions.{FloatVectorDot, Q8VectorDot}

/** Auto-vectorization (SURVEY §4.2 ladder, tier "custom Rule"): rewrites
  * the DECLARATIVE higher-order dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x.cast(W) * y.cast(W)),
  *             lit(zeroW), (acc, x) => acc + x)
  *
  * (W = double for array<float> inputs, long for array<tinyint>) into the
  * native codegen kernels [[graft.expressions.FloatVectorDot]] /
  * [[graft.expressions.Q8VectorDot]]. Injected into every graft session
  * via [[graft.expressions.GraftExtensions]]`.injectOptimizerRule`, so a
  * user (or the DSL compiler) writes the portable built-in-functions form
  * and the engine swaps in the fused no-allocation loop — the Spark-first
  * analog of an auto-vectorizing compiler pass.
  *
  * The rewrite is EXACT, not approximate: the kernels widen each element
  * before multiplying and accumulate left-to-right in the same type, and
  * they reproduce zip_with's null semantics (length mismatch → NULL, NULL
  * element → NULL) — bit-for-bit parity is pinned by VecDotSpec and the
  * RewriteSpec plan goldens, and the rewritten production queries remain
  * under the DuckDB exact-match oracle gate.
  *
  * Pattern details (all must hold, else the expression is left alone):
  *  - zip_with inputs are both array<float> (→ vec_dot) or both
  *    array<tinyint> (→ vec_dot_i8);
  *  - the pair lambda is a widening-cast product of the two lambda
  *    variables, in either order (IEEE double / two's-complement long
  *    multiplication are both commutative — same bits);
  *  - the zero literal is 0.0D / 0L of the widened type;
  *  - the merge lambda is exactly `(acc, x) => acc + x` (acc on the
  *    left — addition order is part of the float contract);
  *  - the finish lambda is the identity (the 3-arg `aggregate` default).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t, _) => Some(t)
    case _ => None
  }

  /** `cast(v as wide)` where v is exactly the given lambda variable. */
  private def isWideningCastOf(
      e: Expression, v: NamedLambdaVariable, wide: DataType): Boolean =
    e match {
      case c: Cast => c.dataType == wide && (c.child match {
        case u: NamedLambdaVariable => u.exprId == v.exprId
        case _ => false
      })
      case _ => false
    }

  /** `(x, y) => cast(x)*cast(y)` in either operand order. */
  private def isPairProduct(f: Expression, wide: DataType): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isWideningCastOf(l, x, wide) && isWideningCastOf(r, y, wide)) ||
        (isWideningCastOf(l, y, wide) && isWideningCastOf(r, x, wide))
    case _ => false
  }

  /** `(acc, x) => acc + x` — acc strictly on the left. */
  private def isLeftFoldSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && r.exprId == x.exprId
    case _ => false
  }

  /** `c => c` — the implicit finish of 3-arg `aggregate`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isZeroOf(e: Expression, wide: DataType): Boolean = (e, wide) match {
    case (Literal(0.0, DoubleType), DoubleType) => true
    case (Literal(0L, LongType), LongType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, prod), zero, merge, finish)
          if elemType(a).contains(FloatType) && elemType(b).contains(FloatType) &&
            isPairProduct(prod, DoubleType) && isZeroOf(zero, DoubleType) &&
            isLeftFoldSum(merge) && isIdentity(finish) =>
        FloatVectorDot(a, b)
      case ArrayAggregate(ZipWith(a, b, prod), zero, merge, finish)
          if elemType(a).contains(ByteType) && elemType(b).contains(ByteType) &&
            isPairProduct(prod, LongType) && isZeroOf(zero, LongType) &&
            isLeftFoldSum(merge) && isIdentity(finish) =>
        Q8VectorDot(a, b)
    }
}
