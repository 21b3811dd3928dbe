package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: dot product of two float arrays,
  * accumulated in double, left-to-right — identical result to the
  * `aggregate(zip_with(a,b,*),0.0,+)` formulation it replaces in EVERY
  * case, including the degenerate ones (r2 ADVICE): `zip_with` null-pads
  * the shorter array so a length mismatch yields NULL, and a NULL element
  * poisons the sum to NULL — this expression does the same, rather than
  * silently truncating or reading garbage from null slots.
  *
  * Why custom (SURVEY §4.2 ladder: built-in → Expression → plan): the
  * higher-order-function form materializes an intermediate 64-float array
  * per pair. In similarity-search verification the dot product runs
  * O(candidates × dims) times — the hottest loop in the engine at the
  * 100 TB design point — and this expression's codegen is a bare fused
  * loop over the two `ArrayData`, no allocation. Adopted in LlmOps only
  * after measuring a win (see VecDotSpec + tools.VecDotBench).
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // NULL is produced not only for NULL inputs but also for mismatched
  // lengths / NULL elements (zip_with parity) — always nullable.
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column-level entry point (used by the ops catalog). Resolves by
    * name through the session's function registry — call
    * `register(spark)` (idempotent) on the session first. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  private val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatVectorDot(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot expects 2 arguments, got ${other.size}")
  }

  /** Runtime registration for an existing session (library-user path). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", builder, "built-in")
}

/** SparkSessionExtensions hook — the injection point for deployments that
  * configure `spark.sql.extensions=graft.expressions.GraftExtensions` (the
  * graft session builders pass it to `.withExtensions` directly). Injects
  * the native vector kernels as SQL functions AND the auto-vectorization
  * optimizer rule ([[graft.plans.VecDotRewrite]]) that rewrites the
  * declarative `aggregate(zip_with(...))` dot product into them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      { case Seq(a, b) => FloatVectorDot(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_i8"),
      new ExpressionInfo(classOf[Q8VectorDot].getName, "vec_dot_i8"),
      { case Seq(a, b) => Q8VectorDot(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((
      FunctionIdentifier("topk"),
      new ExpressionInfo(classOf[TopKDoubles].getName, "topk"),
      TopKDoubles.builder))
    ext.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TxMetadataCount)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    // SQL-over-tx-catalog reads get the native stats-pruning file plan
    ext.injectPostHocResolutionRule(s => new graft.plans.TxCatalogReads(s))
    // OPTIMIZE / VACUUM SQL for tx tables (grammar Spark doesn't carry)
    ext.injectParser((_, delegate) => new graft.plans.TxSqlParser(delegate))
  }
}
