package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native Catalyst expression: dot product of two int8 (tinyint) arrays
  * accumulated in long — the scoring kernel for QUANTIZED similarity
  * search ([[graft.ops.Pipeline.qEmbQuant]] produces the vectors). The
  * result is an exact integer (|q| ≤ 127, so 64 dims max out near 2²⁰ —
  * nowhere near overflow), which is what makes the quantized path fully
  * oracle-able, unlike approximate float kernels.
  *
  * Same null semantics as [[FloatVectorDot]] (zip_with parity): length
  * mismatch → NULL, NULL element → NULL. Why custom (SURVEY §4.2
  * ladder): identical argument to vec_dot — the all-pairs verification
  * loop is the hottest path and the HOF form allocates an intermediate
  * array per pair.
  *
  * Measured (tools.VecDotBench, sf0.1 all-pairs, local[8]): **8.8×**
  * over the HOF byte-dot, values exactly equal — but **0.57×** vs the
  * float `vec_dot` kernel on this cache-resident microbench (JVM long
  * and float multiplies cost the same; 64-dim arrays fit in cache either
  * way). The int8 path's real 100 TB win is FOOTPRINT, not kernel
  * arithmetic: 4× smaller vectors on disk, on the wire, and in every
  * shuffle/broadcast of the index — which is why the quantized queries
  * keep it despite the local kernel parity.
  */
case class Q8VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_i8 requires (array<tinyint>, array<tinyint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_i8"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toLong * b.getByte(i).toLong
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
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long)$a.getByte($i) * (long)$b.getByte($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Q8VectorDot =
    copy(left = newLeft, right = newRight)
}

object Q8VectorDot {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column-level entry point; call `register(spark)` first. */
  def vecDotQ8(a: Column, b: Column): Column = call_function("vec_dot_i8", a, b)

  private val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => Q8VectorDot(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot_i8 expects 2 arguments, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_i8", builder, "built-in")
}
