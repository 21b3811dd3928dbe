package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the engine's declarative vector arithmetic.
  *
  * Everything here is written in portable built-in higher-order
  * functions — runnable on any Spark — in EXACTLY the shape
  * [[graft.plans.VecDotRewrite]] recognizes, so in a graft session the
  * optimizer swaps in the native codegen kernels (`vec_dot` /
  * `vec_dot_i8`). Ops code and the DSL compiler both route through this
  * object; a drift in the written shape would silently lose the kernel
  * rewrite, which PlanRegressionSpec/DslSpec pin against.
  */
object VectorForms {

  /** Float dot product, double accumulation, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Sum of squares (squared L2 norm). */
  def sumSq(c: Column): Column = dot(c, c)

  /** L2 norm. */
  def norm(c: Column): Column = sqrt(sumSq(c))

  /** Int8 (tinyint) dot product, exact long accumulation. */
  def dotI8(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
}
