package graft.dsl

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.expressions.UserDefinedFunction

/** A12 — user-function placeholders, analog of
  * `dataframe_expressions/user_func.py::user_func` +
  * `asts.py::ast_FunctionPlaceholder`.
  *
  * The reference captures a *declared but unimplemented* typed function
  * call for the backend to realize. Our backend is Spark, so registration
  * carries the realization as a Spark UDF up front; the DSL call site
  * still only captures a placeholder node (`Expr.UFunc`), and the
  * Compiler resolves it at lowering time — preserving the reference's
  * capture/execute split. Like reference placeholders are opaque to
  * `render`, UDFs are opaque to Catalyst (no pushdown through them) —
  * SURVEY §7.5.
  */
object UserFuncs {

  private val registry = TrieMap.empty[String, UserDefinedFunction]

  /** Register the Spark realization of a placeholder name. */
  def register(name: String, fn: UserDefinedFunction): Unit =
    registry.put(name, fn)

  def clear(): Unit = registry.clear()

  private[graft] def resolve(name: String): Option[UserDefinedFunction] =
    registry.get(name)

  private[graft] def registered: Seq[String] = registry.keys.toSeq.sorted

  /** Call a placeholder from DSL code: `UserFuncs.call("deltaR", a, b)` —
    * the analog of calling a `@user_func`-decorated function on Df args. */
  def call(name: String, args: Df*): Df =
    new Df(Expr.UFunc(name, args.map(_.expr)))
}
