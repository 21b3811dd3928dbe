package graft.dsl

/** The DSL expression IR — analog of the reference's AST DAG.
  *
  * The reference (`gordonwatts/dataframe_expressions`, see SURVEY.md §2A)
  * captures every user operation into a DAG of Python `ast.AST` nodes plus
  * four custom node types (`asts.py::ast_DataFrame / ast_Column /
  * ast_Callable / ast_FunctionPlaceholder`). Our analog is a sealed Scala
  * ADT: each case class mirrors one capture shape, and `compile.Compiler`
  * (the `render.py::render` analog) lowers the DAG to Catalyst
  * `Column`s / `DataFrame`s.
  *
  * Nodes are plain immutable case classes; DAG *sharing* (the reference's
  * identity-memoization contract, `render.py::render_context`) is preserved
  * by the Compiler via an `IdentityHashMap`, so a sub-expression object
  * reused in two places compiles to the **same** `Column` instance
  * (Catalyst/codegen CSE then applies downstream).
  */
sealed trait Expr

object Expr {

  /** Leaf: a named root relation — `ast_DataFrame` analog. The table name
    * binds to a parquet table at compile time (SURVEY §1.1: we invert the
    * reference's schema-less model into analysis-time resolution). */
  final case class Root(table: String) extends Expr

  /** A1 — attribute navigation: `d.jets`, `d.jets.pt`
    * (`DataFrame.py::__getattr__` → `ast.Attribute`). */
  final case class Attr(parent: Expr, name: String) extends Expr

  /** A2/A3 — mask filter: `d[mask]` (row filter when `parent` is a
    * relation) or `d.jets[mask]` (per-row nested-collection filter when
    * `parent` is an array column) — `DataFrame.py::__getitem__`. */
  final case class Filtered(parent: Expr, mask: Expr) extends Expr

  /** A5 — comparison (`ast.Compare`): op ∈ {lt, le, gt, ge, eq, ne}. */
  final case class Cmp(op: String, left: Expr, right: Expr) extends Expr

  /** A6 — boolean algebra (`ast.BoolOp`): op ∈ {and, or}. */
  final case class BoolBin(op: String, left: Expr, right: Expr) extends Expr

  /** A6 — negation (`ast.UnaryOp(Not)`). */
  final case class Not(e: Expr) extends Expr

  /** A7 — arithmetic (`ast.BinOp`): op ∈ {add, sub, mul, div}. */
  final case class Arith(op: String, left: Expr, right: Expr) extends Expr

  /** A8 — unary minus (`ast.UnaryOp(USub)`). */
  final case class Neg(e: Expr) extends Expr

  /** A9 — ufunc-style function capture: `Funcs.sin(d.x)` — analog of
    * `np.sin(d.x)` via `__array_ufunc__`; semantics resolved by name
    * against the Compiler's function registry. */
  final case class Func(name: String, args: Seq[Expr]) extends Expr

  /** A10 — structural method-call capture: `d.jets.pt.count()` →
    * `ast.Call(ast.Attribute(...))`; semantics resolved by the Compiler's
    * method registry (array methods vs relation aggregates). */
  final case class Method(target: Expr, name: String, args: Seq[Expr]) extends Expr

  /** A4 — lambda parameter occurrence inside a captured callable
    * (`ast_Callable` analog). Bound by the Compiler when expanding the
    * enclosing higher-order filter/transform. */
  final case class Param(id: Long) extends Expr

  /** A12 — user-function placeholder call (`ast_FunctionPlaceholder`):
    * compiled to the Spark UDF registered under `name` in [[UserFuncs]]. */
  final case class UFunc(name: String, args: Seq[Expr]) extends Expr

  /** Scalar literal. */
  final case class Lit(value: Any) extends Expr

  /** Explicit output alias (no reference analog — needed because our
    * engine materializes results and the oracle compares column names). */
  final case class Aliased(e: Expr, name: String) extends Expr
}
