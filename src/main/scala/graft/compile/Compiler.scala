package graft.compile

import java.util.IdentityHashMap
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs => fAbs, round => fRound, _}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

import graft.dsl.{Df, Expr, UserFuncs}
import graft.io.Tables

/** A13 — the `render.py::render` analog: lowers the DSL [[Expr]] DAG to
  * Catalyst `Column`s / `DataFrame`s.
  *
  * Contract carried over from the reference:
  *  - **Identity memoization** (`render.py::render_context`): a sub-`Expr`
  *    *object* encountered twice compiles to the *same* `Column` instance
  *    (checked by `eq` in the golden tests). Catalyst codegen
  *    subexpression elimination then gets maximal sharing to work with.
  *  - **Lambda expansion** (`render.py::render_callable`): `Param` leaves
  *    are bound when the enclosing higher-order node is lowered; each
  *    nested scope gets its own memo frame so bindings never leak.
  *  - **Placeholder opacity**: `UFunc` nodes lower to registered Spark
  *    UDFs ([[UserFuncs]]); like reference placeholders they are opaque
  *    to the optimizer.
  *
  * Semantics the reference leaves to backends, fixed here (SURVEY §2A):
  *  - `Filtered` on a *relation* → `DataFrame.filter` (A2); on an *array
  *    column* → higher-order `functions.filter` (A3/A4) — per-row, no
  *    explode/regroup, stays inside whole-stage codegen. The distinction
  *    is made by the compiled type of the filter target, mirroring the
  *    reference's "what does the mask refer to" resolution.
  *  - Method calls (A10) resolve against [[Compiler.methodRegistry]]:
  *    array methods (`count`→`size`, `sum`→`aggregate`, ...) vs scalar
  *    aggregates (`sum`→`sum(col)` over the relation) vs string/scalar
  *    functions. Unknown names fail at lowering time with the registry
  *    listed.
  *  - Integral division is true division (Python `__truediv__`): both
  *    operands cast to double.
  */
final class Compiler(spark: SparkSession, sfDir: String) {

  /** Identity-memo frames; head = innermost lambda scope. */
  private var memoFrames: List[IdentityHashMap[Expr, Column]] =
    List(new IdentityHashMap[Expr, Column]())
  /** Structural memo for relations (case-class equality is fine here —
    * equal relation exprs are the same relation). */
  private val relMemo = mutable.HashMap.empty[Expr, DataFrame]
  /** Param bindings for lambda expansion (A4). */
  private val paramBindings = mutable.HashMap.empty[Long, Column]
  /** Nested-filter target binding: inside `jets[jets.pt > 30]` the mask's
    * occurrences of the target expr (structural match, since each
    * attribute access creates a fresh node) bind to the lambda variable. */
  private var nestedTarget: Option[(Expr, Column)] = None
  /** Set when a lowered method is a relation-level aggregate. */
  private var sawAggregate = false

  /** Derived relations: DSL `Root(name)` binds here before falling back
    * to the parquet tables — lets DSL queries run over views (e.g. the
    * nested orders array-of-struct view). */
  private val derived = mutable.HashMap.empty[String, DataFrame]

  /** Bind a derived DataFrame as a DSL root relation. */
  def register(name: String, df: DataFrame): this.type = {
    derived(name) = df; this
  }

  /** Lower a column-shaped Df to a Catalyst Column (for embedding DSL
    * expressions inside raw-Spark query builders). */
  def column(d: Df): Column = compileCol(d.expr)

  /** Lower a Df to an executable DataFrame over the bound table. */
  def toDF(d: Df): DataFrame = toDF(Seq(d))

  /** Lower several column-shaped Dfs (sharing one base relation) into a
    * single select / aggregate — the engine entry for multi-column
    * projections built with the DSL. */
  def toDF(ds: Seq[Df]): DataFrame = {
    require(ds.nonEmpty, "no expressions to compile")
    if (ds.size == 1 && isRel(ds.head.expr)) return compileRel(ds.head.expr)
    val bases = ds.flatMap(d => relOf(d.expr)).distinct
    require(bases.size == 1,
      s"expressions must share exactly one base relation, found ${bases.size}")
    val base = compileRel(bases.head)
    sawAggregate = false
    val cols = ds.zipWithIndex.map { case (d, i) =>
      val c = compileCol(d.expr)
      d.expr match {
        case Expr.Aliased(_, _) => c
        case e => c.as(defaultName(e, i))
      }
    }
    if (sawAggregate) base.agg(cols.head, cols.tail: _*)
    else base.select(cols: _*)
  }

  // ---------------------------------------------------------------- rel

  private def isRel(e: Expr): Boolean = e match {
    case Expr.Root(_) => true
    case Expr.Filtered(p, _) => isRel(p)
    case _ => false
  }

  /** Deepest relation-shaped ancestor of a column expr. */
  private def relOf(e: Expr): Option[Expr] = e match {
    case r if isRel(r) => Some(r)
    case Expr.Attr(p, _) => relOf(p)
    case Expr.Filtered(p, _) => relOf(p)
    case Expr.Cmp(_, l, r) => mergeRel(relOf(l), relOf(r))
    case Expr.BoolBin(_, l, r) => mergeRel(relOf(l), relOf(r))
    case Expr.Arith(_, l, r) => mergeRel(relOf(l), relOf(r))
    case Expr.Not(x) => relOf(x)
    case Expr.Neg(x) => relOf(x)
    case Expr.Func(_, args) => args.flatMap(relOf).headOption
    case Expr.Method(t, _, args) => (relOf(t) +: args.map(relOf)).flatten.headOption
    case Expr.UFunc(_, args) => args.flatMap(relOf).headOption
    case Expr.Aliased(x, _) => relOf(x)
    case _ => None
  }

  private def mergeRel(a: Option[Expr], b: Option[Expr]): Option[Expr] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        require(x == y, "expression mixes two different base relations")
        Some(x)
      case (x, y) => x.orElse(y)
    }

  private def compileRel(e: Expr): DataFrame = relMemo.getOrElseUpdate(e, e match {
    case Expr.Root(table) =>
      derived.getOrElse(table, Tables.table(spark, sfDir, table))
    case Expr.Filtered(parent, mask) if isRel(parent) =>
      compileRel(parent).filter(compileCol(mask))
    case other => sys.error(s"not a relation: $other")
  })

  // ------------------------------------------------------------- column

  private def memo(e: Expr)(build: => Column): Column = {
    val frame = memoFrames.head
    val hit = frame.get(e)
    if (hit != null) hit
    else { val c = build; frame.put(e, c); c }
  }

  private def inNestedScope[A](binding: Option[(Expr, Column)])(body: => A): A = {
    val savedTarget = nestedTarget
    memoFrames ::= new IdentityHashMap[Expr, Column]()
    nestedTarget = binding.orElse(nestedTarget)
    try body
    finally { memoFrames = memoFrames.tail; nestedTarget = savedTarget }
  }

  private def compileCol(e: Expr): Column = memo(e) {
    nestedTarget match {
      case Some((target, v)) if e == target => return v
      case _ =>
    }
    e match {
      case Expr.Root(t) =>
        sys.error(s"a bare relation ($t) is not a column expression")

      case Expr.Attr(parent, name) =>
        if (isRel(parent)) {
          val schema = compileRel(parent).schema
          require(schema.fieldNames.contains(name),
            s"no column '$name' in ${schema.fieldNames.mkString("[", ", ", "]")}")
          col(name)
        } else nestedTarget match {
          case Some((target, v)) if parent == target => v.getField(name)
          case _ => compileCol(parent).getField(name)
        }

      case Expr.Filtered(parent, mask) if !isRel(parent) =>
        // A3/A4 — nested-collection filter via higher-order function
        val target = compileCol(parent)
        require(dataTypeOf(parent).isInstanceOf[ArrayType],
          "mask filter applied to a non-array, non-relation expression")
        filter(target, x =>
          inNestedScope(Some((parent, x)))(compileColWithParams(mask, x)))

      case Expr.Filtered(_, _) =>
        sys.error("a filtered relation is not a column expression")

      case Expr.Cmp(op, l, r) =>
        elementwise(l, r)(cmpOp(op))

      case Expr.BoolBin(op, l, r) =>
        val (a, b) = (compileCol(l), compileCol(r))
        if (op == "and") a && b else a || b

      case Expr.Not(x) => !compileCol(x)

      case Expr.Arith(op, l, r) =>
        elementwise(l, r)(arithOp(op))

      case Expr.Neg(x) =>
        if (isArrayExpr(x)) transform(compileCol(x), e => -e)
        else -compileCol(x)

      case Expr.Func("round", Seq(a, Expr.Lit(scale: Int))) =>
        fRound(compileCol(a), scale)

      case Expr.Func(name, args) =>
        Compiler.funcRegistry.get(name) match {
          case Some(f) if args.size == 1 && isArrayExpr(args.head) =>
            // A9 over a collection leaf: map the ufunc elementwise
            transform(compileCol(args.head), e => f(Seq(e)))
          case Some(f) if args.size == 2 &&
              (isArrayExpr(args(0)) || isArrayExpr(args(1))) =>
            // binary ufunc over collection leaves (np.minimum(d.jets.pt, 30)
            // analog): transform/zip_with exactly like Arith elementwise
            elementwise(args(0), args(1))((a, b) => f(Seq(a, b)))
          case Some(f) => f(args.map(compileCol))
          case None => sys.error(
            s"unknown function '$name'; registry: ${Compiler.funcRegistry.keys.toSeq.sorted.mkString(", ")}")
        }

      case Expr.Method(target, name, args) => compileMethod(target, name, args)

      case Expr.Param(id) =>
        paramBindings.getOrElse(id,
          sys.error(s"unbound lambda parameter (id=$id) outside its scope"))

      case Expr.UFunc(name, args) =>
        UserFuncs.resolve(name) match {
          case Some(udfFn) => udfFn(args.map(compileCol): _*)
          case None => sys.error(
            s"user_func '$name' is declared but not registered; registered: ${UserFuncs.registered.mkString(", ")}")
        }

      case Expr.Lit(v) => lit(v)

      case Expr.Aliased(inner, name) => compileCol(inner).as(name)
    }
  }

  private def cmpOp(op: String)(a: Column, b: Column): Column = op match {
    case "lt" => a < b;  case "le" => a <= b
    case "gt" => a > b;  case "ge" => a >= b
    case "eq" => a === b; case "ne" => a =!= b
  }

  private def arithOp(op: String)(a: Column, b: Column): Column = op match {
    case "add" => a + b; case "sub" => a - b; case "mul" => a * b
    case "div" => a.cast("double") / b.cast("double") // Python true-div
  }

  /** A3/A7 — the reference's hierarchical elementwise model
    * (`d.jets.px / d.jets.pt`): binary ops where one or both operands are
    * collection leaves lower to `transform`/`zip_with` (per-row, no
    * explode). Inside a lambda scope operands are element-level scalars,
    * so the plain scalar path applies. */
  private def elementwise(l: Expr, r: Expr)(op: (Column, Column) => Column): Column =
    (isArrayExpr(l), isArrayExpr(r)) match {
      case (false, false) => op(compileCol(l), compileCol(r))
      case (true, false) =>
        val b = compileCol(r); transform(compileCol(l), e => op(e, b))
      case (false, true) =>
        val a = compileCol(l); transform(compileCol(r), e => op(a, e))
      case (true, true) =>
        zip_with(compileCol(l), compileCol(r), (a, b) => op(a, b))
    }

  /** Is this expr array-typed at the CURRENT scope? Inside a lambda frame
    * everything is element-level (and type resolution against the base
    * relation would not see the lambda variable), so: no. */
  private def isArrayExpr(e: Expr): Boolean =
    memoFrames.lengthCompare(1) == 0 && (e match {
      case Expr.Lit(_) | Expr.Param(_) => false
      case _ =>
        relOf(e).isDefined &&
          (try dataTypeOf(e).isInstanceOf[ArrayType]
           catch { case scala.util.control.NonFatal(_) => false })
    })

  /** Compile a lambda body with Param leaves bound to `v` (A4 —
    * `render_callable` analog). The body may use either the explicit
    * lambda parameter or structural references to the filter target. */
  private def compileColWithParams(body: Expr, v: Column): Column = {
    val ids = collectParams(body)
    ids.foreach(paramBindings(_) = v)
    try compileCol(body)
    finally ids.foreach(paramBindings.remove)
  }

  private def collectParams(e: Expr): Seq[Long] = e match {
    case Expr.Param(id) => Seq(id)
    case Expr.Attr(p, _) => collectParams(p)
    case Expr.Filtered(p, m) => collectParams(p) ++ collectParams(m)
    case Expr.Cmp(_, l, r) => collectParams(l) ++ collectParams(r)
    case Expr.BoolBin(_, l, r) => collectParams(l) ++ collectParams(r)
    case Expr.Arith(_, l, r) => collectParams(l) ++ collectParams(r)
    case Expr.Not(x) => collectParams(x)
    case Expr.Neg(x) => collectParams(x)
    case Expr.Func(_, as) => as.flatMap(collectParams)
    case Expr.Method(t, _, as) => collectParams(t) ++ as.flatMap(collectParams)
    case Expr.UFunc(_, as) => as.flatMap(collectParams)
    case Expr.Aliased(x, _) => collectParams(x)
    case _ => Nil
  }

  // A10 — method registry
  private def compileMethod(target: Expr, name: String, args: Seq[Expr]): Column = {
    val t = compileCol(target)
    val argCols = args.map(compileCol)
    dataTypeOf(target) match {
      case _: ArrayType => name match {
        case "count" | "size" | "len" => size(t).cast("long")
        case "sum" => aggregate(t, lit(0.0), (acc, x) => acc + x.cast("double"))
        case "avg" | "mean" =>
          aggregate(t, lit(0.0), (acc, x) => acc + x.cast("double")) /
            size(t).cast("double")
        case "min" => array_min(t)
        case "max" => array_max(t)
        case "first" => element_at(t, 1)
        case "sorted" => array_sort(t)
        case "distinct" => array_distinct(t)
        case "contains" => array_contains(t, argCols.head)
        // vector methods, emitted in the PORTABLE declarative HOF form
        // (ops.VectorForms) — on float arrays the injected
        // plans.VecDotRewrite swaps in the native vec_dot kernel (DslSpec
        // pins this), on other element types the HOF runs as written
        case "dot" => graft.ops.VectorForms.dot(t, argCols.head)
        case "norm" => graft.ops.VectorForms.norm(t)
        case other => unknownMethod(other, "array")
      }
      case _ => name match {
        // relation-level scalar aggregates (semantics: reference backends
        // treat d.x.count() as an aggregation over the dataset)
        case "count" => sawAggregate = true; count(t)
        case "sum" => sawAggregate = true; sum(t)
        case "avg" | "mean" => sawAggregate = true; avg(t)
        case "min" => sawAggregate = true; min(t)
        case "max" => sawAggregate = true; max(t)
        case "nunique" => sawAggregate = true; countDistinct(t)
        case "std" => sawAggregate = true; stddev(t)
        // scalar string/value methods
        case "lower" => lower(t)
        case "upper" => upper(t)
        case "length" => length(t).cast("long")
        case "trim" => trim(t)
        case "contains" => t.contains(argCols.head)
        case "startswith" => t.startsWith(argCols.head)
        case "endswith" => t.endsWith(argCols.head)
        case "substr" => t.substr(argCols(0), argCols(1))
        case "isin" => t.isin(args.map { case Expr.Lit(v) => v; case x => x }: _*)
        case "isnull" => t.isNull
        case "notnull" => t.isNotNull
        case "cast" => t.cast(args.head.asInstanceOf[Expr.Lit].value.toString)
        case other => unknownMethod(other, "scalar")
      }
    }
  }

  private def unknownMethod(name: String, kind: String): Nothing =
    sys.error(s"unknown $kind method '$name'; see Compiler.methodRegistry " +
      s"(array: ${Compiler.arrayMethods.mkString(",")}; scalar: ${Compiler.scalarMethods.mkString(",")})")

  /** Static type of a column expr, resolved against the base relation. */
  private def dataTypeOf(e: Expr): DataType = {
    val base = relOf(e).map(compileRel).getOrElse(
      sys.error("cannot type an expression with no base relation"))
    typeIn(e, base.schema)
  }

  private def typeIn(e: Expr, schema: StructType): DataType = e match {
    case Expr.Attr(parent, name) if isRel(parent) => schema(name).dataType
    case Expr.Attr(parent, name) =>
      typeIn(parent, schema) match {
        case ArrayType(s: StructType, n) => ArrayType(s(name).dataType, n)
        case s: StructType => s(name).dataType
        case other => sys.error(s"cannot navigate '$name' into $other")
      }
    case Expr.Filtered(parent, _) => typeIn(parent, schema)
    case Expr.Aliased(inner, _) => typeIn(inner, schema)
    case other =>
      // fall back to running analysis on a one-column projection
      relOf(other).map(compileRel).get.select(compileCol(other)).schema.head.dataType
  }

  private def defaultName(e: Expr, i: Int): String = e match {
    case Expr.Attr(_, n) => n
    case Expr.Aliased(_, n) => n
    case Expr.Method(t, n, _) => s"${defaultName(t, i)}_$n"
    case Expr.Filtered(p, _) => defaultName(p, i)
    case _ => s"col$i"
  }
}

object Compiler {
  def apply(spark: SparkSession, sfDir: String): Compiler =
    new Compiler(spark, sfDir)

  private[compile] val arrayMethods = Seq("count", "size", "len", "sum",
    "avg", "mean", "min", "max", "first", "sorted", "distinct", "contains",
    "dot", "norm")
  private[compile] val scalarMethods = Seq("count", "sum", "avg", "mean",
    "min", "max", "nunique", "std", "lower", "upper", "length", "trim",
    "contains", "startswith", "endswith", "substr", "isin", "isnull",
    "notnull", "cast")

  /** A9 ufunc registry: DSL Func name → Spark codegen'd function. */
  private[compile] val funcRegistry: Map[String, Seq[Column] => Column] = Map(
    "sin" -> (as => sin(as.head)), "cos" -> (as => cos(as.head)),
    "tan" -> (as => tan(as.head)), "asin" -> (as => asin(as.head)),
    "acos" -> (as => acos(as.head)), "atan" -> (as => atan(as.head)),
    "sinh" -> (as => sinh(as.head)), "cosh" -> (as => cosh(as.head)),
    "tanh" -> (as => tanh(as.head)), "sqrt" -> (as => sqrt(as.head)),
    "exp" -> (as => exp(as.head)), "log" -> (as => log(as.head)),
    "log10" -> (as => log10(as.head)), "abs" -> (as => fAbs(as.head)),
    "floor" -> (as => floor(as.head)), "ceil" -> (as => ceil(as.head)),
    "sign" -> (as => signum(as.head)),
    "log2" -> (as => log2(as.head)), "log1p" -> (as => log1p(as.head)),
    "expm1" -> (as => expm1(as.head)),
    "degrees" -> (as => degrees(as.head)),
    "radians" -> (as => radians(as.head)),
    "pow" -> (as => pow(as(0), as(1))),
    "atan2" -> (as => atan2(as(0), as(1))),
    "hypot" -> (as => hypot(as(0), as(1))),
    "minimum" -> (as => least(as(0), as(1))),
    "maximum" -> (as => greatest(as(0), as(1))),
    "fmod" -> (as => as(0) % as(1)),
    "where" -> (as => when(as(0), as(1)).otherwise(as(2))),
    "clip" -> (as => least(greatest(as(0), as(1)), as(2))),
  )
}
