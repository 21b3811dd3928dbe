package graft.dsl

import java.util.concurrent.atomic.AtomicLong
import scala.language.dynamics

/** User-facing lazy expression-capture frontend — the analog of the
  * reference's `DataFrame.py::DataFrame` / `Column`.
  *
  * Like the reference, a `Df` never holds data: every operation captures
  * into the [[Expr]] DAG and `compile.Compiler` lowers it to Catalyst.
  * `scala.Dynamic` gives us the `__getattr__` behavior: `d.jets.pt`
  * captures attribute navigation (A1) and `d.jets.pt.count()` captures a
  * structural method call (A10) whose semantics the Compiler's registry
  * assigns — exactly the reference split between capture and backend.
  *
  * Divergences from the reference, all deliberate (SURVEY §1.1):
  *  - Scala has no truthiness, so the reference's raise-on-`__bool__`
  *    guard (A6) is unnecessary — `&&`/`||`/`!` on Df are the only
  *    boolean forms that typecheck.
  *  - `==`/`!=` can't be overloaded usefully in Scala; we follow the
  *    Spark convention `===` / `=!=`.
  *  - Division follows Python true-division (the reference's `__truediv__`)
  *    — the Compiler casts integral operands to double.
  */
final class Df private[graft] (val expr: Expr) extends Dynamic {

  /** A1 + A11 — attribute access with alias-registry lookup at use-site
    * (the reference consults `alias.py` inside `__getattr__`). */
  def selectDynamic(name: String): Df =
    Alias.lookup(this, name).getOrElse(new Df(Expr.Attr(expr, name)))

  /** A10 — any method call is captured structurally; semantics are
    * assigned later by the Compiler's method registry.
    *
    * Disambiguation note: Python separates `d.jets[mask]` (`__getitem__`)
    * from `d.jets.count()` (`__call__`), but in Scala both arrive here as
    * `applyDynamic`. A single boolean-mask Df argument or a `Df => Df`
    * lambda is therefore routed to the filter forms (A3/A4); everything
    * else is a structural method capture. */
  def applyDynamic(name: String)(args: Any*): Df = args match {
    case Seq(mask: Df) if Df.isMaskShaped(mask.expr) =>
      selectDynamic(name).apply(mask)
    case Seq(f) if f.isInstanceOf[Function1[_, _]] =>
      selectDynamic(name).apply(f.asInstanceOf[Df => Df])
    case _ => new Df(Expr.Method(expr, name, args.map(Df.lift)))
  }

  /** A2/A3 — mask filter: `d(d.met > 50)` / `jets(jets.pt > 30)`
    * (Python `d[mask]`). */
  def apply(mask: Df): Df = new Df(Expr.Filtered(expr, mask.expr))

  /** A4 — lambda filter: `d.jets(j => j.pt > 30)` (Python
    * `d.jets[lambda j: j.pt > 30]`). The callable is applied at capture
    * time to a fresh Param leaf — the analog of `ast_Callable` whose body
    * `render_callable` expands with the parameter substituted. */
  def apply(f: Df => Df): Df = {
    val p = Expr.Param(Df.nextParamId.getAndIncrement())
    new Df(Expr.Filtered(expr, f(new Df(p)).expr))
  }

  // A5 — comparisons → boolean mask
  def <(o: Any): Df  = Df.cmp("lt", this, o)
  def <=(o: Any): Df = Df.cmp("le", this, o)
  def >(o: Any): Df  = Df.cmp("gt", this, o)
  def >=(o: Any): Df = Df.cmp("ge", this, o)
  def ===(o: Any): Df = Df.cmp("eq", this, o)
  def =!=(o: Any): Df = Df.cmp("ne", this, o)

  // A6 — boolean algebra on masks
  def &&(o: Df): Df = new Df(Expr.BoolBin("and", expr, o.expr))
  def ||(o: Df): Df = new Df(Expr.BoolBin("or", expr, o.expr))
  def unary_! : Df  = new Df(Expr.Not(expr))

  // A7 — arithmetic (reflected forms via Df.NumericLhs)
  def +(o: Any): Df = Df.arith("add", this, o)
  def -(o: Any): Df = Df.arith("sub", this, o)
  def *(o: Any): Df = Df.arith("mul", this, o)
  def /(o: Any): Df = Df.arith("div", this, o)

  // A8 — unary minus
  def unary_- : Df = new Df(Expr.Neg(expr))

  /** Output alias (engine addition — see [[Expr.Aliased]]). */
  def as(name: String): Df = new Df(Expr.Aliased(expr, name))
}

object Df {
  private[dsl] val nextParamId = new AtomicLong(0)

  /** Root constructor — the reference's bare `DataFrame()`, except bound
    * to a named table (we resolve schemas at compile time). */
  def root(table: String): Df = new Df(Expr.Root(table))

  /** Literal wrap. */
  def lit(v: Any): Df = new Df(Expr.Lit(v))

  private[dsl] def isMaskShaped(e: Expr): Boolean = e match {
    case _: Expr.Cmp | _: Expr.BoolBin | _: Expr.Not => true
    case Expr.Lit(_: Boolean) => true
    case _ => false
  }

  private[dsl] def lift(v: Any): Expr = v match {
    case d: Df => d.expr
    case e: Expr => e
    case other => Expr.Lit(other)
  }

  private[dsl] def cmp(op: String, l: Df, r: Any): Df =
    new Df(Expr.Cmp(op, l.expr, lift(r)))
  private[dsl] def arith(op: String, l: Df, r: Any): Df =
    new Df(Expr.Arith(op, l.expr, lift(r)))

  /** Reflected numeric operands: `30 - d.x`, `2 * d.pt` — the analog of
    * the reference's `__radd__`/`__rsub__`/... */
  implicit final class NumericLhs(private val lhs: Double) extends AnyVal {
    def +(d: Df): Df = Df.lit(lhs) + d
    def -(d: Df): Df = Df.lit(lhs) - d
    def *(d: Df): Df = Df.lit(lhs) * d
    def /(d: Df): Df = Df.lit(lhs) / d
    def <(d: Df): Df  = Df.lit(lhs) < d
    def <=(d: Df): Df = Df.lit(lhs) <= d
    def >(d: Df): Df  = Df.lit(lhs) > d
    def >=(d: Df): Df = Df.lit(lhs) >= d
  }
}

/** A9 — the ufunc-style function surface (`np.sin(d.x)` analog). Names are
  * resolved against the Compiler's function registry; unknown names fail
  * at compile time with the registry listed (improving on the reference,
  * where a bad ufunc surfaces only at backend execution). */
object Funcs {
  private def f1(name: String)(a: Df): Df = new Df(Expr.Func(name, Seq(a.expr)))
  def sin(a: Df): Df   = f1("sin")(a)
  def cos(a: Df): Df   = f1("cos")(a)
  def tan(a: Df): Df   = f1("tan")(a)
  def asin(a: Df): Df  = f1("asin")(a)
  def acos(a: Df): Df  = f1("acos")(a)
  def atan(a: Df): Df  = f1("atan")(a)
  def sinh(a: Df): Df  = f1("sinh")(a)
  def cosh(a: Df): Df  = f1("cosh")(a)
  def tanh(a: Df): Df  = f1("tanh")(a)
  def sqrt(a: Df): Df  = f1("sqrt")(a)
  def exp(a: Df): Df   = f1("exp")(a)
  def log(a: Df): Df   = f1("log")(a)
  def log10(a: Df): Df = f1("log10")(a)
  def abs(a: Df): Df   = f1("abs")(a)
  def floor(a: Df): Df = f1("floor")(a)
  def ceil(a: Df): Df  = f1("ceil")(a)
  def sign(a: Df): Df  = f1("sign")(a)
  def log2(a: Df): Df  = f1("log2")(a)
  def log1p(a: Df): Df = f1("log1p")(a)
  def expm1(a: Df): Df = f1("expm1")(a)
  def degrees(a: Df): Df = f1("degrees")(a)
  def radians(a: Df): Df = f1("radians")(a)
  private def f2(name: String)(a: Df, b: Any): Df =
    new Df(Expr.Func(name, Seq(a.expr, Df.lift(b))))
  def pow(a: Df, b: Df): Df = f2("pow")(a, b)
  def pow(a: Df, b: Double): Df = pow(a, Df.lit(b))
  def atan2(a: Df, b: Df): Df = f2("atan2")(a, b)
  def hypot(a: Df, b: Any): Df = f2("hypot")(a, b)
  /** np.minimum / np.maximum analogs — elementwise over collection
    * leaves, `least`/`greatest` over scalars. */
  def minimum(a: Df, b: Any): Df = f2("minimum")(a, b)
  def maximum(a: Df, b: Any): Df = f2("maximum")(a, b)
  def fmod(a: Df, b: Any): Df = f2("fmod")(a, b)
  /** np.where(cond, a, b) analog. */
  def where(cond: Df, a: Any, b: Any): Df =
    new Df(Expr.Func("where", Seq(cond.expr, Df.lift(a), Df.lift(b))))
  /** np.clip(x, lo, hi) analog. */
  def clip(x: Df, lo: Any, hi: Any): Df =
    new Df(Expr.Func("clip", Seq(x.expr, Df.lift(lo), Df.lift(hi))))
  def round(a: Df, scale: Int): Df =
    new Df(Expr.Func("round", Seq(a.expr, Expr.Lit(scale))))
}
