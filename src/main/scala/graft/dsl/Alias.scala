package graft.dsl

import scala.collection.concurrent.TrieMap

/** A11 — the alias macro registry, analog of
  * `dataframe_expressions/alias.py::define_alias`.
  *
  * `define(base, name)(fn)` registers `name` so that an attribute access
  * `<expr ending in base-path>.name` expands to `fn(<that expr>)` at
  * capture time — a hygienic macro over the DSL, consulted inside
  * `Df.selectDynamic` exactly where the reference consults its registry
  * inside `__getattr__`. Expansion is lazy (use-site) and recursive:
  * aliases may reference other aliases (the reference's nested-alias
  * tests, SURVEY §5.1 `test_alias.py`).
  *
  * `base` is a dotted suffix path matched against the trailing attribute
  * chain of the target expression; `""` matches the root itself.
  */
object Alias {

  private val registry = TrieMap.empty[(String, String), Df => Df]

  def define(base: String, name: String)(fn: Df => Df): Unit =
    registry.put((base, name), fn)

  def undefine(base: String, name: String): Unit = registry.remove((base, name))

  def clear(): Unit = registry.clear()

  /** Trailing attribute-name path of an expression, for suffix matching:
    * `Attr(Attr(Root(t), "jets"), "pt")` → "jets.pt"; a Root → "". */
  private def pathOf(e: Expr): String = e match {
    case Expr.Attr(parent, n) =>
      val p = pathOf(parent); if (p.isEmpty) n else s"$p.$n"
    case Expr.Filtered(parent, _) => pathOf(parent)
    case Expr.Aliased(inner, _)   => pathOf(inner)
    case _ => ""
  }

  private[dsl] def lookup(target: Df, name: String): Option[Df] = {
    val path = pathOf(target.expr)
    registry.get((path, name))
      .orElse {
        // Suffix match: alias on base "jets" applies to "event.jets" too.
        // Precedence is deterministic (r2 ADVICE): the LONGEST matching
        // base wins (most specific registration), ties broken
        // lexicographically — never TrieMap hash order.
        registry.toSeq.collect {
          case ((base, n), fn)
            if n == name && base.nonEmpty &&
              (path == base || path.endsWith("." + base)) => (base, fn)
        }.sortBy { case (base, _) => (-base.length, base) }
          .headOption.map(_._2)
      }
      .map(fn => fn(target))
  }
}
