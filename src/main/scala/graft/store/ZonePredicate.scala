package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** A single-column value window [lo, hi] (None = unbounded side)
  * extracted from a predicate, for driver-side zone pruning. */
private[store] final case class ZoneWindow(col: String,
                                           lo: Option[String],
                                           hi: Option[String])

/** Conservative predicate → zone-window analysis: recognizes the
  * shapes `col = lit`, `col </<=/>/>= lit` (either operand order) and
  * conjunctions of those over ONE column — which covers the range
  * deletes a retention job issues (`ts < cutoff`, `date BETWEEN …`).
  * Anything else (disjunctions, multi-column, arithmetic like
  * `k % 7 = 0`) analyzes to None and the caller keeps every file.
  * Strict bounds are widened to inclusive — pruning may only ever
  * KEEP extra files, never drop one that could match. */
private[store] object ZonePredicate {

  def analyze(pred: Column): Option[ZoneWindow] =
    analyzeExpr(org.apache.spark.sql.GraftColumnBridge.catalystExpression(pred))

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case _ => None
  }

  private def litStr(e: Expression): Option[String] = e match {
    // Literal.toString of a numeric/string value round-trips through
    // Zones.parse for every zone-comparable type; non-literals bail
    case Literal(null, _) => None
    case l: Literal => Some(l.value match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case v => v.toString
    })
    case _ => None
  }

  private def window(c: Option[String], v: Option[String],
                     lower: Boolean, upper: Boolean): Option[ZoneWindow] =
    for (cc <- c; vv <- v) yield
      ZoneWindow(cc, if (lower) Some(vv) else None, if (upper) Some(vv) else None)

  private[store] def analyzeExpr(e: Expression): Option[ZoneWindow] = e match {
    case EqualTo(a, l) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = true)
    case EqualTo(l, a) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = true)
    // a >= v / a > v  (strict widened to inclusive)
    case GreaterThanOrEqual(a, l) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = false)
    case GreaterThan(a, l) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = false)
    // v >= a ⇔ a <= v;  v > a ⇔ a < v
    case GreaterThanOrEqual(l, a) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = false, upper = true)
    case GreaterThan(l, a) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = false, upper = true)
    case LessThanOrEqual(a, l) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = false, upper = true)
    case LessThan(a, l) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = false, upper = true)
    case LessThanOrEqual(l, a) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = false)
    case LessThan(l, a) if attrName(a).isDefined =>
      window(attrName(a), litStr(l), lower = true, upper = false)
    case And(x, y) => conj(x, y)
    // pre-analysis trees from the Column API arrive as unresolved
    // function calls — same shapes, by registry name
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      (f.nameParts.last.toLowerCase, f.arguments) match {
        case ("and", Seq(x, y)) => conj(x, y)
        case ("=" | "==" | "equalto", Seq(x, y)) =>
          analyzeExpr(EqualTo(x, y))
        case (">", Seq(x, y))  => analyzeExpr(GreaterThan(x, y))
        case (">=", Seq(x, y)) => analyzeExpr(GreaterThanOrEqual(x, y))
        case ("<", Seq(x, y))  => analyzeExpr(LessThan(x, y))
        case ("<=", Seq(x, y)) => analyzeExpr(LessThanOrEqual(x, y))
        case _ => None
      }
    case _ => None
  }

  private def conj(x: Expression, y: Expression): Option[ZoneWindow] =
    (analyzeExpr(x), analyzeExpr(y)) match {
      case (Some(wx), Some(wy)) if wx.col == wy.col =>
        Some(ZoneWindow(wx.col,
          tighter(wx.lo, wy.lo, takeMax = true),
          tighter(wx.hi, wy.hi, takeMax = false)))
      // one analyzable conjunct still prunes soundly: the real
      // predicate implies it, so its window over-approximates
      // (different-column conjunctions keep the first window)
      case (Some(wx), _) => Some(wx)
      case (_, wy) => wy
    }

  /** Intersect two one-sided bounds as STRINGS — but string comparison
    * is only order-correct per type at prune time, so here we keep the
    * pair and let the caller compare with the column's real type; to
    * stay simple and sound we keep whichever bound is defined, and on
    * two defined bounds keep the first (the other conjunct's bound is
    * then merely unused — pruning stays an over-approximation). */
  private def tighter(a: Option[String], b: Option[String],
                      takeMax: Boolean): Option[String] =
    (a, b) match {
      case (Some(x), None) => Some(x)
      case (None, Some(y)) => Some(y)
      case (Some(x), Some(_)) => Some(x) // sound: wider-or-equal window
      case _ => None
    }
}
