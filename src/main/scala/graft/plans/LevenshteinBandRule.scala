package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Semantics-preserving optimizer rule for bounded fuzzy matching:
  * every `levenshtein(a, b) <= k` (and `<`, `=`) conjunct in a Filter
  * or Join condition is rewritten to the THRESHOLDED form Spark already
  * ships but users rarely reach —
  *
  *   levenshtein(a, b) <= 2
  *     ==>  abs(length(a) - length(b)) <= 2  AND  levenshtein(a, b, 2) >= 0
  *
  * Two independent wins, both per evaluated pair:
  *  - the thresholded kernel runs the banded DP — O(k·max(n,m)) instead
  *    of the full O(n·m) table (it returns -1 as soon as the band
  *    exceeds k, so `>= 0` is exactly the original predicate);
  *  - the length band is placed FIRST in the conjunction, so `And`
  *    short-circuits before any DP work for the overwhelming majority
  *    of pairs (|len(a) − len(b)| ≤ lev(a, b) is the classic lossless
  *    bound — same family as q89's multiset q-gram filter, which is
  *    tighter but needs an inverted index; this one is free).
  *
  * In a fuzzy self-join this turns the BroadcastNestedLoopJoin's
  * per-pair cost from "full DP always" into "two length reads, DP
  * almost never" — the difference between O(n²·L²) and ~O(n²) with a
  * tiny constant at 100 TB candidate volumes (the right-er fix, a
  * prefix-index candidate join, is what q89 does; this rule is the
  * safety net for plain-SQL users who just write the predicate).
  *
  * Null semantics are unchanged: both forms null-propagate from either
  * input, and `And` strictness is identical. The rewrite only fires on
  * non-negative integer literals, leaves thresholded calls alone
  * (already optimal, and that makes the rule idempotent — the fixed
  * point batch terminates), and never fires on `>` / `>=` bounds
  * (those are NOT banded: a -1 early-out would change the result).
  */
object LevenshteinBandRule extends Rule[LogicalPlan] with PredicateHelper {

  /** `abs(length(a) - length(b)) <= k` — the lossless prefilter. */
  private def band(a: Expression, b: Expression, k: Literal): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** Any integral-literal bound that fits in Int, normalized to Int —
    * `levenshtein(a,b) <= 2L` (the analyzer widens the comparison to
    * BIGINT) or a cast-wrapped literal must band exactly like the plain
    * Int form; a silent fall-through here keeps the full O(n·m) DP and
    * breaks the "naive formulation is safe" guarantee q104 advertises.
    */
  private object IntBound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(ki: Int, IntegerType) => Some(ki)
      case Literal(kl: Long, LongType) if kl >= Int.MinValue && kl <= Int.MaxValue =>
        Some(kl.toInt)
      case Literal(ks: Short, ShortType) => Some(ks.toInt)
      case Literal(kb: Byte, ByteType) => Some(kb.toInt)
      // The literal value is known, so the cast is value-preserving
      // exactly when k fits the target type. A non-fitting narrowing
      // cast (`cast(500 as tinyint)`) wraps — or throws under ANSI —
      // and must keep its Cast so the query keeps that behavior.
      case Cast(IntBound(k), dt, _, _) if fits(k, dt) => Some(k)
      case _ => None
    }
  }

  /** Does the known Int value survive a cast to `dt` unchanged? */
  private def fits(k: Int, dt: DataType): Boolean = dt match {
    case ByteType => k >= Byte.MinValue && k <= Byte.MaxValue
    case ShortType => k >= Short.MinValue && k <= Short.MaxValue
    case IntegerType | LongType => true
    case _ => false
  }

  private def intWidth(dt: DataType): Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case LongType => 8
    case _ => -1 // non-integral: never unwrapped
  }

  /** True iff a cast from `from` to `to` is integral widening — value-
    * preserving for ANY runtime value, which is what an unwrap of a
    * non-literal child requires.
    */
  private def widens(from: DataType, to: DataType): Boolean = {
    val f = intWidth(from); val t = intWidth(to)
    f > 0 && t >= f
  }

  /** An un-thresholded levenshtein call, possibly behind the widening
    * cast the analyzer inserts when the bound literal is a wider
    * integral type (value-preserving, so unwrapping is lossless).
    */
  private object LevCall {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      // levenshtein returns INT; only INT→INT/BIGINT casts are widening
      case Cast(lev @ Levenshtein(a, b, None), dt, _, _)
        if widens(lev.dataType, dt) => Some((a, b))
      case _ => None
    }
  }

  /** One conjunct → Some(replacement, extra-prefilter) when it is a
    * bounded-levenshtein test on an un-thresholded call.
    */
  private def rewriteOne(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(LevCall(a, b), IntBound(ki)) if ki >= 0 =>
        val k = Literal(ki)
        Some((GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0)),
          band(a, b, k)))
      case GreaterThanOrEqual(IntBound(ki), LevCall(a, b)) if ki >= 0 =>
        val k = Literal(ki)
        Some((GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0)),
          band(a, b, k)))
      case LessThan(LevCall(a, b), IntBound(ki)) if ki >= 1 =>
        val k1 = Literal(ki - 1)
        Some((GreaterThanOrEqual(Levenshtein(a, b, Some(k1)), Literal(0)),
          band(a, b, k1)))
      case GreaterThan(IntBound(ki), LevCall(a, b)) if ki >= 1 =>
        val k1 = Literal(ki - 1)
        Some((GreaterThanOrEqual(Levenshtein(a, b, Some(k1)), Literal(0)),
          band(a, b, k1)))
      case EqualTo(LevCall(a, b), IntBound(ki)) if ki >= 0 =>
        val k = Literal(ki)
        Some((EqualTo(Levenshtein(a, b, Some(k)), k), band(a, b, k)))
      case EqualTo(IntBound(ki), LevCall(a, b)) if ki >= 0 =>
        val k = Literal(ki)
        Some((EqualTo(Levenshtein(a, b, Some(k)), k), band(a, b, k)))
      case _ => None
    }

  private def augment(cond: Expression): Expression = {
    var changed = false
    val out = splitConjunctivePredicates(cond).flatMap { c =>
      rewriteOne(c) match {
        case Some((replacement, prefilter)) =>
          changed = true
          Seq(prefilter, replacement) // cheap band first: And short-circuits
        case None => Seq(c)
      }
    }
    if (changed) out.reduce(And) else cond
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val n = augment(cond)
      if (n.fastEquals(cond)) f else f.copy(condition = n)
    case j @ Join(_, _, _, Some(cond), _) =>
      val n = augment(cond)
      if (n.fastEquals(cond)) j else j.copy(condition = Some(n))
  }
}
