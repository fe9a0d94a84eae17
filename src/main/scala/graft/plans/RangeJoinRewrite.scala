package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst optimizer rule that rewrites a naive point-in-interval join
  * into the bin-bucketed equi-join of
  * [[graft.analytics.RangeJoin.pointInInterval]] — automatically, so a
  * user who writes the natural form
  *
  * {{{ points.join(intervals, pt >= lo && pt < hi) }}}
  *
  * gets the scalable plan instead of the BroadcastNestedLoopJoin Spark
  * would otherwise pick (O(|P|·|I|) comparisons — the non-equi join is
  * the one shape built-in planning cannot save at 100 TB).
  *
  * Rewrite, applied to INNER joins whose condition contains a
  * `p ≥ lo ∧ p < hi` conjunction (p integral from one side, lo/hi
  * integral from the other) and NO existing cross-side equi conjunct
  * (an equi key already gives a hash join — and the guard is also what
  * makes the rule a fixpoint, since the rewritten join carries one):
  *
  *  - point side projects `bin(p) = floor(p / w)`
  *  - interval side filters `lo < hi` (empty intervals match nothing
  *    under the inner join, and a descending `sequence` must never be
  *    generated), then explodes `sequence(bin(lo), bin(hi−1))`
  *  - the join becomes `bin equality ∧ original condition`, and a final
  *    Project restores the original output (each qualifying pair
  *    matches in exactly one bin — the point's — so no dedup is needed)
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (domain units; pick ≈ the
  * typical interval length). 0 — the default — disables the rule.
  * Usable through `GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, lo, hi) with point from `left` and lo/hi from `right`. */
  private def pointInterval(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) &&
        integral(p) && integral(lo) => (p, lo)
      case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) &&
        integral(p) && integral(lo) => (p, lo)
    }
    lower.flatMap { case (p, lo) =>
      conjuncts.collectFirst {
        case LessThan(p2, hi) if p2.semanticEquals(p) && fromRight(hi) && integral(hi) => hi
        case GreaterThan(hi, p2) if p2.semanticEquals(p) && fromRight(hi) && integral(hi) => hi
      }.map(hi => (p, lo, hi))
    }
  }

  private def hasCrossEqui(conjuncts: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "0").toLong
    if (w <= 0) return plan
    def bin(e: Expression): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val matched =
          if (hasCrossEqui(conjuncts, left, right)) None
          else pointInterval(conjuncts, left, right).map((_, false))
            .orElse(pointInterval(conjuncts, right, left).map((_, true)))
        matched match {
          case None => j
          case Some(((p, lo, hi), swapped)) =>
            val (pointSide, ivSide) = if (swapped) (right, left) else (left, right)
            val binP = Alias(bin(p), "__graft_bin_p")()
            val pointP = Project(pointSide.output :+ binP, pointSide)
            val genOut = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
            val hiMinus1 = Subtract(hi, Cast(Literal(1L), hi.dataType))
            // Sequence is TimeZoneAware: an optimizer-built instance must
            // carry the zone explicitly or the plan flips to unresolved.
            val gen = Generate(
              Explode(Sequence(bin(lo), bin(hiMinus1), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(genOut),
              child = Filter(LessThan(lo, hi), ivSide))
            val (newLeft, newRight) = if (swapped) (gen, pointP) else (pointP, gen)
            val binned = Join(newLeft, newRight, Inner,
              Some(And(EqualTo(binP.toAttribute, genOut), cond)), hint)
            Project(j.output, binned)
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }
}
