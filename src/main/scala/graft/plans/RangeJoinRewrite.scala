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
  *  - the point side projects `bin(p) = floor(p / w)`
  *  - NARROW intervals (spanning < `spark.graft.rangeJoin.maxBins` bins)
  *    explode `sequence(bin(lo), bin(hi−1))` and equi-join on the bin
  *    with the original condition as residual; each qualifying pair
  *    matches in exactly one bin — the point's — so no dedup is needed
  *  - WIDE intervals (open-ended sentinels like `hi = Long.MaxValue`,
  *    the common SCD "current row" shape) keep the original non-equi
  *    join, restricted to just those rows — correctness never depends
  *    on interval width, and a handful of sentinel rows may nested-loop
  *    without exploding a quadrillion-element sequence
  *  - both branches project the original output and union
  *
  * Empty intervals (`hi ≤ lo`) are filtered before the explode: they
  * match nothing under the inner join, and a descending `sequence` must
  * never be generated.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (domain units; pick ≈ the
  * typical interval length). 0 — the default — disables the rule; an
  * unparseable value logs a warning and disables rather than failing
  * every query in the session. Usable through `GraftExtensions`
  * (`spark.sql.extensions`) or `spark.experimental.extraOptimizations`.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBins"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, lo, hi) with point from `left` and lo/hi from `right`.
    * Every lower-bound candidate is tried — committing to the first
    * `≥` conjunct would let an unrelated cross-side threshold predicate
    * shadow the real range pattern.
    */
  private def pointInterval(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) &&
        integral(p) && integral(lo) => (p, lo)
      case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) &&
        integral(p) && integral(lo) => (p, lo)
    }
    lowers.flatMap { case (p, lo) =>
      conjuncts.collectFirst {
        case LessThan(p2, hi) if p2.semanticEquals(p) && fromRight(hi) && integral(hi) => hi
        case GreaterThan(hi, p2) if p2.semanticEquals(p) && fromRight(hi) && integral(hi) => hi
      }.map(hi => (p, lo, hi))
    }.headOption
  }

  private def hasCrossEqui(conjuncts: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.nonEmpty && b.references.nonEmpty) && (
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(BinWidthKey, "0")
    val w = raw.toLongOption.getOrElse {
      logWarning(s"$BinWidthKey='$raw' is not a long — range-join rewrite disabled")
      0L
    }
    if (w <= 0) return plan
    val maxBins = conf.getConfString(MaxBinsKey, "4096").toLongOption.getOrElse(4096L)
    // Floor of a double child is already LongType — no outer cast needed.
    def bin(e: Expression): Expression =
      Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble)))
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.getTagValue(RangeJoinRewrite.WideFallbackTag).isEmpty =>
        val conjuncts = splitConjunctivePredicates(cond)
        val matched =
          if (hasCrossEqui(conjuncts, left, right)) None
          else pointInterval(conjuncts, left, right).map((_, false))
            .orElse(pointInterval(conjuncts, right, left).map((_, true)))
        matched match {
          case None => j
          case Some(((p, lo, hi), swapped)) =>
            val (pointSide, ivSide) = if (swapped) (right, left) else (left, right)
            val hiMinus1 = Subtract(hi, Cast(Literal(1L), hi.dataType))
            val nonEmpty = LessThan(lo, hi)
            // Span check in DOUBLE arithmetic: Long subtraction wraps
            // (non-ANSI) for sentinel intervals like (Long.MinValue/2,
            // Long.MaxValue) and would misclassify a huge interval as
            // narrow, generating an impossible Sequence. Doubles lose
            // precision at that magnitude but never wrap, so a huge span
            // always lands in the wide branch; boundary imprecision only
            // flips narrow/wide, and both branches are correct.
            val narrow = LessThan(
              Subtract(Divide(Cast(hiMinus1, DoubleType), Literal(w.toDouble)),
                Divide(Cast(lo, DoubleType), Literal(w.toDouble))),
              Literal(maxBins.toDouble))

            // Narrow branch: bin equality + residual original condition.
            val binP = Alias(bin(p), "__graft_bin_p")()
            val pointP = Project(pointSide.output :+ binP, pointSide)
            val genOut = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
            // Sequence is TimeZoneAware: an optimizer-built instance must
            // carry the zone explicitly or the plan flips to unresolved.
            val gen = Generate(
              Explode(Sequence(bin(lo), bin(hiMinus1), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(genOut),
              child = Filter(And(nonEmpty, narrow), ivSide))
            val (nl, nr) = if (swapped) (gen, pointP) else (pointP, gen)
            val binned = Project(j.output, Join(nl, nr, Inner,
              Some(And(EqualTo(binP.toAttribute, genOut), cond)), hint))

            // Wide branch: sentinel/open-ended intervals keep the original
            // non-equi join over just those rows. Tagged so the next
            // fixpoint iteration doesn't re-split it forever.
            val wideIv = Filter(And(nonEmpty, Not(narrow)), ivSide)
            val (wl, wr) = if (swapped) (wideIv, pointSide) else (pointSide, wideIv)
            val wideJoin = Join(wl, wr, Inner, Some(cond), hint)
            wideJoin.setTagValue(RangeJoinRewrite.WideFallbackTag, ())
            val wide = Project(j.output, wideJoin)

            Union(Seq(binned, wide))
        }
    }
  }
}

object RangeJoinRewrite {
  /** Marks the wide-interval fallback join so the rule is a fixpoint. */
  val WideFallbackTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.rangeJoin.wideFallback")
}
