package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure range-containment inner join into
  * the bin-bucketed equi-join — the (c)-rung `Rule[LogicalPlan]`
  * complement to the manual composition in queries/RangeJoin (q82).
  *
  * A join whose ONLY cross-side predicates are `p >= lo AND p < hi`
  * has no equi keys, so Spark must plan a nested loop —
  * O(|intervals| × |points|) comparisons and, past broadcast size, a
  * replicated cartesian. With a bin width W (set
  * `spark.graft.rangejoin.binWidth` > 0; pick W ≥ the widest
  * interval), this rule:
  *
  *   1. explodes the INTERVAL side to its covered bins
  *      (`sequence(floor(lo/W), floor((hi-1)/W))` — ≤ 2 bins when W
  *      bounds the interval width),
  *   2. projects `floor(p/W)` on the POINT side (never replicated, so
  *      each matching pair meets in exactly one bin — dedup-free),
  *   3. joins on bin equality AND the original condition (the bin
  *      join is a superset filter; the residual keeps exactness),
  *   4. projects back to the original output.
  *
  * The planner then sees an equi predicate and picks a shuffled hash
  * or sort-merge join on uniform bin keys. Applies only to INNER
  * joins between batch plans whose bounds are LongType (epoch
  * seconds/numeric domains) with no existing cross-side equi
  * conjunct; anything else is left untouched. Empty intervals
  * (hi ≤ lo) clamp to one bin and are removed by the residual.
  *
  * Width selection: when the upper bound is structurally
  * `lo + literal` (the fixed-width-window case — q82's
  * `e = s + 7 days`), the width IS that literal and the rewrite
  * self-configures; `spark.graft.rangejoin.binWidth` covers
  * variable-width intervals (set it ≥ the widest interval — wider
  * bins mean more residual-filtered candidates, never wrong rows).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  final val WidthConf = "spark.graft.rangejoin.binWidth"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** (point, lo, hi, strictUpper, pointOnLeft) for a pure range join. */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
    : Option[(Expression, Expression, Expression, Boolean, Boolean)] = {
    val cs = conjuncts(cond)
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // an existing cross-side equi conjunct means Spark already has a
    // hash key — nothing to fix
    val hasEqui = cs.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None
    // normalize every cross-side comparison to (point cmp bound)
    sealed trait Cmp; case object Ge extends Cmp; case object Lt extends Cmp
    case object Le extends Cmp
    def norm(c: Expression): Option[(Expression, Cmp, Expression)] = c match {
      case GreaterThanOrEqual(a, b) => Some((a, Ge, b))
      case LessThan(a, b) => Some((a, Lt, b))
      case LessThanOrEqual(a, b) => Some((a, Le, b))
      case GreaterThan(a, b) => Some((b, Lt, a))
      case _ => None
    }
    val bounds = cs.flatMap(norm).flatMap { case (a, cmp, b) =>
      for (sa <- sideOf(a); sb <- sideOf(b); if sa != sb;
           if a.dataType == LongType && b.dataType == LongType;
           if a.deterministic && b.deterministic)
        yield (a, cmp, b, sa)
    }
    val lowers = bounds.collect { case (p, Ge, lo, s) => (p, lo, s) }
    val uppers = bounds.collect {
      case (p, Lt, hi, s) => (p, hi, true, s)
      case (p, Le, hi, s) => (p, hi, false, s)
    }
    (for {
      (p1, lo, s1) <- lowers
      (p2, hi, strict, s2) <- uppers
      if s1 == s2 && p1.semanticEquals(p2)
    } yield (p1, lo, hi, strict, s1)).headOption
  }

  private def floorDiv(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble)))

  /** `hi = lo + c` (either operand order) fixes the interval width. */
  private def derivedWidth(lo: Expression, hi: Expression): Option[Long] =
    hi match {
      case Add(a, Literal(c: Long, LongType), _) if a.semanticEquals(lo) => Some(c)
      case Add(Literal(c: Long, LongType), a, _) if a.semanticEquals(lo) => Some(c)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confWidth = conf.getConfString(WidthConf, "0").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
        matchRange(cond, left, right) match {
          case Some((p, lo, hi, strict, pointOnLeft))
              if derivedWidth(lo, hi).getOrElse(confWidth) > 0 =>
            val width = derivedWidth(lo, hi).getOrElse(confWidth)
            val hiAdj = if (strict) Subtract(hi, Literal(1L)) else hi
            val loBin = floorDiv(lo, width)
            val hiBin = floorDiv(hiAdj, width)
            // clamp: an empty interval still yields one (dead) bin
            // rather than a descending sequence
            // Sequence is TimeZoneAware — without an explicit zone the
            // rewritten expression stays unresolved post-analysis
            val seq = Sequence(loBin, Greatest(Seq(loBin, hiBin)), None,
              Some(conf.sessionLocalTimeZone))
            val binI = AttributeReference("__graft_bin", LongType,
              nullable = false)()
            val binPAlias = Alias(floorDiv(p, width), "__graft_bin_p")()
            val (intervalSide, pointSide) =
              if (pointOnLeft) (right, left) else (left, right)
            val gen = Generate(ExplodeBase(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binI), child = intervalSide)
            val proj = Project(pointSide.output :+ binPAlias, pointSide)
            val newCond = And(EqualTo(binI, binPAlias.toAttribute), cond)
            val newJoin =
              if (pointOnLeft) Join(proj, gen, Inner, Some(newCond), hint)
              else Join(gen, proj, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          case _ => j
        }
    }
  }

  /** Explode without the codegen fallback ambiguity. */
  private def ExplodeBase(e: Expression): Explode = Explode(e)
}
