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

  /** (point, lo, hi, strictLower, strictUpper, pointOnLeft) for a
    * pure range join. Every comparison is read in BOTH orientations
    * (`a >= b` is also `b <= a`), so `lo <= p AND p < hi` and
    * `p > lo AND hi > p` match exactly like the canonical
    * `p >= lo AND p < hi`.
    */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
    : Option[(Expression, Expression, Expression, Boolean, Boolean, Boolean)] = {
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
    // (point, isLower, strict, bound) readings of each comparison
    def norm(c: Expression): Seq[(Expression, Boolean, Boolean, Expression)] = c match {
      case GreaterThanOrEqual(a, b) => Seq((a, true, false, b), (b, false, false, a))
      case GreaterThan(a, b) => Seq((a, true, true, b), (b, false, true, a))
      case LessThan(a, b) => Seq((a, false, true, b), (b, true, true, a))
      case LessThanOrEqual(a, b) => Seq((a, false, false, b), (b, true, false, a))
      case _ => Nil
    }
    val bounds = cs.flatMap(norm).flatMap { case (p, isLower, strict, bound) =>
      for (sp <- sideOf(p); sb <- sideOf(bound); if sp != sb;
           if p.dataType == LongType && bound.dataType == LongType;
           if p.deterministic && bound.deterministic)
        yield (p, isLower, strict, bound, sp)
    }
    (for {
      (p1, true, sLo, lo, s1) <- bounds
      (p2, false, sHi, hi, s2) <- bounds
      if s1 == s2 && p1.semanticEquals(p2)
    } yield (p1, lo, hi, sLo, sHi, s1)).headOption
  }

  /** Exact `Math.floorDiv(e, w)` for w > 0 on longs — built from
    * truncating [[IntegralDivide]] with the negative-operand
    * correction, never a double cast (which silently loses precision
    * above 2^53 and could put a point and its covering interval in
    * different bins).
    */
  private def floorDiv(e: Expression, w: Long): Expression = {
    val wl = Literal(w)
    If(GreaterThanOrEqual(e, Literal(0L)),
      IntegralDivide(e, wl),
      Subtract(IntegralDivide(Add(e, Literal(1L)), wl), Literal(1L)))
  }

  /** `hi = lo + c` (either operand order) fixes the interval width. */
  private def derivedWidth(lo: Expression, hi: Expression): Option[Long] =
    hi match {
      case Add(a, Literal(c: Long, LongType), _) if a.semanticEquals(lo) => Some(c)
      case Add(Literal(c: Long, LongType), a, _) if a.semanticEquals(lo) => Some(c)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // malformed conf must disable the rewrite, not throw mid-optimization
    val confWidth = conf.getConfString(WidthConf, "0").toLongOption.getOrElse(0L)
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
        matchRange(cond, left, right)
          .map { case (p, lo, hi, strictLo, strictHi, pointOnLeft) =>
            ((p, lo, hi, strictLo, strictHi, pointOnLeft),
              derivedWidth(lo, hi).getOrElse(confWidth))
          } match {
          case Some(((p, lo, hi, strictLo, strictHi, pointOnLeft), width))
              if width > 0 =>
            // half-open normalization on longs: p > lo ⇔ p >= lo+1,
            // p <= hi covers through hi, p < hi through hi-1.
            // The ±1 clamps at Long.MaxValue/MinValue: those intervals
            // are empty anyway, and wrapping (non-ANSI eval) would bin
            // them at the wrong end of the domain instead of yielding
            // the dead bin the residual filter removes.
            val loAdj =
              if (strictLo)
                If(EqualTo(lo, Literal(Long.MaxValue)), lo, Add(lo, Literal(1L)))
              else lo
            val hiAdj =
              if (strictHi)
                If(EqualTo(hi, Literal(Long.MinValue)), hi, Subtract(hi, Literal(1L)))
              else hi
            val loBin = floorDiv(loAdj, width)
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
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
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
}
