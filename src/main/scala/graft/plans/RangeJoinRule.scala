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
  *
  * Multi-dimensional containment (point-in-rectangle/box, up to
  * [[MaxDims]] axes): each distinct point expression with both
  * bounds becomes its own bin dimension — the interval side nests one
  * Generate per axis (≤ 2^D cells per box when widths bound the
  * spans), the point side projects one bin key per axis, and the join
  * keys on ALL of them — the automatic form of q92's manual grid-cell
  * composition. Every width must be structurally derivable in the
  * multi-dim case (the scalar conf cannot name two widths).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  final val WidthConf = "spark.graft.rangejoin.binWidth"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** One matched containment dimension: `p ∈ [lo, hi)`-style bounds
    * with the point expression on side `pointOnLeft`.
    */
  private case class RangeDim(p: Expression, lo: Expression, hi: Expression,
    strictLo: Boolean, strictHi: Boolean, pointOnLeft: Boolean)

  /** ALL pure range-containment dimensions of a join condition — one
    * per distinct point expression with both a lower and an upper
    * cross-side bound. Every comparison is read in BOTH orientations
    * (`a >= b` is also `b <= a`), so `lo <= p AND p < hi` and
    * `p > lo AND hi > p` match exactly like the canonical
    * `p >= lo AND p < hi`. A 2-D containment (point-in-rectangle)
    * yields two dims and rewrites to a grid-cell equi-join.
    */
  private def matchRanges(cond: Expression, left: LogicalPlan, right: LogicalPlan)
    : Seq[RangeDim] = {
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
    if (hasEqui) return Nil
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
    val all = for {
      (p1, true, sLo, lo, s1) <- bounds
      (p2, false, sHi, hi, s2) <- bounds
      if s1 == s2 && p1.semanticEquals(p2)
    } yield RangeDim(p1, lo, hi, sLo, sHi, s1)
    // one dim per distinct point expression, all points on ONE side
    // (a condition with point expressions on both sides is not a
    // containment join — leave it alone)
    val deduped = all.foldLeft(Seq.empty[RangeDim]) { (acc, d) =>
      if (acc.exists(_.p.semanticEquals(d.p))) acc else acc :+ d
    }
    if (deduped.map(_.pointOnLeft).distinct.size > 1) Nil else deduped
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

  /** Keep the exploded-bin blowup bounded: D dims ≤ 2^D rows per
    * interval when widths bound the spans. 3 matches the 3-key Morton
    * layout (graft_zorder3); real conditions are 1-D or 2-D.
    */
  private final val MaxDims = 3

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // malformed conf must disable the rewrite, not throw mid-optimization
    val confWidth = conf.getConfString(WidthConf, "0").toLongOption.getOrElse(0L)
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
        val dims = matchRanges(cond, left, right)
        // widths: structural (`hi = lo + c`) per dim; the session conf
        // is a single scalar, so it can only cover the 1-D case —
        // multi-dim rewrites require every width to be derivable
        val widths = dims.map(d => derivedWidth(d.lo, d.hi)
          .orElse(if (dims.size == 1 && confWidth > 0) Some(confWidth) else None))
        if (dims.isEmpty || dims.size > MaxDims || widths.exists(_.isEmpty) ||
          widths.exists(_.exists(_ <= 0))) j
        else {
          val pointOnLeft = dims.head.pointOnLeft
          val (intervalSide, pointSide) =
            if (pointOnLeft) (right, left) else (left, right)
          // one Generate per dimension, nested over the interval side;
          // one bin projection per dimension on the point side
          val (gen, binIs) = dims.zip(widths).zipWithIndex
            .foldLeft((intervalSide, Seq.empty[AttributeReference])) {
              case ((child, keys), ((d, Some(width)), i)) =>
                // half-open normalization on longs: p > lo ⇔ p >= lo+1,
                // p <= hi covers through hi, p < hi through hi-1.
                // The ±1 clamps at Long.MaxValue/MinValue: those
                // intervals are empty anyway, and wrapping (non-ANSI
                // eval) would bin them at the wrong end of the domain
                // instead of yielding the dead bin the residual filter
                // removes.
                val loAdj =
                  if (d.strictLo)
                    If(EqualTo(d.lo, Literal(Long.MaxValue)), d.lo,
                      Add(d.lo, Literal(1L)))
                  else d.lo
                val hiAdj =
                  if (d.strictHi)
                    If(EqualTo(d.hi, Literal(Long.MinValue)), d.hi,
                      Subtract(d.hi, Literal(1L)))
                  else d.hi
                val loBin = floorDiv(loAdj, width)
                val hiBin = floorDiv(hiAdj, width)
                // clamp: an empty interval still yields one (dead) bin
                // rather than a descending sequence.
                // Sequence is TimeZoneAware — without an explicit zone
                // the rewritten expression stays unresolved
                // post-analysis
                val seq = Sequence(loBin, Greatest(Seq(loBin, hiBin)), None,
                  Some(conf.sessionLocalTimeZone))
                val binI = AttributeReference(s"__graft_bin_$i", LongType,
                  nullable = false)()
                (Generate(Explode(seq), unrequiredChildIndex = Nil,
                  outer = false, qualifier = None,
                  generatorOutput = Seq(binI), child = child), keys :+ binI)
              case ((child, keys), ((_, None), _)) => (child, keys) // unreachable
            }
          val binPAliases = dims.zip(widths).zipWithIndex.map {
            case ((d, Some(width)), i) =>
              Alias(floorDiv(d.p, width), s"__graft_bin_p_$i")()
            case ((d, None), i) => // unreachable
              Alias(d.p, s"__graft_bin_p_$i")()
          }
          val proj = Project(pointSide.output ++ binPAliases, pointSide)
          val eqs = binIs.zip(binPAliases).map { case (bi, bp) =>
            EqualTo(bi, bp.toAttribute): Expression
          }
          val newCond = And(eqs.reduce(And), cond)
          val newJoin =
            if (pointOnLeft) Join(proj, gen, Inner, Some(newCond), hint)
            else Join(gen, proj, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
        }
    }
  }
}
