package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a point-in-interval join with NO equi-key
  *
  *   SELECT ... FROM points p JOIN intervals i ON p.t >= i.lo AND p.t < i.hi
  *   (also the inclusive `p.t BETWEEN i.lo AND i.hi` form, and the
  *   interval-OVERLAP form `a.lo < b.hi AND b.lo < a.hi` where both
  *   sides explode and the canonical-bucket filter keeps each pair
  *   exactly once)
  *
  * into the bucketed equi-join [[graft.relational.Queries.qRangeJoin]]
  * builds by hand — so plain `spark.sql` users get the scale-safe plan
  * automatically. Without the rewrite Spark can only plan this
  * condition as BroadcastNestedLoopJoin (or a cartesian product): the
  * O(n·m) shape that is fine at notebook scale and fatal at 100 TB.
  *
  * The rewrite fixes a bucket width W on the shared (long) domain,
  * explodes each interval row to `sequence(lo div W, (hi-1) div W)`
  * bucket ids via a [[Generate]], and joins on
  * `t div W = bucket` plus the ORIGINAL range condition. Truncating
  * division is monotone, so every point's single bucket lies within
  * its matching interval's bucket range — each qualifying pair
  * materializes exactly once and the join output is the true match
  * set; non-qualifying same-bucket pairs are discarded by the
  * retained range predicate. A Project restores the original output,
  * so the rewrite is invisible to the query.
  *
  * Guards: inner joins (plus LEFT/RIGHT OUTER when the preserved side
  * is the un-exploded point side); the range pair must be the ONLY
  * cross-side conjuncts apart from other non-equi residuals (if any
  * equi conjunct exists Spark already plans a hash join — and the
  * rewrite's own EqualTo makes it idempotent); `t`, `lo`, `hi` must be
  * deterministic LongType expressions each referencing exactly one
  * side. W comes from `spark.graft.rangeJoin.bucketWidth` (default
  * 604800 = 7 days of epoch seconds; set it near the median interval
  * length — replication per interval row is len/W + 1).
  * `spark.graft.rangeJoin.enabled=false` switches the rule off.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def width: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketWidth", "604800").toLong

  /** (point expr t, interval lo, exclusive-upper-bucket bound): the
    * lower bound is `t >= lo`; the upper bound is `t < hi` (bucket
    * range ends at (hi-1) div W) or `t <= hi` — the parser's
    * `BETWEEN lo AND hi` form — (bucket range ends at hi div W).
    * Either written order/orientation of each comparison is accepted.
    * Returns (t, lo, lastBucketBoundExclusiveMinusOne) where the
    * third element is the expression E with last bucket = E div W.
    */
  private def rangePair(conjuncts: Seq[Expression]): Option[(Expression, Expression, Expression)] = {
    val geq = conjuncts.collect {
      case GreaterThanOrEqual(t, lo) => (t, lo)
      case LessThanOrEqual(lo, t) => (t, lo)
    }
    val upper = conjuncts.collect {
      case LessThan(t, hi) => (t, Subtract(hi, Literal(1L, LongType)))
      case GreaterThan(hi, t) => (t, Subtract(hi, Literal(1L, LongType)))
      case LessThanOrEqual(t, hi) => (t, hi)
      case GreaterThanOrEqual(hi, t) => (t, hi)
    }
    (for {
      (t1, lo) <- geq
      (t2, last) <- upper
      if t1.semanticEquals(t2) && !lo.semanticEquals(last)
    } yield (t1, lo, last)).headOption
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty || !e.deterministic) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  /** Interval-OVERLAP pattern: two cross-side less-thans in opposite
    * directions (`a.lo < b.hi AND b.lo < a.hi`, strict or inclusive) —
    * each side is an interval. Returns
    * (loLeft, lastLeft, loRight, lastRight) where each `last` is the
    * expression E with last covered bucket = E div W.
    */
  private def overlapPair(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def minus1(e: Expression) = Subtract(e, Literal(1L, LongType))
    val lts = conjuncts.flatMap {
      case LessThan(x, y) => Some((x, y, true))
      case GreaterThan(y, x) => Some((x, y, true))
      case LessThanOrEqual(x, y) => Some((x, y, false))
      case GreaterThanOrEqual(y, x) => Some((x, y, false))
      case _ => None
    }.flatMap { case (x, y, strict) =>
      if (x.dataType != LongType || y.dataType != LongType) None
      else (sideOf(x, l, r), sideOf(y, l, r)) match {
        case (Some(xs), Some(ys)) if xs != ys => Some((x, y, strict, xs))
        case _ => None
      }
    }
    val lr = lts.filter(_._4)   // x on left, y on right: left.lo < right.hi
    val rl = lts.filterNot(_._4) // x on right, y on left: right.lo < left.hi
    (for {
      (loL, hiR, strictR, _) <- lr
      (loR, hiL, strictL, _) <- rl
    } yield (loL, if (strictL) minus1(hiL) else hiL,
             loR, if (strictR) minus1(hiR) else hiR)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      // Inner always; LEFT OUTER only when the PRESERVED side is the
      // point side (a point maps to exactly one bucket, so unmatched
      // preserved rows emit exactly once with nulls; the interval
      // side's Generate would duplicate a preserved unmatched
      // interval) — symmetrically RIGHT OUTER. The overlap form
      // explodes BOTH sides, so it stays Inner-only.
      case j @ Join(left, right, jt @ (Inner | LeftOuter | RightOuter), Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // any cross-side equi conjunct -> Spark already hash-joins
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }
        lazy val w = Literal(width, LongType)
        // Sequence is TimeZoneAwareExpression: a None zone is fine out
        // of the parser (ResolveTimeZone fills it) but UNRESOLVED when
        // inserted by an optimizer rule
        def buckets(lo: Expression, last: Expression): Expression =
          new Sequence(IntegralDivide(lo, w), IntegralDivide(last, w))
            .withTimeZone(conf.sessionLocalTimeZone)
        val pointForm = if (hasEqui) None else rangePair(conjuncts).flatMap {
          case (t, lo, last) if t.dataType == LongType &&
              lo.dataType == LongType && last.dataType == LongType =>
            (sideOf(t, left, right), sideOf(lo, left, right), sideOf(last, left, right)) match {
              case (Some(tSide), Some(ivSide), Some(ivSide2))
                  if ivSide == ivSide2 && tSide != ivSide =>
                val bk = AttributeReference("graft_range_bk", LongType, nullable = false)()
                val ivChild = if (tSide) right else left
                val gen = Generate(Explode(buckets(lo, last)), Nil, outer = false,
                  None, Seq(bk), ivChild)
                val newCond = And(EqualTo(IntegralDivide(t, w), bk), cond)
                // outer joins: only when the preserved side is the
                // un-exploded point side
                val typeOk = jt == Inner ||
                  (jt == LeftOuter && tSide) || (jt == RightOuter && !tSide)
                if (!typeOk) None else {
                  val newJoin =
                    if (tSide) Join(left, gen, jt, Some(newCond), hint)
                    else Join(gen, right, jt, Some(newCond), hint)
                  Some(Project(j.output, newJoin))
                }
              case _ => None
            }
          case _ => None
        }
        // interval-overlap form: BOTH sides explode to their covered
        // buckets; a straddling pair would match in several buckets, so
        // the join keeps only the CANONICAL one — the bucket holding
        // the overlap start max(lo_l, lo_r), provably inside both
        // sides' covered ranges for every pair the original predicate
        // accepts. Dedup is a codegen'd filter, not a distinct shuffle.
        lazy val overlapForm = if (hasEqui || jt != Inner) None else
          overlapPair(conjuncts, left, right).map { case (loL, lastL, loR, lastR) =>
            val bkL = AttributeReference("graft_range_bkl", LongType, nullable = false)()
            val bkR = AttributeReference("graft_range_bkr", LongType, nullable = false)()
            val genL = Generate(Explode(buckets(loL, lastL)), Nil, outer = false,
              None, Seq(bkL), left)
            val genR = Generate(Explode(buckets(loR, lastR)), Nil, outer = false,
              None, Seq(bkR), right)
            val canonical = EqualTo(bkL, IntegralDivide(Greatest(Seq(loL, loR)), w))
            val newCond = And(And(EqualTo(bkL, bkR), canonical), cond)
            Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
          }
        pointForm.orElse(overlapForm).getOrElse(j)
    }
  }
}
