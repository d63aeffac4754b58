package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Max}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  * The rewrite fixes a bucket width W on the shared domain (LongType
  * natively; TimestampType / TimestampNTZType are widened to epoch
  * microseconds, which is exact — micros IS the internal timestamp
  * precision, so `t < hi` ⟺ `micros(t) <= micros(hi) - 1`), explodes
  * each interval row to `sequence(lo div W, (hi-1) div W)` bucket ids
  * via a [[Generate]], and joins on `t div W = bucket` plus the
  * ORIGINAL range condition. Truncating division is monotone, so
  * every point's single bucket lies within its matching interval's
  * bucket range — each qualifying pair materializes exactly once and
  * the join output is the true match set; non-qualifying same-bucket
  * pairs are discarded by the retained range predicate. A Project
  * restores the original output, so the rewrite is invisible to the
  * query.
  *
  * == Bucket width & replication bound ==
  *
  * Replication per interval row is span/W + 1, so an ill-chosen W is
  * a blowup (a 7-day interval over a micros domain at W=604800 is a
  * million-way explode; an accidental nanos-vs-seconds pairing worse).
  * By default (`spark.graft.rangeJoin.adaptiveWidth=true`) the rule
  * therefore derives W from the data with a one-off plan-time
  * pre-pass over the interval side — a column-pruned global aggregate
  * computing the max and approximate-median of
  * `greatest(last - lo, 0)` (memoized per canonicalized child, so
  * repeated optimizer batches and re-plans don't re-scan):
  *
  *   W = max(1, medianSpan, maxSpan/cap + 1),  cap = maxBucketsPerRow
  *
  * The median term balances buckets (≈2 buckets per typical
  * interval); the maxSpan/cap term HARD-BOUNDS every row's explode at
  * `cap`+1 ids, so no data distribution can exceed Spark's sequence
  * limit or OOM an executor — W is a free parameter, so raising it
  * never affects correctness, only bucket fan-out. With adaptivity
  * off the configured `spark.graft.rangeJoin.bucketWidth` is used,
  * but the same pre-pass still guards it: if maxSpan/W would exceed
  * the cap the rule logs and declines the rewrite (the query keeps
  * its original BNLJ plan rather than exploding). Inverted intervals
  * (lo > hi) clamp to a single bucket id — the retained predicate
  * rejects them anyway, and an unclamped descending `sequence` over a
  * garbage span is exactly the blowup the guard exists to stop.
  * Streaming interval sides cannot be pre-scanned; they use the
  * configured width unguarded (documented limitation — set the width
  * explicitly for streams).
  *
  * Guards: inner joins (plus LEFT/RIGHT OUTER when the preserved side
  * is the un-exploded point side); the range pair must be the ONLY
  * cross-side conjuncts apart from other non-equi residuals (if any
  * equi conjunct — EqualTo or EqualNullSafe — exists Spark already
  * plans a hash join, and the rewrite's own EqualTo makes it
  * idempotent); `t`, `lo`, `hi` must be deterministic Long- or
  * timestamp-typed expressions each referencing exactly one side.
  * `spark.graft.rangeJoin.bucketWidth` (default 604800) must be
  * positive — otherwise the rule logs and disables itself (W=0 under
  * non-ANSI IntegralDivide yields nulls and an inner join that
  * silently matches NOTHING; never risk that).
  * `spark.graft.rangeJoin.enabled=false` switches the rule off.
  */
case class RangeJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import RangeJoinRewrite.statsCache

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def configuredWidth: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketWidth", "604800").toLong

  private def adaptive: Boolean =
    conf.getConfString("spark.graft.rangeJoin.adaptiveWidth", "true").toBoolean

  private def maxBucketsPerRow: Long =
    conf.getConfString("spark.graft.rangeJoin.maxBucketsPerRow", "4096").toLong

  /** `spark.graft.rangeJoin.prepass=false` suppresses the plan-time
    * span aggregate entirely (adaptive width AND the blowup guard
    * fall back to the configured width unguarded) — the escape hatch
    * for latency-critical planning paths and explain()-only flows,
    * where a driver-blocking pre-scan job is unwelcome.
    */
  private def prepassEnabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.prepass", "true").toBoolean

  /** Normalize a comparison operand to the shared Long bucket domain;
    * the Boolean reports whether an NTZ cast was involved. Timestamps
    * widen to epoch micros (exact: micros is the internal precision
    * of both timestamp types). Anything else: not ours.
    */
  private def norm(e: Expression): Option[(Expression, Boolean)] = e.dataType match {
    case LongType => Some((e, false))
    case TimestampType => Some((UnixMicros(e), false))
    case TimestampNTZType =>
      // NTZ -> TZ at the session zone is monotone non-decreasing
      // (DST overlaps merge instants, never reorder them), which is
      // all bucket coverage needs; the retained original predicate
      // compares the untouched NTZ values. But the cast is NOT
      // injective: a DST-GAP local time maps to the same instant as
      // a later valid local time, so strict bounds must NOT tighten
      // by -1 in the normalized domain (t < hi with norm(t) ==
      // norm(hi) is possible) — callers check the flag.
      Some((UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))), true))
    case _ => None
  }

  /** (point expr t, interval lo, exclusive-upper-bucket bound), all in
    * the normalized Long domain: the lower bound is `t >= lo`; the
    * upper bound is `t < hi` (bucket range ends at (hi-1) div W) or
    * `t <= hi` — the parser's `BETWEEN lo AND hi` form — (bucket
    * range ends at hi div W). Either written order/orientation of
    * each comparison is accepted. Returns (t, lo, last) where
    * last div W is the final covered bucket.
    */
  private def rangePair(conjuncts: Seq[Expression]): Option[(Expression, Expression, Expression)] = {
    def n2(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
      for ((an, az) <- norm(a); (bn, bz) <- norm(b)) yield (an, bn, az || bz)
    val geq = conjuncts.flatMap {
      case GreaterThanOrEqual(t, lo) => n2(t, lo)
      case LessThanOrEqual(lo, t) => n2(t, lo)
      case _ => None
    }.map { case (tn, ln, _) => (tn, ln) }
    def m1(e: Expression) = Subtract(e, Literal(1L, LongType))
    // Strict upper bounds tighten to norm(hi)-1 ONLY when no NTZ cast
    // is involved: the non-injective NTZ->TZ normalization admits
    // t < hi with norm(t) == norm(hi) (DST gap), and -1 would then
    // put the point's bucket one past the interval's covered range —
    // one extra bucket per row is harmless, a dropped match is not.
    val upper = conjuncts.flatMap {
      case LessThan(t, hi) => n2(t, hi).map { case (tn, hn, z) => (tn, if (z) hn else m1(hn)) }
      case GreaterThan(hi, t) => n2(t, hi).map { case (tn, hn, z) => (tn, if (z) hn else m1(hn)) }
      case LessThanOrEqual(t, hi) => n2(t, hi).map { case (tn, hn, _) => (tn, hn) }
      case GreaterThanOrEqual(hi, t) => n2(t, hi).map { case (tn, hn, _) => (tn, hn) }
      case _ => None
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
    * (loLeft, lastLeft, loRight, lastRight), all normalized Long,
    * where each `last` is the expression E with last covered bucket
    * = E div W.
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
      (for ((xn, xz) <- norm(x); (yn, yz) <- norm(y)) yield (xn, yn, xz || yz)) match {
        // same NTZ rule as rangePair: strict bounds keep norm(hi)
        // itself when an NTZ cast made the normalization non-injective
        case Some((xn, yn, ntz)) => (sideOf(xn, l, r), sideOf(yn, l, r)) match {
          case (Some(xs), Some(ys)) if xs != ys => Some((xn, yn, strict && !ntz, xs))
          case _ => None
        }
        case None => None
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

  // ---- plan-time span statistics (adaptive width + blowup guard) ----

  /** Runs the column-pruned global aggregate
    * `SELECT max(s), approx_percentile(s, 0.5) FROM iv` with
    * `s = greatest(last - lo, 0)`. Returns (-1,-1) for an empty
    * interval side. One driver-blocking job per DISTINCT interval
    * child per session lifetime (memoized); the scan reads only the
    * bound columns.
    */
  private def spanStats(ivPlan: LogicalPlan, lo: Expression, last: Expression): (Long, Long) = {
    val key = (ivPlan.canonicalized.hashCode, lo.canonicalized.hashCode,
      last.canonicalized.hashCode)
    val cached = statsCache.get(key)
    if (cached != null) return cached
    val span = Greatest(Seq(Subtract(last, lo), Literal(0L, LongType)))
    val agg = Aggregate(Nil, Seq(
      Alias(Max(span).toAggregateExpression(), "graft_mx")(),
      Alias(new ApproximatePercentile(span, Literal(0.5d)).toAggregateExpression(),
        "graft_med")()), ivPlan)
    // the session this rule was INJECTED into, never SparkSession
    // .active: on a thread where a different session is active the
    // pre-pass must still run against the session owning the plan
    val row = GraftPlanBridge.ofRows(session, agg).collect().head
    val res = if (row.isNullAt(0)) (-1L, -1L) else (row.getLong(0), row.getLong(1))
    statsCache.put(key, res)
    res
  }

  /** Decide the bucket width for a rewrite whose exploding interval
    * side(s) are `ivSides` (plan, lo, last). Some(w) = rewrite with
    * width w; None = decline the rewrite (guard tripped).
    */
  private def chooseWidth(ivSides: Seq[(LogicalPlan, Expression, Expression)]): Option[Long] = {
    val wConf = configuredWidth
    val cap = math.max(1L, maxBucketsPerRow)
    if (!prepassEnabled) return Some(wConf)
    if (ivSides.exists(_._1.isStreaming)) return Some(wConf)
    val stats = ivSides.map { case (p, lo, last) =>
      try spanStats(p, lo, last) catch {
        case e: Exception =>
          logWarning(s"graft range-join span pre-pass failed (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}); falling back to configured bucket width")
          (-2L, -2L)
      }
    }
    if (stats.exists(_._1 == -2L)) return Some(wConf)
    val known = stats.filter(_._1 >= 0L)
    if (known.isEmpty) return Some(wConf) // empty interval side: any W is fine
    val mx = known.map(_._1).max
    val med = known.map(_._2).max
    if (adaptive) Some(math.max(1L, math.max(med, mx / cap + 1L)))
    else if (mx / wConf + 1L > cap) {
      logWarning(s"graft range-join rewrite declined: max interval span $mx at " +
        s"bucketWidth=$wConf exceeds maxBucketsPerRow=$cap buckets per row; " +
        "enable spark.graft.rangeJoin.adaptiveWidth or raise the width")
      None
    } else Some(wConf)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    if (configuredWidth <= 0L) {
      logWarning(s"spark.graft.rangeJoin.bucketWidth=$configuredWidth is not positive; " +
        "range-join rewrite disabled (W=0 would bucket-join NOTHING under non-ANSI " +
        "integral division)")
      return plan
    }
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
          case EqualNullSafe(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }
        // Sequence is TimeZoneAwareExpression: a None zone is fine out
        // of the parser (ResolveTimeZone fills it) but UNRESOLVED when
        // inserted by an optimizer rule. The Greatest clamp collapses
        // inverted intervals (last < lo) to one bucket id instead of a
        // descending sequence over a garbage span.
        def buckets(lo: Expression, last: Expression, w: Literal): Expression = {
          val loDiv = IntegralDivide(lo, w)
          new Sequence(loDiv, Greatest(Seq(IntegralDivide(last, w), loDiv)))
            .withTimeZone(conf.sessionLocalTimeZone)
        }
        val pointForm = if (hasEqui) None else rangePair(conjuncts).flatMap {
          case (t, lo, last) =>
            (sideOf(t, left, right), sideOf(lo, left, right), sideOf(last, left, right)) match {
              case (Some(tSide), Some(ivSide), Some(ivSide2))
                  if ivSide == ivSide2 && tSide != ivSide =>
                val ivChild = if (tSide) right else left
                // outer joins: only when the preserved side is the
                // un-exploded point side
                val typeOk = jt == Inner ||
                  (jt == LeftOuter && tSide) || (jt == RightOuter && !tSide)
                if (!typeOk) None
                else chooseWidth(Seq((ivChild, lo, last))).map { wv =>
                  val w = Literal(wv, LongType)
                  val bk = AttributeReference("graft_range_bk", LongType, nullable = false)()
                  val gen = Generate(Explode(buckets(lo, last, w)), Nil, outer = false,
                    None, Seq(bk), ivChild)
                  val newCond = And(EqualTo(IntegralDivide(t, w), bk), cond)
                  val newJoin =
                    if (tSide) Join(left, gen, jt, Some(newCond), hint)
                    else Join(gen, right, jt, Some(newCond), hint)
                  Project(j.output, newJoin)
                }
              case _ => None
            }
        }
        // interval-overlap form: BOTH sides explode to their covered
        // buckets; a straddling pair would match in several buckets, so
        // the join keeps only the CANONICAL one — the bucket holding
        // the overlap start max(lo_l, lo_r), provably inside both
        // sides' covered ranges for every pair the original predicate
        // accepts. Dedup is a codegen'd filter, not a distinct shuffle.
        lazy val overlapForm = if (hasEqui || jt != Inner) None else
          overlapPair(conjuncts, left, right).flatMap { case (loL, lastL, loR, lastR) =>
            chooseWidth(Seq((left, loL, lastL), (right, loR, lastR))).map { wv =>
              val w = Literal(wv, LongType)
              val bkL = AttributeReference("graft_range_bkl", LongType, nullable = false)()
              val bkR = AttributeReference("graft_range_bkr", LongType, nullable = false)()
              val genL = Generate(Explode(buckets(loL, lastL, w)), Nil, outer = false,
                None, Seq(bkL), left)
              val genR = Generate(Explode(buckets(loR, lastR, w)), Nil, outer = false,
                None, Seq(bkR), right)
              val canonical = EqualTo(bkL, IntegralDivide(Greatest(Seq(loL, loR)), w))
              val newCond = And(And(EqualTo(bkL, bkR), canonical), cond)
              Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
            }
          }
        pointForm.orElse(overlapForm).getOrElse(j)
    }
  }
}

object RangeJoinRewrite {
  /** (maxSpan, medianSpan) memo keyed by canonicalized (plan, lo,
    * last) hashes, shared across per-session rule instances. A hash
    * collision can only mis-size W — W never affects correctness —
    * and the map is tiny (LRU 64).
    */
  private val statsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Int, Int, Int), (Long, Long)](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Int, Int), (Long, Long)]): Boolean = size() > 64
    })

  private[graft] def clearStatsCache(): Unit = statsCache.clear()
}
