package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Optimizer rule: plans a point-in-interval range join as the bucketed
 * equi-join of [[graft.engine.IntervalJoin]] AUTOMATICALLY, so a user
 * writing the natural predicate
 *
 *   iv.join(pt, pt("p") >= iv("lo") && pt("p") <= iv("hi"))
 *
 * gets one bucket-key shuffle + exact filter instead of the
 * BroadcastNestedLoopJoin Spark's built-in planner falls back to (the
 * quadratic, broadcast-bound shape that dies first at scale). This is
 * the (c)-tier extension point of the design ladder: a Rule[LogicalPlan]
 * registered through [[GraftExtensions]], used precisely where the
 * built-in operators cannot express the efficient plan.
 *
 * Pattern matched: an INNER join whose whole condition is the two-sided
 * bound `lo <= p AND p <= hi` (either comparison direction, either
 * join side holding the bounds) over LongType attributes, bounds both
 * from one side and the point from the other. The rewrite mirrors
 * IntervalJoin.pointsInIntervals exactly:
 *
 *   - interval side gains `explode(sequence(lo div W, hi div W, 1))`
 *     (explicit step 1: an empty interval yields an EMPTY bucket array,
 *     never a descending one);
 *   - point side gains `p div W` (every point has exactly ONE bucket,
 *     so each qualifying pair appears exactly once — no dedup pass);
 *   - equi-join on the bucket ids, original predicate re-applied as an
 *     exact Filter, original output restored by a Project.
 *
 * Truncating `div` is monotone, so lo <= p <= hi implies the point's
 * bucket lies in the interval's announced range — negatives included.
 * Null bounds/points produce a null sequence or bucket key and drop
 * out, matching the null semantics of the original predicate.
 *
 * Config: `spark.graft.intervalJoin.enabled` (default true),
 * `spark.graft.intervalJoin.bucketWidth` (default 3600000000 = one
 * hour in microseconds; any positive width is correct — width only
 * tunes the fanout/bucket-occupancy tradeoff).
 */
case class RewriteIntervalJoin() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.intervalJoin.enabled", "true").toBoolean
  private def width: Long =
    conf.getConfString("spark.graft.intervalJoin.bucketWidth", "3600000000").toLong

  /** Normalize a comparison to (smaller, larger) for `smaller <= larger`. */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b)    => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _                        => None
  }

  private def longAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if a.dataType == LongType => Some(a)
    case _                                               => None
  }

  /** If `cond` is exactly `lo <= p && p <= hi` with lo/hi from one join
    * side and p from the other, return (ivSide, ptSide, lo, hi, p). */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(LogicalPlan, LogicalPlan, AttributeReference, AttributeReference, AttributeReference)] =
    cond match {
      case And(c1, c2) =>
        for {
          (x1, y1) <- asLe(c1); (x2, y2) <- asLe(c2)
          // orient: one conjunct bounds p from below, the other from above
          (lo, p1, p2, hi) <-
            Some((x1, y1, x2, y2)).filter { case (_, a, b, _) => a.semanticEquals(b) }
              .orElse(Some((x2, y2, x1, y1)).filter { case (_, a, b, _) => a.semanticEquals(b) })
          loA <- longAttr(lo); hiA <- longAttr(hi); pA <- longAttr(p1)
          sides <- {
            val (l, r) = (left.outputSet, right.outputSet)
            if (l.contains(loA) && l.contains(hiA) && r.contains(pA))
              Some((left, right))
            else if (r.contains(loA) && r.contains(hiA) && l.contains(pA))
              Some((right, left))
            else None
          }
        } yield (sides._1, sides._2, loA, hiA, pA)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        matchRange(cond, left, right) match {
          case Some((ivSide, ptSide, lo, hi, p)) =>
            val w = Literal(width, LongType)
            // Sequence is TimeZoneAware: without an explicit zone the
            // expression never reports resolved post-analysis. It also
            // THROWS on inverted boundaries, so an empty or null-bound
            // interval must short-circuit to an empty bucket array
            // (same "match nothing" semantics as the original
            // predicate, whose null/empty comparisons are never true).
            val seqExpr = If(GreaterThanOrEqual(hi, lo),
              new Sequence(
                IntegralDivide(lo, w), IntegralDivide(hi, w),
                Some(Literal(1L, LongType)),
                Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
            val bktIv =
              AttributeReference("__bkt_iv", LongType, nullable = false)()
            val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bktIv), child = ivSide)
            val bktPtAlias = Alias(IntegralDivide(p, w), "__bkt_pt")()
            val proj = Project(ptSide.output :+ bktPtAlias, ptSide)
            val eq = Join(gen, proj, Inner,
              Some(EqualTo(bktIv, bktPtAlias.toAttribute)),
              JoinHint.NONE)
            Project(j.output, Filter(cond, eq))
          case None => j
        }
    }
}
