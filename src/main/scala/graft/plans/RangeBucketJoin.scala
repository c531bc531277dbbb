package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite inner joins whose condition carries a
  * constant-width time-range band
  *
  *   `r.t >= l.t + lo  AND  r.t <= l.t + hi`        (hi > lo)
  *
  * into a bucketed equi-join. The left side explodes into the (at most
  * two) W-wide buckets its `[l.t+lo, l.t+hi]` window can touch
  * (`W = hi - lo`), the right side is keyed by its own bucket, and
  * `bucket_probe = bucket_r` is added to the join keys; the original
  * condition is kept, so the rewrite is purely a candidate-set
  * reduction — semantics are exactly the input join's.
  *
  * Why this is an engine feature and not a query idiom: without it, a
  * pure range join plans as a nested-loop/cartesian (O(|L|·|R|)), and a
  * range join WITH an equi key (the q12 shape) goes quadratic per hot
  * key. With it, the quadratic blowup is confined to one W-wide bucket
  * — the same rewrite q12 hand-rolls, done by the optimizer for ANY
  * query in scope. This is the composition tier (c) of the build plan:
  * a `Rule[LogicalPlan]` registered through
  * `spark.experimental.extraOptimizations` / session extensions.
  *
  * Correctness of the 2-bucket probe: bucketing is `micros div W`
  * (truncating division). That map is monotone non-decreasing over
  * micros and every preimage run is at least W wide, so a window of
  * width exactly W intersects at most two runs — the runs of its two
  * endpoints. Any r satisfying the band therefore shares a bucket with
  * one of the endpoints, and `array_distinct` keeps the probe from
  * emitting the same bucket twice (no duplicate matches; the retained
  * original predicate re-filters everything else).
  *
  * Supported time encodings: TimestampType (compared in Catalyst's
  * microsecond domain via UnixMicros) and LongType (treated as opaque
  * ticks). Offsets: `+ INTERVAL` (TimestampAddInterval, sub-day, i.e.
  * DayTimeIntervalType literals) and long addition.
  */
object RangeBucketJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val ProbeName = "__graft_rb_probe"
  private val BucketName = "__graft_rb_bkt"

  /** Strip no-op casts the analyzer inserts around interval arithmetic. */
  private def stripped(e: Expression): Expression = e match {
    case c: Cast if c.dataType == c.child.dataType => stripped(c.child)
    case other => other
  }

  /** Normalize `e` to (base expression, constant offset) in the
    * microsecond/tick domain. Base keeps its original type.
    */
  private def asOffset(e: Expression): Option[(Expression, Long)] =
    stripped(e) match {
      case ta: TimestampAddInterval =>
        ta.children match {
          case Seq(t, Literal(m: Long, _: DayTimeIntervalType)) =>
            asOffset(t).map { case (b, o) => (b, o + m) }
          case _ => None
        }
      case Add(x, Literal(v: Long, LongType), _) =>
        asOffset(x).map { case (b, o) => (b, o + v) }
      case Add(Literal(v: Long, LongType), x, _) =>
        asOffset(x).map { case (b, o) => (b, o + v) }
      case t if t.dataType == TimestampType || t.dataType == LongType =>
        Some((t, 0L))
      case _ => None
    }

  /** `base` (+ constant `off` micros) as a LongType micro/tick count. */
  private def micros(base: Expression, off: Long): Expression = {
    val ticks = base.dataType match {
      case TimestampType => UnixMicros(base)
      case _ => base
    }
    if (off == 0L) ticks else Add(ticks, Literal(off))
  }

  private def bucket(base: Expression, off: Long, width: Long): Expression =
    IntegralDivide(micros(base, off), Literal(width))

  /** One side of a band: `rBase (+rOff) OP lBase (+lOff)`. */
  private case class Bound(rBase: Expression, rOff: Long,
                           lBase: Expression, lOff: Long)

  /** Classify a conjunct as a lower or upper bound of right-vs-left. */
  private def classify(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Bound, Boolean)] = {
    def side(a: Expression, b: Expression): Option[Bound] =
      for {
        (ra, rOff) <- asOffset(a)
        (lb, lOff) <- asOffset(b)
        if ra.references.nonEmpty && lb.references.nonEmpty
        if ra.references.subsetOf(right.outputSet) &&
          lb.references.subsetOf(left.outputSet)
      } yield Bound(ra, rOff, lb, lOff)
    c match {
      // r >= l  (lower) and its flipped spellings
      case GreaterThanOrEqual(a, b) =>
        side(a, b).map((_, true)).orElse(side(b, a).map((_, false)))
      case GreaterThan(a, b) =>
        side(a, b).map((_, true)).orElse(side(b, a).map((_, false)))
      case LessThanOrEqual(a, b) =>
        side(b, a).map((_, true)).orElse(side(a, b).map((_, false)))
      case LessThan(a, b) =>
        side(b, a).map((_, true)).orElse(side(a, b).map((_, false)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith("__graft_rb")) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(classify(_, left, right))
      val band = (for {
        (lo, isLo) <- bounds if isLo
        (hi, isHi) <- bounds if !isHi
        if lo.rBase.semanticEquals(hi.rBase) &&
          lo.lBase.semanticEquals(hi.lBase)
        // normalize both offsets onto the right base:
        //   r + rOff >= l + lOff  ⇔  r >= l + (lOff - rOff)
        loOff = lo.lOff - lo.rOff
        hiOff = hi.lOff - hi.rOff
        if hiOff > loOff
      } yield (lo.rBase, lo.lBase, loOff, hiOff)).headOption
      band match {
        case None => j
        case Some((rBase, lBase, lo, hi)) =>
          val w = hi - lo
          val probeAttr =
            AttributeReference(ProbeName, LongType, nullable = true)()
          val probes = ArrayDistinct(CreateArray(Seq(
            bucket(lBase, lo, w), bucket(lBase, hi, w))))
          val gen = Generate(Explode(probes), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(probeAttr), left)
          val bktAlias = Alias(bucket(rBase, 0L, w), BucketName)()
          val proj = Project(right.output :+ bktAlias, right)
          val newCond = And(cond, EqualTo(probeAttr, bktAlias.toAttribute))
          Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
      }
  }
}
