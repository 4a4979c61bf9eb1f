package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite point-in-interval theta joins to binned
  * equi-joins (extension level (c) — `Rule[LogicalPlan]` injected through
  * `graft.functions.GraftExtensions`).
  *
  * An inner join whose ONLY cross-side predicate is a time-range pair
  *
  *   `l.t >= r.s  AND  l.t < r.e`        (either side may hold the point)
  *
  * has no equi key, so Spark plans a broadcast-nested-loop or cartesian
  * product — O(|L|·|R|) and a guaranteed scale killer. The standard rewrite
  * (`graft.operators.RangeJoin` is its manual form): quantize time into
  * fixed bins, explode each interval to the bins it overlaps, equi-join on
  * the bin, and keep the exact range predicate as a residual filter. Each
  * (point, interval) pair meets in exactly the point's bin, so no dedup is
  * needed and results are identical.
  *
  * This rule applies that rewrite AUTOMATICALLY, so a user writing the
  * natural theta join gets the scalable plan. It fires only when:
  *  - the join is Inner with no equi conjunct (an equi key means sort-merge
  *    handles the range as a residual already — rewriting would only add
  *    duplication);
  *  - exactly one matching range pair exists on TimestampType columns.
  *
  * Conf knobs:
  *  - `spark.graft.rangeJoin.enabled` (default true)
  *  - `spark.graft.rangeJoin.binSeconds` (default 86400) — pick ≈ the
  *    typical interval length: interval-side duplication is
  *    len/binSeconds (+1), point side is never duplicated.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BinMicros = 1e6

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def binSeconds: Long =
    conf.getConfString("spark.graft.rangeJoin.binSeconds", "86400").toLong

  /** TIMESTAMP always bins correctly. TIMESTAMP_NTZ (what parquet
    * unadjusted timestamps infer as) bins through a session-zone cast,
    * which is only monotonic + offset-consistent when the zone has no DST
    * transitions — near a DST overlap the point and the interval ends
    * could shift by different offsets and the point's bin could fall
    * outside the generated range (a silently LOST match). So NTZ is
    * rewritten only under a fixed-offset session zone (UTC included);
    * otherwise the join is left alone — never fast-but-wrong.
    */
  private def binnable(dt: DataType): Boolean = dt match {
    case TimestampType    => true
    case TimestampNTZType =>
      try java.time.ZoneId.of(conf.sessionLocalTimeZone).getRules.isFixedOffset
      catch { case _: java.time.DateTimeException => false }
    case _ => false
  }

  private def micros(t: Expression): Expression = t.dataType match {
    case TimestampNTZType =>
      UnixMicros(Cast(t, TimestampType, Some(conf.sessionLocalTimeZone)))
    case _ => UnixMicros(t)
  }

  /** floor(micros(t) / binMicros) — Floor(Double) is LongType. */
  private def binOf(t: Expression, binUs: Double): Expression =
    Floor(Divide(Cast(micros(t), DoubleType), Literal(binUs)))

  /** Bin of the last instant BEFORE exclusive end e (e is never matched). */
  private def binOfEnd(e: Expression, binUs: Double): Expression =
    Floor(Divide(Cast(Subtract(micros(e), Literal(1L)), DoubleType), Literal(binUs)))

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** (point, start, end, pointOnLeft) if the conjunct pair forms a range. */
  private def rangePair(
      conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    // canonicalize each comparison into (smaller, larger, strict)
    val ordered = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (b, a, false)
      case LessThanOrEqual(a, b)    => (a, b, false)
      case GreaterThan(a, b)        => (b, a, true)
      case LessThan(a, b)           => (a, b, true)
    }
    // point >= start (non-strict lower bound), point < end (strict upper)
    val lowers = ordered.collect {
      case (s, p, false) => (p, s)
    }
    val uppers = ordered.collect {
      case (p, e, true) => (p, e)
    }
    val pairs = for {
      (p1, s) <- lowers
      (p2, e) <- uppers
      if p1.semanticEquals(p2)
      if p1.dataType == s.dataType && p1.dataType == e.dataType &&
        binnable(p1.dataType)
      pointOnLeft =
        fromOnly(p1, left) && fromOnly(s, right) && fromOnly(e, right)
      pointOnRight =
        fromOnly(p1, right) && fromOnly(s, left) && fromOnly(e, left)
      if pointOnLeft || pointOnRight
    } yield (p1, s, e, pointOnLeft)
    // refuse ambiguous conditions (two distinct range pairs)
    if (pairs.length == 1) pairs.headOption else None
  }

  private def hasEquiKey(
      conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case EqualNullSafe(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else rangePair(conjuncts, left, right) match {
          case None => j
          case Some((point, start, end, pointOnLeft)) =>
            val binUs = binSeconds * BinMicros
            val (pointSide, ivalSide) =
              if (pointOnLeft) (left, right) else (right, left)
            val pBin = Alias(binOf(point, binUs), "__graft_bin_p")()
            val pointProj = Project(pointSide.output :+ pBin, pointSide)
            val iBinAttr = AttributeReference("__graft_bin_i", LongType)()
            // Sequence is TimeZoneAwareExpression: without an explicit zone
            // it is UNRESOLVED and the optimizer rejects the plan (tz is
            // irrelevant for Long bounds, but resolution requires it)
            val ivalGen = Generate(
              Explode(Sequence(
                binOf(start, binUs), binOfEnd(end, binUs), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(iBinAttr), child = ivalSide)
            val (newLeft, newRight) =
              if (pointOnLeft) (pointProj, ivalGen) else (ivalGen, pointProj)
            val binJoin = Join(newLeft, newRight, Inner,
              Some(EqualTo(pBin.toAttribute, iBinAttr)), hint)
            // the full original condition (range pair + any other residual
            // conjuncts) re-applies above the equi join; project back to the
            // original output so the bin columns never escape
            Project(j.output, Filter(cond, binJoin))
        }
    }
  }
}
