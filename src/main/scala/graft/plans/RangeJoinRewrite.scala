package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst rewrite of point-in-interval theta joins into binned
  * equi-joins — [[graft.operators.RangeJoin.binnedPointInInterval]]
  * promoted from a library call to an optimizer rule, so a PLAIN
  * user-written `p BETWEEN s AND e` join is rescued at plan time.
  *
  * Spark plans a pure range condition as BroadcastNestedLoopJoin (small
  * side) or CartesianProduct (two large sides) — O(|P|·|I|) and
  * undistributable, the single worst plan shape at 100 TB. With
  * `spark.graft.rangeJoin.binSize = B` set (in the point column's own
  * units), an inner join whose condition lower- AND upper-bounds one
  * integral expression of one side by expressions of the other is
  * rewritten to
  *
  *   points  + __graft_bin_p = p div B
  *   intervals exploded over sequence(s div B, e div B)
  *   equi-join on the bin ± the ORIGINAL condition as residual
  *
  * which hash-partitions both sides by bin. Exactness: truncating
  * division is monotone non-decreasing, so s ≤ p ≤ e implies p's bin
  * lies in the interval's exploded bin range (any sign); each pair
  * meets on exactly one bin (the point has one), so no duplicates. The
  * residual keeps strict bounds and extra conjuncts exact.
  *
  * Deliberately opt-in (no default B): the right bin size is a data
  * statement — interval span over B bounds the explode factor — and
  * only the user knows the interval widths. Same contract as the
  * library form's binSize parameter.
  *
  * Scope guards: inner joins only (outer row preservation would need
  * null-extension logic the library form also doesn't claim); skipped
  * when any equi-conjunct already spans both sides (Spark hash-joins on
  * it and the range is a cheap residual — also what makes this rule a
  * fixed point: its own output is equi-keyed).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  private case class Bound(point: Expression, bound: Expression, lower: Boolean)

  /** Both readings of an inequality: `a >= b` lower-bounds a by b AND
    * upper-bounds b by a; which one is "the point" is decided later by
    * which side has both a lower and an upper bound.
    */
  private def readings(c: Expression): Seq[Bound] = c match {
    case GreaterThanOrEqual(a, b) => Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case GreaterThan(a, b) => Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case LessThanOrEqual(a, b) => Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case LessThan(a, b) => Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case _ => Seq.empty
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize = scala.util.Try(
      conf.getConfString(BinSizeKey, "").toLong).toOption.filter(_ > 0)
    binSize match {
      case None => plan
      case Some(b) => plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) if j.resolved =>
          rewrite(j, b).getOrElse(j)
      }
    }
  }

  private def rewrite(j: Join, b: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val spansBoth = (e: Expression) =>
      e.references.intersect(j.left.outputSet).nonEmpty &&
        e.references.intersect(j.right.outputSet).nonEmpty
    val hasEqui = conjuncts.exists {
      case eq @ (_: EqualTo | _: EqualNullSafe) => spansBoth(eq)
      case _ => false
    }
    if (hasEqui) return None

    def from(side: LogicalPlan)(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

    val bounds = conjuncts.flatMap(readings)
    // the point side must carry BOTH a lower and an upper bound whose
    // bound expressions live wholly on the other side
    def boundPair(pointSide: LogicalPlan, ivSide: LogicalPlan): Option[(Expression, Expression, Expression)] = {
      val eligible = bounds.filter(bd =>
        from(pointSide)(bd.point) && from(ivSide)(bd.bound) &&
          integral(bd.point) && integral(bd.bound))
      (for {
        lo <- eligible.filter(_.lower)
        hi <- eligible.filterNot(_.lower)
        if lo.point.semanticEquals(hi.point)
      } yield (lo.point, lo.bound, hi.bound)).headOption
    }

    val leftIsPoint = boundPair(j.left, j.right)
    val pick = leftIsPoint.map((_, true)).orElse(boundPair(j.right, j.left).map((_, false)))
    pick.map { case ((p, s, e), pointOnLeft) =>
      val pointPlan = if (pointOnLeft) j.left else j.right
      val ivPlan = if (pointOnLeft) j.right else j.left
      val lit = Literal(b, LongType)
      val binP = Alias(new IntegralDivide(asLong(p), lit), "__graft_bin_p")()
      val newPoint = Project(pointPlan.output :+ binP, pointPlan)
      val binIv = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: resolution demands a zone
      // even for integral inputs, so bind the session one explicitly
      val seq = Sequence(
        new IntegralDivide(asLong(s), lit), new IntegralDivide(asLong(e), lit),
        None, Some(conf.sessionLocalTimeZone))
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(binIv), child = ivPlan)
      val cond = And(EqualTo(binP.toAttribute, binIv), j.condition.get)
      val joined =
        if (pointOnLeft) Join(newPoint, gen, Inner, Some(cond), j.hint)
        else Join(gen, newPoint, Inner, Some(cond), j.hint)
      Project(j.output, joined)
    }
  }
}
