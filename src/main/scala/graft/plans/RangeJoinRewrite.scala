package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst rewrite of range theta joins into binned equi-joins — the
  * [[graft.operators.RangeJoin]] operators (point-in-interval AND
  * interval-overlap) promoted from library calls to an optimizer rule,
  * so a PLAIN user-written `p BETWEEN s AND e` or
  * `sA <= eB AND sB <= eA` join is rescued at plan time.
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
    val raw = conf.getConfString(BinSizeKey, "")
    val binSize = scala.util.Try(raw.toLong).toOption.filter(_ > 0)
    // The user opted in; a typo ("1h", "0") silently yielding the
    // nested-loop plan the rule exists to prevent is the worst outcome
    // — warn loudly instead of treating it as unset.
    if (raw.nonEmpty && binSize.isEmpty) {
      logWarning(s"$BinSizeKey='$raw' is not a positive integral bin size " +
        "(units of the point column); range-join rewrite DISABLED — " +
        "range joins will plan as nested-loop/cartesian.")
    }
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
    val lit = Literal(b, LongType)
    def div(x: Expression) = new IntegralDivide(asLong(x), lit)
    // Sequence is TimeZoneAwareExpression: resolution demands a zone
    // even for integral inputs, so bind the session one explicitly
    def explodeBins(s: Expression, e: Expression, child: LogicalPlan, name: String) = {
      val attr = AttributeReference(name, LongType, nullable = false)()
      (attr, Generate(Explode(Sequence(div(s), div(e), None,
        Some(conf.sessionLocalTimeZone))), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(attr), child = child))
    }

    pick.map { case ((p, s, e), pointOnLeft) =>
      val pointPlan = if (pointOnLeft) j.left else j.right
      val ivPlan = if (pointOnLeft) j.right else j.left
      val binP = Alias(div(p), "__graft_bin_p")()
      val newPoint = Project(pointPlan.output :+ binP, pointPlan)
      val (binIv, gen) = explodeBins(s, e, ivPlan, "__graft_bin_iv")
      val cond = And(EqualTo(binP.toAttribute, binIv), j.condition.get)
      val joined =
        if (pointOnLeft) Join(newPoint, gen, Inner, Some(cond), j.hint)
        else Join(gen, newPoint, Inner, Some(cond), j.hint)
      Project(j.output, joined)
    }.orElse {
      // interval-OVERLAP shape: sL <= eR AND sR <= eL — one upper bound
      // in each direction. Both sides explode over their bin ranges and
      // the pair is anchored to greatest(sL div b, sR div b): that bin
      // provably lies in both exploded ranges whenever the two
      // inequalities hold (monotone truncating division; the argument
      // needs nothing else, so even degenerate e < s inputs stay exact),
      // and anchoring emits each matching pair exactly once.
      val uppers = bounds.filterNot(_.lower)
      (for {
        u1 <- uppers if from(j.left)(u1.point) && from(j.right)(u1.bound) &&
          integral(u1.point) && integral(u1.bound)
        u2 <- uppers if from(j.right)(u2.point) && from(j.left)(u2.bound) &&
          integral(u2.point) && integral(u2.bound)
      } yield (u1.point, u2.bound, u2.point, u1.bound)).headOption.map {
        case (sL, eL, sR, eR) =>
          val (binL, genL) = explodeBins(sL, eL, j.left, "__graft_bin_l")
          val (binR, genR) = explodeBins(sR, eR, j.right, "__graft_bin_r")
          val anchor = Greatest(Seq(div(sL), div(sR)))
          val cond = And(And(EqualTo(binL, binR), EqualTo(binL, anchor)),
            j.condition.get)
          Project(j.output, Join(genL, genR, Inner, Some(cond), j.hint))
      }
    }
  }
}
