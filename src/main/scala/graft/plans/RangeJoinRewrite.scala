package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan a declarative point-in-interval theta join as the
  * binned equi-join [[graft.flow.RangeJoin]] builds by hand.
  *
  * Spark plans `points JOIN intervals ON lo <= pt AND pt <= hi` as a
  * broadcast nested loop (or a cartesian product) — O(|P|·|I|) with no
  * useful partitioning. This rule recognizes the pattern post-analysis
  * and rewrites it to: quantize `pt` to a bin, explode each interval onto
  * the bins it covers, equi-join on the bin id, and keep the original
  * range predicate as the exact refinement filter. The join then hash
  * partitions, AQE can size and skew-split it, and cost is proportional
  * to matching bins.
  *
  * Enabled by setting `spark.graft.rangeJoin.binWidth` to a positive bin
  * width (same tuning rule as RangeJoin.pointInInterval: ≈ the typical
  * interval length); 0 (the default) disables the rewrite entirely, so
  * the rule is inert unless asked for. Applies only to INNER joins whose
  * condition is exactly the two range conjuncts over integral columns,
  * with the point expression on one side and both bounds on the other.
  *
  * Correctness notes: integer division truncates toward zero on both the
  * point and the bounds, and truncation is monotone, so bin(pt) always
  * lies in [bin(lo), bin(hi)] when lo ≤ pt ≤ hi — no candidate is lost.
  * NULL points/bounds produce NULL bins/sequences and drop, matching the
  * theta join. Empty intervals (lo > hi) generate a descending bin
  * sequence (Spark's default-step rule); the refinement predicate
  * removes every such candidate, matching the theta join's empty result.
  * The rewrite is idempotent: the rewritten join carries three
  * conjuncts, which the two-conjunct pattern no longer matches.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerInterval"

  /** A malformed conf value must not take down every query in the
    * session (this rule runs on ALL plans): log and fall back to the
    * key's default (which for binWidth means disabled). */
  private def longConf(key: String, default: Long): Long =
    try {
      val v = conf.getConfString(key, default.toString).trim.toLong
      if (v >= 0) v
      else { logWarning(s"$key must be >= 0; falling back to default $default"); default }
    } catch {
      case _: NumberFormatException =>
        logWarning(s"$key is not a number; falling back to default $default")
        default
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bw = longConf(BinWidthConf, 0L)
    val maxBins = math.max(1L, longConf(MaxBinsConf, 256L))
    if (bw <= 0) plan
    else plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        rewrite(j, bw, maxBins).getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Normalize a comparison to (smaller, larger) for `smaller <= larger`. */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b)    => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def rewrite(j: Join, bw: Long, maxBins: Long): Option[LogicalPlan] = {
    val cs = conjuncts(j.condition.get)
    if (cs.length != 2) return None
    val les = cs.flatMap(asLe(_))
    if (les.length != 2) return None
    val Seq((a1, b1), (a2, b2)) = les
    // lo <= pt && pt <= hi, in either conjunct order
    val matched =
      if (b1.semanticEquals(a2)) Some((b1, a1, b2))
      else if (b2.semanticEquals(a1)) Some((b2, a2, b1))
      else None
    matched.filter { case (pt, lo, hi) =>
      integral(pt) && integral(lo) && integral(hi)
    }.flatMap { case (pt, lo, hi) =>
      def from(side: AttributeSet, e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(side)
      val (lSet, rSet) = (j.left.outputSet, j.right.outputSet)
      val oriented =
        if (from(lSet, pt) && from(rSet, lo) && from(rSet, hi))
          Some((j.left, j.right, true))
        else if (from(rSet, pt) && from(lSet, lo) && from(lSet, hi))
          Some((j.right, j.left, false))
        else None
      oriented.map { case (points, intervals, pointsOnLeft) =>
        val binP = Alias(
          IntegralDivide(Cast(pt, LongType), Literal(bw)), "_graft_bin_p")()
        val pPlan = Project(points.output :+ binP, points)
        // Sequence is TimeZoneAwareExpression: post-analysis construction
        // must supply the zone itself or the plan flips to unresolved
        val loBin = IntegralDivide(Cast(lo, LongType), Literal(bw))
        val hiBin = IntegralDivide(Cast(hi, LongType), Literal(bw))
        val seq = new Sequence(loBin, hiBin, None, Some(conf.sessionLocalTimeZone))
        // Empty/inverted intervals (lo > hi — also the NULL-bound case,
        // whose comparison is NULL → else branch) produce NO bins:
        // Spark's default-step Sequence would otherwise generate a
        // DESCENDING |span|-element array for an inverted sentinel row,
        // sailing past a naive `span <= max` check on a negative span.
        // Ordered intervals then meet the replication budget, same
        // contract as RangeJoin.pointInInterval: a 10^11-bin span fails
        // fast with a named error, not an executor blow-up.
        val span = Add(Subtract(hiBin, loBin), Literal(1L))
        val budgeted = If(
          LessThanOrEqual(span, Literal(maxBins)),
          seq,
          Cast(new RaiseError(Literal(
            s"RangeJoinRewrite: an interval covers more than $MaxBinsConf=$maxBins " +
              s"bins at $BinWidthConf=$bw; widen the bin width or raise the budget")),
            seq.dataType))
        val guarded = If(
          Coalesce(Seq(LessThanOrEqual(loBin, hiBin), Literal(false))),
          budgeted,
          Literal.create(null, seq.dataType))
        val gen = Explode(guarded)
        val elem = gen.elementSchema.head
        val binI = AttributeReference("_graft_bin_i", elem.dataType, elem.nullable)()
        val iPlan = Generate(gen, Nil, outer = false, None, Seq(binI), intervals)
        val cond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
        val newJoin =
          if (pointsOnLeft) Join(pPlan, iPlan, Inner, Some(cond), j.hint)
          else Join(iPlan, pPlan, Inner, Some(cond), j.hint)
        Project(j.output, newJoin)
      }
    }
  }
}
