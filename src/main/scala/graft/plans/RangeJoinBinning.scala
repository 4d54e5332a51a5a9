package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a range join with NO equi key —
  * `A JOIN B ON abs(a.t - b.t) <= w` — into the binned equi-join form,
  * automatically.
  *
  * Written naively, that join has no equality predicate, so Spark can
  * only plan a broadcast-nested-loop / cartesian product:
  * O(|A|·|B|) comparisons, dead at scale (see `rj1_range_join_binned`
  * for the hand-built alternative). The rewrite this rule applies is the
  * same one rj1 hand-codes:
  *
  *  - bin both times by width `w` (`t DIV w`),
  *  - explode the RIGHT side into its 3 adjacent bins (range 2w spans at
  *    most 3 w-wide bins, so {bin-1, bin, bin+1} is exhaustive; a given
  *    pair matches in exactly one bin copy, so no dedup is needed),
  *  - equi-join on the bin with the ORIGINAL range predicate kept as a
  *    residual condition, and project the bin columns back out.
  *
  * The planner then extracts the bin equality into a shuffled hash /
  * sort-merge join: per-key fan-in bounded by event density per window,
  * the plan shape a 100 TB interval join needs. Works for INNER and LEFT
  * OUTER joins (left-preservation is unaffected: a left row with no
  * in-range partner matches no bin copy). Long (e.g. epoch-micros)
  * operands only — `unix_micros(ts)` upstream puts timestamps in scope.
  *
  * Fires only when the join has no equality conjunct already (after the
  * rewrite the join HAS one, so the rule is idempotent by construction).
  * Active in sessions built `.withExtensions(new GraftExtensions)`
  * (injected as an optimizer rule) or via [[install]] on a live session.
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotently activate on an existing session (the
    * `experimental.extraOptimizations` hook — runs as the optimizer's
    * final user batch, still before physical planning).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** `abs(x - y) <= w` / `w >= abs(x - y)` with a positive literal w. */
  private def rangePattern(e: Expression): Option[(Expression, Expression, Long)] =
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), wl) =>
        longLit(wl).filter(_ > 0).map((x, y, _))
      case GreaterThanOrEqual(wl, Abs(Subtract(x, y, _), _)) =>
        longLit(wl).filter(_ > 0).map((x, y, _))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftOuter) && !hasEquiKey(cond, j) =>
      val oriented = splitConjunctivePredicates(cond).iterator
        .flatMap(rangePattern(_).iterator)
        .flatMap { case (x, y, w) => orient(x, y, left, right).map { case (l, r) => (l, r, w) } }
        .nextOption()
      oriented match {
        case Some((lTime, rTime, w)) => rewrite(j, jt, hint, lTime, rTime, w)
        case None => j
      }
  }

  /** Any conjunct already equating a left expression with a right one
    * means the planner has a hash key — nothing to fix.
    */
  private def hasEquiKey(cond: Expression, j: Join): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => acrossSides(a, b, j.left, j.right)
      case EqualNullSafe(a, b) => acrossSides(a, b, j.left, j.right)
      case _ => false
    }

  private def acrossSides(
      a: Expression, b: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  /** Resolve which operand belongs to which side; abs is symmetric. */
  private def orient(
      x: Expression, y: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] =
    if (x.dataType != LongType || y.dataType != LongType) None
    else if (x.references.subsetOf(left.outputSet) && x.references.nonEmpty &&
      y.references.subsetOf(right.outputSet) && y.references.nonEmpty) Some((x, y))
    else if (y.references.subsetOf(left.outputSet) && y.references.nonEmpty &&
      x.references.subsetOf(right.outputSet) && x.references.nonEmpty) Some((y, x))
    else None

  private def rewrite(
      j: Join, jt: JoinType, hint: JoinHint,
      lTime: Expression, rTime: Expression, w: Long): LogicalPlan = {
    val width = Literal(w, LongType)
    val lBin = Alias(IntegralDivide(lTime, width), "graft_bin_l")()
    val newLeft = Project(j.left.output :+ lBin, j.left)
    val rBase = IntegralDivide(rTime, width)
    val rBins = CreateArray(Seq(
      Subtract(rBase, Literal(1L)), rBase, Add(rBase, Literal(1L))))
    val rBinAttr = AttributeReference("graft_bin_r", LongType)()
    val newRight =
      Generate(Explode(rBins), Nil, outer = false, None, Seq(rBinAttr), j.right)
    val newCond = And(EqualTo(lBin.toAttribute, rBinAttr), j.condition.get)
    Project(j.output, Join(newLeft, newRight, jt, Some(newCond), hint))
  }
}
