package graft.plans

import graft.functions.DifflibRatioExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: in front of any `difflib_ratio(a,b) >= t`
  * predicate, inject the cheap length-bound prefilter
  *
  *   (len(a)+len(b) = 0) OR (2·least(len(a),len(b))/(len(a)+len(b)) >= t)
  *
  * — sound because 2·min/(sum) is an upper bound on the ratio (every
  * matched element exists in both strings), and exactly the manual
  * length prefilter the reference applies before its fuzzy loop
  * (reference: src/ETL_POIS/process_pois.py:203-204; SURVEY §4 "length
  * prefilter before fuzzy ratio"). Catalyst's predicate ordering then
  * evaluates the cheap bound first and short-circuits the O(n·m)
  * matcher on most rows.
  *
  * Registered through [[GraftExtensions]]
  * (`SparkSession.builder().withExtensions(new GraftExtensions)`) or
  * ad hoc via `spark.experimental.extraOptimizations`.
  */
object FuzzyPrefilterRule extends Rule[LogicalPlan] {

  private def bound(a: Expression, b: Expression, t: Expression): Expression = {
    val la = Length(a); val lb = Length(b)
    val sum = Add(la, lb)
    val ub = Divide(
      Multiply(Literal(2.0d), Cast(LeastOf(la, lb), DoubleType)),
      Cast(sum, DoubleType))
    If(EqualTo(sum, Literal(0)), Literal(true), GreaterThanOrEqual(ub, t))
  }

  private def LeastOf(a: Expression, b: Expression): Expression = Least(Seq(a, b))

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  // Only predicates that are themselves top-level conjuncts may be
  // strengthened: for `ratio(a,b) >= t OR other` the bound does NOT
  // hold for rows satisfying the other branch, so matches nested under
  // OR/NOT/CASE must be left alone.
  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val prefilters = conjuncts.collect {
        case GreaterThanOrEqual(r: DifflibRatioExpr, t) => bound(r.left, r.right, t)
        case GreaterThan(r: DifflibRatioExpr, t)        => bound(r.left, r.right, t)
        case LessThanOrEqual(t, r: DifflibRatioExpr)    => bound(r.left, r.right, t)
        case LessThan(t, r: DifflibRatioExpr)           => bound(r.left, r.right, t)
      }.filterNot(p => conjuncts.exists(_.semanticEquals(p))) // idempotent
      if (prefilters.isEmpty) f
      else Filter(prefilters.foldLeft(cond)((acc, p) => And(p, acc)), child)
  }
}

/** Session extensions: one hook installs every graft planner addition
  * — the fuzzy-prefilter optimizer rule and the per-group top-k
  * physical strategy. Usage:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuzzyPrefilterRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
