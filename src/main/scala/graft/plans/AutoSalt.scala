package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Conf-gated OPTIMIZER rule that rewrites skewed grouped aggregates
  * into the two-stage salted form — [[graft.ops.Skew.saltedAgg]] moved
  * from "call this helper" to "the optimizer does it": with
  * `spark.graft.autosalt.enabled=true`, any eligible
  * `groupBy(k).agg(...)` is planned as
  *
  *   Aggregate(k)( merge-partials )            ← tiny, per (k, salt)
  *     Aggregate(k, hash(row) % n)( partials ) ← hot keys spread n ways
  *
  * Eligibility is conservative — rewrite only when provably
  * result-identical: non-empty grouping (a GLOBAL two-stage aggregate
  * would turn empty input's single row into zero rows), all grouping
  * expressions are plain attributes, and every aggregate is an
  * undistinct, unfiltered Sum/Min/Max/Count (algebraic partials that
  * merge exactly; decimal sums merge bit-exactly — the Skew.scala
  * argument). Count merges as Sum over partial counts; a merged
  * decimal Sum widens (p+10) and is cast back to the original type so
  * the rewritten plan's schema is unchanged. Anything else (avg,
  * first, distinct, filter clauses) leaves the Aggregate untouched.
  *
  * Registered post-hoc via `spark.experimental.extraOptimizations`
  * (the optimizer-rule analogue of TopKPerKey's extraStrategies
  * registration); the batch runs to fixpoint, so rewritten nodes carry
  * a [[TreeNodeTag]] and stage-1 nodes are additionally shaped to fail
  * eligibility (their grouping contains the non-attribute salt
  * expression) — both stages are stable under re-application.
  *
  * At 100 TB this is the difference between hand-auditing every
  * pipeline for Zipfian keys and flipping one conf for a job known to
  * aggregate hot-keyed data: map-side partial aggregation already
  * absorbs most skew, but post-join / post-explode hot keys that
  * arrive pre-partitioned by something else land on one reducer
  * without the salt (the Skew.scala scenario, measured there). */
object AutoSalt extends Rule[LogicalPlan] {

  val SaltCol = "__autosalt"
  private val Salted = TreeNodeTag[Boolean]("graft.autosalt.done")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.autosalt.enabled", "false") != "true")
      plan
    else {
      val n = conf.getConfString("spark.graft.autosalt.n", "16").toInt
      plan.transformUp {
        case agg: Aggregate if eligible(agg) => rewrite(agg, n)
      }
    }
  }

  private def supported(f: AggregateFunction): Boolean = f match {
    // float/double Sum is excluded: the extra merge stage re-associates
    // FP addition, so the salted plan could differ in the last ulp from
    // the plain plan — outside the "provably result-identical" contract.
    // Integer, long and decimal partials merge exactly.
    case s: Sum => s.child.dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => false
      case _ => true
    }
    case _: Min | _: Max | _: Count => true
    case _ => false
  }

  private def eligible(agg: Aggregate): Boolean = {
    val aes = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    agg.resolved &&
      agg.getTagValue(Salted).isEmpty &&
      agg.groupingExpressions.nonEmpty &&
      agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) &&
      aes.nonEmpty &&
      aes.forall(ae => !ae.isDistinct && ae.filter.isEmpty &&
        supported(ae.aggregateFunction)) &&
      // a node we built (or one structurally like it) is never re-salted:
      // the alias guard catches stage 1 (its outputs are named __p_*);
      // the structural guard catches stage 2 even if a later rule
      // rebuilds the node without copying the TreeNodeTag — a genuine
      // stage-2 merge aggregates ONLY __p_* partial attributes (bare
      // Count() never appears there: Count merges as Sum over partials),
      // so "every aggregate input is a __p_* attribute" identifies it.
      !agg.aggregateExpressions.exists(_.name.startsWith("__p_")) &&
      !aes.forall(ae => ae.aggregateFunction.children.nonEmpty &&
        ae.aggregateFunction.children.forall {
          case a: AttributeReference => a.name.startsWith("__p_")
          case _ => false
        })
  }

  private def rewrite(agg: Aggregate, n: Int): LogicalPlan = {
    val groupAttrs =
      agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    // distinct aggregate calls (by canonical form) → one partial each
    val aes = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    val distinctAes = aes.foldLeft(Vector.empty[AggregateExpression]) {
      (acc, ae) =>
        if (acc.exists(_.canonicalized == ae.canonicalized)) acc
        else acc :+ ae
    }
    val partialAlias: Map[Expression, Alias] =
      distinctAes.zipWithIndex.map { case (ae, i) =>
        (ae.canonicalized: Expression, Alias(ae, s"__p_$i")())
      }.toMap
    val saltExpr = Pmod(new Murmur3Hash(agg.child.output), Literal(n))
    val stage1 = Aggregate(
      (groupAttrs: Seq[Expression]) :+ saltExpr,
      groupAttrs ++ partialAlias.values.toSeq.sortBy(_.name),
      agg.child)
    stage1.setTagValue(Salted, true)
    val mergedOut = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          val pAttr = partialAlias(ae.canonicalized).toAttribute
          val mergedFn = ae.aggregateFunction match {
            case _: Sum => Sum(pAttr)
            case _: Count => Sum(pAttr)
            case _: Min => Min(pAttr)
            case _: Max => Max(pAttr)
            case other => throw new IllegalStateException(
              s"unsupported agg slipped eligibility: $other")
          }
          val merged = AggregateExpression(mergedFn, Complete,
            isDistinct = false)
          if (merged.dataType == ae.dataType) merged
          else Cast(merged, ae.dataType)
      }.asInstanceOf[NamedExpression]
    }
    val stage2 = Aggregate(groupAttrs, mergedOut, stage1)
    stage2.setTagValue(Salted, true)
    stage2
  }

  /** Idempotent post-hoc registration (TopKPerKeyStrategy pattern);
    * synchronized so the check-then-append stays atomic under the bench's
    * concurrent-lane escalation. */
  def ensureRegistered(spark: SparkSession): Unit = this.synchronized {
    if (!spark.experimental.extraOptimizations.contains(AutoSalt)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoSalt
    }
  }
}
