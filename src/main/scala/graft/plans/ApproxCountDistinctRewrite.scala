package graft.plans

import graft.functions.{ThetaEstimate, ThetaSketchAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into a
  * theta-sketch estimate.
  *
  * `COUNT(DISTINCT)` plans as a two-stage expand/shuffle whose width is
  * the number of distinct values — at 100 TB that's often the single
  * most expensive aggregate in a workload. The sketch is one
  * partial-aggregable pass with k·8-byte shuffle payload, exact below
  * k=4096 and ~1.6% error beyond. Off by default; enable per session:
  *
  * {{{ spark.conf.set("spark.graft.approxCountDistinct", "true") }}}
  *
  * Multi-argument COUNT(DISTINCT a, b) and DISTINCT with filters are
  * left untouched.
  */
case class ApproxCountDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.getOption("spark.graft.approxCountDistinct").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg: Aggregate =>
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
              Cast(
                ThetaEstimate(AggregateExpression(
                  ThetaSketchAgg(child), Complete, isDistinct = false)),
                LongType)
          }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
        }
        agg.copy(aggregateExpressions = rewritten)
    }
  }
}
