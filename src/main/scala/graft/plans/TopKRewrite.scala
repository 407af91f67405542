package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber,
  WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (build-guide tier (c), the `Rule[LogicalPlan]` half):
  * rewrite the ubiquitous window-rank top-k idiom
  *
  *   df.withColumn("rk", row_number().over(Window.partitionBy(keys).orderBy(o)))
  *     .filter($"rk" <= k).drop("rk")
  *
  * into the bounded-heap [[TopKPerKey]] operator whenever the rank column
  * itself is discarded. Spark 4's own InferWindowGroupLimit already
  * prunes rows past rank k BEFORE the window sort (WindowGroupLimitExec),
  * but it must still SORT every partition to assign ranks; when the caller
  * provably never reads the rank, the sort is pure waste — TopKPerKey
  * keeps a k-row heap per key instead (O(n log k), no sort buffer).
  *
  * The match is deliberately narrow (all conditions required):
  *   - exactly ONE window expression, a plain ROW_NUMBER (rank/dense_rank
  *     admit >k ties, which a k-heap cannot represent);
  *   - the filter is `rk <= lit` / `rk < lit` / `rk = 1` on that column
  *     alone — no other conjuncts touch it;
  *   - the Project above the filter drops the rank column (otherwise the
  *     rank is observable and the window must run);
  *   - the partition spec is non-empty (global top-k already lowers to
  *     TakeOrderedAndProject, which is the right operator there).
  *
  * Registered via GraftExtensions (injectOptimizerRule) for configured
  * sessions, or `TopK.installRewrite(spark)` on a live one.
  *
  * FAILURE-MODE TRADE the rewrite makes: the window-rank formulation sorts
  * and therefore SPILLS on any key cardinality; TopKPerKey holds bounded
  * heap state and fails fast past `maxKeysPerPartition` distinct keys.
  * A previously-completing ultra-high-cardinality query can therefore
  * start throwing once the rewrite is active. Both knobs are runtime
  * SQLConfs: disable with `spark.graft.topk.rewrite.enabled=false`, or
  * raise `spark.graft.topk.maxKeysPerPartition` (threaded through to the
  * rewritten operator).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topk.rewrite.enabled"
  val MaxKeysKey = "spark.graft.topk.maxKeysPerPartition"

  /** rk <= 5 / rk < 6 / rk = 1 → Some(k), on the given attribute only —
    * plus the commuted forms (5 >= rk / 6 > rk / 1 = rk) some frontends
    * normalize to.
    */
  private def rankBound(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(r: AttributeReference, IntegerLiteral(k))
          if r.semanticEquals(rank) => Some(k)
      case GreaterThanOrEqual(IntegerLiteral(k), r: AttributeReference)
          if r.semanticEquals(rank) => Some(k)
      case LessThan(r: AttributeReference, IntegerLiteral(k))
          if r.semanticEquals(rank) => Some(k - 1)
      case GreaterThan(IntegerLiteral(k), r: AttributeReference)
          if r.semanticEquals(rank) => Some(k - 1)
      case EqualTo(r: AttributeReference, IntegerLiteral(1))
          if r.semanticEquals(rank) => Some(1)
      case EqualTo(IntegerLiteral(1), r: AttributeReference)
          if r.semanticEquals(rank) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else applyEnabled(plan,
      conf.getConfString(MaxKeysKey, TopK.DefaultMaxKeysPerPartition.toString).toInt)

  private def applyEnabled(plan: LogicalPlan, maxKeys: Int): LogicalPlan =
    plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(a @ Alias(WindowExpression(RowNumber(), spec), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          // rank column must not escape through the projection
          !projList.exists(_.references.contains(a.toAttribute)) &&
          // projection must be answerable from the window's child alone
          projList.forall(_.references.subsetOf(child.outputSet)) =>
      rankBound(cond, a.toAttribute) match {
        case Some(k) if k > 0 =>
          // InferWindowGroupLimit may already have slid a WindowGroupLimit
          // under the Window (it prunes rows past rank k but still sorts);
          // TopKPerKey subsumes it, so unwrap rather than stack the two.
          val source = child match {
            case WindowGroupLimit(ps, os, RowNumber(), limit, grandchild)
                if ps == partitionSpec && os == orderSpec && limit >= k =>
              grandchild
            case other => other
          }
          Project(projList,
            TopKPerKey(partitionSpec, orderSpec, k, source, maxKeys))
        case _ => p
      }
    }
}
