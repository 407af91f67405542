package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT cosine_similarity
  * (a, b) ...")` works in any session created with
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * For an already-running session, `GraftExtensions.register(spark)`
  * installs the same functions as temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}

object GraftExtensions {
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> ((es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    "simhash60" -> ((es: Seq[Expression]) => SimHash60(es(0))),
    "minhash_sig" -> ((es: Seq[Expression]) => MinHashShingleSig(es(0))),
    // space_saving_topk(key, k, capacity) — k/capacity must be int literals.
    "space_saving_topk" -> ((es: Seq[Expression]) => {
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"space_saving_topk $what must be an integer literal, got $other")
      }
      SpaceSavingTopK(es(0), intLit(es(1), "k"), intLit(es(2), "capacity"))
        .toAggregateExpression()
    }))

  /** Register the functions on a live session (temp-function path). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.shims.registerFunction(spark, name, b)
    }
}
