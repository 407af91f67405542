package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (build-guide tier (c): LogicalPlan + Strategy +
  * SparkPlan): per-key top-k with bounded heaps.
  *
  * The composed alternative — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — must SORT every partition in full before ranking.
  * This operator keeps a k-element heap per key instead: one shuffle on the
  * keys (Catalyst inserts it via requiredChildDistribution), then a single
  * O(n log k) streaming pass, no sort buffer, memory bounded by
  * k × distinct-keys-per-partition. At 100 TB this is the difference
  * between spilling a full sort and a fixed-size state per key — the same
  * reasoning as the reference's per-seller "last 10 auctions" truncation
  * (reference flock/src/datasource/nexmark/queries/q6.rs:135-142).
  *
  * Semantics: emits exactly the rows the rank-filter would keep, unordered
  * (callers sort the — much smaller — output if they need order). The
  * ordering should be total per key (include a tiebreak) for deterministic
  * results.
  *
  * Memory contract: state is k × distinct-keys-per-partition, which is the
  * operator's reason to exist — but it does NOT spill. `maxKeysPerPartition`
  * (default 2^20) guards the contract: a partition that exceeds it fails
  * fast with a clear message (raise the bound, repartition wider, or use
  * the window-rank formulation, which sorts and therefore spills) instead
  * of OOMing the executor mid-stage.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan,
    maxKeysPerPartition: Int = TopK.DefaultMaxKeysPerPartition) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxKeysPerPartition > 0, "maxKeysPerPartition must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan,
    maxKeysPerPartition: Int = TopK.DefaultMaxKeysPerPartition)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // Max-heap by `ord`: peek() is the WORST retained row, evicted when a
      // better row arrives.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val maxKeys = maxKeysPerPartition
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) {
            throw new org.apache.spark.SparkException(
              s"TopKPerKey: partition exceeded maxKeysPerPartition=$maxKeys " +
                s"distinct keys (state is k × keys and does not spill). " +
                s"Raise the bound via TopK.perKey(..., maxKeysPerPartition=), " +
                s"repartition into more partitions, or use the window-rank " +
                s"formulation (sorts, spills).")
          }
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy for graft's custom logical operators. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, maxKeys) =>
      TopKPerKeyExec(keys, order, k, planLater(child), maxKeys) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point: `TopK.perKey(df, keys, order, k)`. Installs
  * the strategy on the session if missing (new sessions get it from
  * GraftExtensions' injectPlannerStrategy instead).
  */
object TopK {
  /** Default per-partition distinct-key guard: at k ≈ 3 and ~100-byte rows
    * this caps heap state near 300 MB/partition — under a typical executor
    * task budget, far past any sane use of the operator.
    */
  val DefaultMaxKeysPerPartition: Int = 1 << 20

  import org.apache.spark.sql.graft.shims

  /** Install the window-rank → TopKPerKey rewrite ([[TopKRewrite]]) on a
    * live session (new sessions get it from GraftExtensions'
    * injectOptimizerRule). Also installs the planner strategy the
    * rewritten node needs. Idempotent.
    *
    * NOTE the rewrite trades a spill-capable window sort for fail-fast
    * bounded heap state (see [[TopKRewrite]] scaladoc); it honors the
    * runtime confs `spark.graft.topk.rewrite.enabled` and
    * `spark.graft.topk.maxKeysPerPartition` per query.
    */
  def installRewrite(spark: SparkSession): Unit = {
    shims.addStrategy(spark, GraftStrategies)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }

  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      maxKeysPerPartition: Int = DefaultMaxKeysPerPartition): DataFrame = {
    val spark = df.sparkSession
    shims.addStrategy(spark, GraftStrategies)
    val sortOrders = order.map(c => shims.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    shims.ofRows(spark,
      TopKPerKey(keys.map(shims.expression), sortOrders, k,
        shims.logicalPlan(df), maxKeysPerPartition))
  }
}
