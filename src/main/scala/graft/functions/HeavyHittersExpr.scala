package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** SpaceSaving (Metwally et al.) heavy-hitters state: a bounded counter
  * table over long keys. The 100 TB shape for per-group top-k by
  * frequency: fixed-size mergeable state per group — the map side streams
  * every row into a capacity-bounded sketch, partials merge associatively
  * on the reduce side, and only (capacity × groups) counters ever travel
  * the wire, vs a full (group, key) count table for the exact two-phase
  * form (q16's topology).
  *
  * Guarantees: with capacity ≥ distinct keys per group the counts are
  * EXACT (no eviction ever happens — the sizing rule the p19 oracle uses).
  * Past capacity a new key inherits the evicted minimum's count as its
  * overestimate (`err`), the classic SpaceSaving bound: true ≤ count ≤
  * true + err. Cross-sketch merge applies the mergeable-summaries rule
  * (keys absent from a saturated side inherit that side's minimum as
  * count+err) and trims back to capacity — frequent keys survive (they
  * are never the minimum), long-tail counts become approximate, and the
  * bound holds across any merge tree.
  *
  * Eviction/trim order is a total order (smallest count, ties to the
  * LARGEST key), so results are deterministic for a fixed partitioning.
  */
final class SpaceSavingSketch(val capacity: Int) {
  import scala.collection.mutable
  val counters: mutable.HashMap[Long, (Long, Long)] = mutable.HashMap.empty
  /** Total keys streamed in (exact, survives serialization/merge). */
  var nSeen: Long = 0L
  /** True once any key has actually been evicted (by add or merge-trim).
    * Saturation must be tracked explicitly, not inferred from
    * `size >= capacity`: a sketch that saw exactly `capacity` distinct
    * keys with NO eviction is still exact, and giving it a nonzero merge
    * floor would inject error where absence truly means zero — breaking
    * the documented "capacity >= distinct keys => EXACT" guarantee at the
    * distinct == capacity boundary.
    */
  var evicted: Boolean = false

  private def minEntry: (Long, (Long, Long)) =
    counters.minBy { case (v, (c, _)) => (c, -v) }

  def add(v: Long): Unit = {
    nSeen += 1
    counters.get(v) match {
      case Some((c, e)) => counters(v) = (c + 1, e)
      case None if counters.size < capacity => counters(v) = (1L, 0L)
      case None =>
        val (mv, (mc, _)) = minEntry
        counters.remove(mv)
        counters(v) = (mc + 1, mc)
        evicted = true
    }
  }

  /** Mergeable-summaries rule (Agarwal et al., TODS'13): a saturated
    * sketch may have already evicted a key, undercounting it by up to its
    * minimum counter. So a key absent from one side inherits that side's
    * minimum count as both count and error; an unsaturated side has floor
    * 0 (absence there really means zero), keeping the exact regime exact.
    * Preserves true <= count <= true + err across any merge tree.
    */
  def mergeWith(o: SpaceSavingSketch): Unit = {
    val myFloor = if (evicted) counters.values.map(_._1).min else 0L
    val oFloor = if (o.evicted) o.counters.values.map(_._1).min else 0L
    nSeen += o.nSeen
    evicted ||= o.evicted
    if (oFloor > 0) counters.keys.toArray.foreach { v =>
      if (!o.counters.contains(v)) {
        val (c0, e0) = counters(v)
        counters(v) = (c0 + oFloor, e0 + oFloor)
      }
    }
    o.counters.foreach { case (v, (c, e)) =>
      counters.get(v) match {
        case Some((c0, e0)) => counters(v) = (c0 + c, e0 + e)
        case None => counters(v) = (c + myFloor, e + myFloor)
      }
    }
    while (counters.size > capacity) { counters.remove(minEntry._1); evicted = true }
  }

  /** Top-k entries by (count desc, key asc) as (key, count, err). */
  def topK(k: Int): Array[(Long, Long, Long)] =
    counters.toArray.map { case (v, (c, e)) => (v, c, e) }
      .sortBy { case (v, c, _) => (-c, v) }.take(k)
}

object SpaceSavingSketch {
  /** Byte codec shared by the aggregate buffer and streaming state
    * (capacity travels with the bytes; sorted dump → byte-stable
    * regardless of hash-map iteration order).
    */
  def serialize(sk: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(sk.capacity)
    out.writeBoolean(sk.evicted)
    out.writeLong(sk.nSeen)
    out.writeInt(sk.counters.size)
    sk.counters.toArray.sortBy(_._1).foreach { case (v, (c, e)) =>
      out.writeLong(v); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new SpaceSavingSketch(in.readInt())
    sk.evicted = in.readBoolean()
    sk.nSeen = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      sk.counters(in.readLong()) = (in.readLong(), in.readLong())
      i += 1
    }
    sk
  }
}

/** `space_saving_topk(key, k, capacity)` — a TypedImperativeAggregate over
  * the SpaceSaving sketch. Returns array<struct<value,count,err>> of the
  * k most frequent keys (count desc, key asc).
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch]
  with UnaryLike[Expression] {

  require(k >= 1 && capacity >= k, s"need 1 <= k <= capacity, got k=$k capacity=$capacity")

  override def prettyName: String = "space_saving_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"space_saving_topk needs an integral key, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(capacity)

  override def update(b: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => other.toString.toLong
    })
    b
  }

  override def merge(b: SpaceSavingSketch, o: SpaceSavingSketch): SpaceSavingSketch = {
    b.mergeWith(o); b
  }

  override def eval(b: SpaceSavingSketch): Any =
    new GenericArrayData(b.topK(k).map { case (v, c, e) =>
      InternalRow(v, c, e)
    }.toSeq)

  override def serialize(b: SpaceSavingSketch): Array[Byte] =
    SpaceSavingSketch.serialize(b)

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch =
    SpaceSavingSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column API: per-group top-k frequent keys via a SpaceSaving sketch. */
  def space_saving_topk(key: Column, k: Int, capacity: Int): Column =
    shims.column(
      SpaceSavingTopK(shims.expression(key), k, capacity).toAggregateExpression())
}
