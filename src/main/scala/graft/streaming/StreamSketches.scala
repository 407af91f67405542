package graft.streaming

import graft.functions.SpaceSavingSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Sketches as STREAMING state: the SpaceSaving heavy-hitters sketch from
  * the batch aggregate (functions/HeavyHittersExpr.scala, catalog p19)
  * carried as `mapGroupsWithState` per-group state. Each micro-batch folds
  * its rows into the group's sketch and emits the current top-k — the
  * streaming form of "which keys are trending per group", with state
  * bounded at `capacity` counters per group regardless of stream length
  * (vs. unbounded per-key counts for an exact streaming groupBy).
  *
  * Semantics match the batch aggregate exactly when every group stays in
  * one task (single sketch, no merge), which streaming guarantees: state
  * for a group lives on one partition. StreamingSpec asserts stream ==
  * batch in the exact regime.
  */
object StreamSketches {
  /** One emitted row: the rank-th most frequent key in `group` as of
    * `nSeen` processed rows for that group.
    */
  final case class TopKRow(group: String, nSeen: Long, rank: Int,
      value: Long, count: Long)

  /** One emitted row per group per trigger: the exponentially decayed
    * event count as of the group's latest event.
    */
  final case class DecayRow(group: String, nSeen: Long, lastTs: Long,
      decayed: Double)

  /** Streaming twin of the batch decayed-counts operator (catalog p21),
    * in incremental form: state per group = (lastTs, decayed, n); each
    * event folds as `decayed = decayed · exp(-λ·Δt) + 1` with Δt clamped
    * at 0 (a late event neither amplifies nor rewinds the clock — with a
    * watermark upstream this is the drop-or-count-once policy). Rows fold
    * in event-time order within each batch; equal timestamps commute
    * (exp(0) = 1), so the fold is deterministic. O(1) state per group.
    */
  def decayedCountStream(events: DataFrame,
      halfLifeMicros: Long): Dataset[DecayRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val lambda = math.log(2.0) / halfLifeMicros
    events.selectExpr("CAST(group AS STRING) AS group", "CAST(ts AS BIGINT) AS ts")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double, Long), DecayRow](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          var (lastTs, decayed, n) = state.getOption.getOrElse((Long.MinValue, 0.0, 0L))
          rows.toSeq.sortBy(_._2).foreach { case (_, t) =>
            val dt = if (lastTs == Long.MinValue) 0L else math.max(0L, t - lastTs)
            decayed = decayed * math.exp(-lambda * dt) + 1.0
            lastTs = math.max(lastTs, t)
            n += 1
          }
          state.update((lastTs, decayed, n))
          DecayRow(group, n, lastTs, decayed)
      }
  }

  /** Per-group streaming heavy hitters over (group, key) rows. Update
    * output mode; each trigger re-emits the group's refreshed top-k.
    */
  def heavyHittersStream(events: DataFrame, k: Int,
      capacity: Int): Dataset[TopKRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("CAST(group AS STRING) AS group", "CAST(key AS BIGINT) AS key")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], Seq[TopKRow]](GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val sk = state.getOption.map(SpaceSavingSketch.deserialize)
            .getOrElse(new SpaceSavingSketch(capacity))
          rows.foreach(r => sk.add(r._2))
          state.update(SpaceSavingSketch.serialize(sk))
          sk.topK(k).zipWithIndex.toSeq.map { case ((v, c, _), i) =>
            TopKRow(group, sk.nSeen, i + 1, v, c)
          }
      }
      .flatMap(identity)
  }
}
