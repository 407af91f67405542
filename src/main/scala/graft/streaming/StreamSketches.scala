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
