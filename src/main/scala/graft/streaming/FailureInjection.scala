package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.util.LongAccumulator

/** Mid-batch task-failure injection (r11 verdict #3).
  *
  * Every restart proof so far stops queries at a BATCH boundary — a clean
  * stop. Exactly-once's hard case is a task failing AFTER partial work
  * and being retried: the reference's analogue is a re-delivered window
  * fragment mid-reassembly (flock-function/src/aws/actor.rs:380-421
  * backfill + PROCESSED_WINDOWS dedup); Spark's is a task that dies after
  * the state store absorbed some puts, whose retry must roll those back
  * (RocksDB store.abort() discards the uncommitted version) and reproduce
  * the batch bit-identically.
  *
  * [[failFirstAttempt]] plants that failure deterministically: a
  * pass-through map stage pipelined into the SAME task as the upstream
  * stateful operator (narrow dependency — no exchange between
  * transformWithState and the map), which on partition 0, attempt 0,
  * consumes `afterRows` rows and then throws. The rows already pulled
  * have already flowed THROUGH the stateful operator — its state store
  * holds partial uncommitted writes when the task dies. Requires a
  * master with task retries (e.g. `local[4,2]`).
  *
  * The accumulator counts RETRY attempts (attempt > 0) reaching partition
  * 0 — it cannot count at throw time, because Spark discards accumulator
  * updates from failed task attempts (countFailedValues=false). A
  * positive count therefore proves both halves: the injected failure
  * fired AND the task was re-attempted.
  */
object FailureInjection {

  final class InjectedFailure(msg: String) extends RuntimeException(msg)

  /** Pass-through that throws on (partition 0, attempt 0) after
    * `afterRows` rows and counts the surviving retry in `retries`. Output
    * on the surviving attempt is the identity of its input.
    */
  def failFirstAttempt(df: DataFrame, retries: LongAccumulator,
      afterRows: Int = 3): DataFrame = {
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc == null || tc.partitionId() != 0) it
      else if (tc.attemptNumber() > 0) { retries.add(1L); it }
      else {
        var n = 0
        it.map { r =>
          n += 1
          if (n > afterRows) {
            throw new InjectedFailure(
              s"graft injected failure after $afterRows rows " +
                s"(stage ${tc.stageId()}, attempt 0)")
          }
          r
        }
      }
    }
  }

  /** Soak-grade periodic injection: like [[failFirstAttempt]] but firing
    * only in stages whose id divides `everyNStages` — on a long-running
    * query this plants a first-attempt task death roughly every
    * N-batches' worth of stages, so a 10-minute soak carries a steady
    * drip of mid-batch retries instead of one per replay. A retried task
    * keeps its stageId, so the predicate still matches and the surviving
    * attempt is counted.
    */
  def failEveryNthStage(df: DataFrame, retries: LongAccumulator,
      everyNStages: Int, afterRows: Int = 3): DataFrame = {
    require(everyNStages >= 1, "everyNStages must be >= 1")
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc == null || tc.partitionId() != 0 ||
          tc.stageId() % everyNStages != 0) it
      else if (tc.attemptNumber() > 0) { retries.add(1L); it }
      else {
        var n = 0
        it.map { r =>
          n += 1
          if (n > afterRows) {
            throw new InjectedFailure(
              s"graft injected soak failure after $afterRows rows " +
                s"(stage ${tc.stageId()}, attempt 0)")
          }
          r
        }
      }
    }
  }
}
