package graft.streaming

/** Bounded per-trigger admission — the graceful-overload contract for the
  * stateful streaming path.
  *
  * The r11 10-minute soak falsified the unbounded-ingest behavior at
  * overload: past the sustained rate, a tumbling-window query enters a
  * watermark-lag → state-balloon → slower-batch feedback loop (batch
  * means 3 s → 130 s, window state 0.7M → 26M rows) because each trigger
  * admits EVERYTHING the source accumulated while the previous batch ran.
  * The engineering fix is to bound admission per trigger at the measured
  * per-batch capacity, so transient overload accumulates as SOURCE
  * BACKLOG — bounded batches, flat state, linearly growing lag — which a
  * consumer can drain, scale past, or alert on; state growth it cannot.
  *
  * Mapping to production sources at 100 TB scale (the knobs are all
  * Spark-native; this object only centralizes the sizing rule):
  *   - file streams:  `maxFilesPerTrigger` = [[filesPerTrigger]] (or
  *     `maxBytesPerTrigger` = capacity_rows x avg_row_bytes);
  *   - Kafka:         `maxOffsetsPerTrigger` = [[rowsPerTrigger]];
  *   - rate sources / generators: produce at most [[rowsPerTrigger]] ids
  *     per trigger.
  * The capacity input is the measured sustained events/s for the query
  * shape on the target hardware (SoakRun's capacity search), quoted with
  * its host factor; sizing at ~90% of measured keeps batch means strictly
  * under the trigger period at the admitted rate.
  */
object Admission {

  /** Rows a single trigger may admit so the batch fits its trigger
    * period: capacity_eps x trigger_period.
    */
  def rowsPerTrigger(capacityEps: Long, triggerPeriodMs: Long): Long =
    math.max(1L, capacityEps * triggerPeriodMs / 1000L)

  /** File-source form of the same bound: admit whole files of
    * `rowsPerFile` rows each; at least one file per trigger (a single
    * file larger than the budget still must be admitted — size landing
    * files at or below the per-trigger budget to keep the bound tight).
    */
  def filesPerTrigger(capacityEps: Long, triggerPeriodMs: Long,
      rowsPerFile: Long): Int =
    math.max(1L,
      rowsPerTrigger(capacityEps, triggerPeriodMs) / math.max(1L, rowsPerFile))
      .toInt
}
