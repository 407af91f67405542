package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batch curation pipeline (catalog p20) as a STREAMING ingest: the
  * shape a 100 TB corpus actually arrives in — a continuous crawl feed —
  * where dedup state cannot grow with the stream. Stages:
  *
  *   1. quality gate — narrow, codegen'd (same rules as p20's batch form);
  *   2. content digest — md5, the exact-dedup key (p01);
  *   3. `dropDuplicatesWithinWatermark(digest)` — the bounded-state form
  *      of streaming dedup: plain `dropDuplicates` on a stream keeps EVERY
  *      key forever (state grows with the corpus — a 100 TB non-starter);
  *      the within-watermark variant evicts keys once the watermark
  *      passes, so state is bounded by the dedup horizon × arrival rate.
  *      The contract weakens accordingly — only near-in-time duplicates
  *      (crawl re-fetches, mirror bursts — the dominant dup mode in a
  *      live feed) are guaranteed dropped; a re-crawl months later needs
  *      the batch dedup pass anyway;
  *   4. per-(window, lang) rollup — the monitoring surface.
  */
object StreamPipeline {

  /** Quality gate matching p20's batch rules: length floor + all-caps and
    * digit-ratio guards (documents here are lowercase word soup, so the
    * gate's selectivity comes from the length floor).
    */
  def qualityGate(docs: DataFrame): DataFrame =
    docs.withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_tokens") >= 8)

  /** Full ingest pipeline over a streaming frame of
    * (doc_id, text, lang, event_time). Returns per-(window, lang) counts
    * of accepted, deduplicated documents.
    */
  def curationStream(docs: DataFrame, horizon: String = "10 seconds",
      window_ : String = "10 seconds"): DataFrame =
    qualityGate(docs)
      .withColumn("digest", md5(col("text")))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("digest")
      .groupBy(window(col("event_time"), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("win_start"), col("lang"), col("n_docs"))

  /** The dedup stage alone (what the bounded-state test exercises). */
  def dedupStream(docs: DataFrame, horizon: String = "10 seconds"): DataFrame =
    docs.withColumn("digest", md5(col("text")))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming form of p37's token-window chunking: stateless per-row
    * explode, so the micro-batch plan IS the batch plan — chunks stream
    * out in append mode with no watermark or state. The stream==batch
    * test pins that the two forms agree chunk-for-chunk.
    */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.operators.Pipeline.chunkWindowsRaw(docs)

  /** Streaming twin of p48's EXACT rolling 7-day active users, as the
    * officially-supported two-stateful-op chain (dedup → windowed agg)
    * under ONE watermark:
    *
    *   1. stateless ×7 explode — each event contributes to the 7
    *      window-end days `day(ts) .. day(ts)+6`, projected as a
    *      timestamp `wday_ts` BEFORE any state (the batch form dedups to
    *      (user, day) first and explodes the smaller set; the stream
    *      trades that ×7 pre-dedup volume for a single dedup state,
    *      because chaining a second watermarked dedup is where
    *      multi-stateful support gets fragile);
    *   2. `dropDuplicatesWithinWatermark(user_id, wday_ts)` — one state
    *      row per (user, window-end day) inside the horizon. Two
    *      contributions to the same (user, wday) carry wday_ts values at
    *      most 6 days apart, so any horizon ≥ 7 days makes the dedup
    *      EXACT, while state stays bounded by horizon × active users —
    *      the same bounded-state contract as curationStream;
    *   3. per-day window count in append mode — a day's WAU emits once,
    *      when the watermark passes the day.
    *
    * Ghost-tail semantics: like the batch entry pre-semi-join, window-end
    * days with no real activity day still appear (they inherit counts
    * from preceding active days); p48 drops them with a semi join against
    * real days, which a consumer of this stream applies the same way.
    * The StreamingSpec twin test proves BOTH: raw equality with the
    * unfiltered batch recompute, and p48 equality after the filter.
    */
  /** Streaming twin of p94's incremental ingestion dedup — the live-feed
    * form: new documents arrive as a stream, the already-ingested corpus
    * is a STATIC digest index. Stages mirror the batch entry exactly:
    *
    *   1. vocabulary fingerprint (md5 of the sorted distinct token set,
    *      the same canonical form — codegen `sort_array`, no HOF);
    *   2. within-stream collapse via `dropDuplicatesWithinWatermark(fp)`
    *      — first arrival survives, which equals the batch "min doc_id
    *      per digest" rule whenever arrival follows doc_id order; state
    *      is bounded by the dedup horizon (curationStream's contract);
    *   3. stream-static LEFT ANTI join against the index — natively
    *      supported because the static side is a plain lookup relation.
    *      At 100 TB the index is a bucketed digest table and the anti
    *      join prunes with a bloom pre-filter (p56's pattern) so batch
    *      arrivals never rescan index text.
    *
    * Emits the accepted documents in append mode (no aggregate, so rows
    * flow immediately; the watermark only bounds dedup state).
    *
    * SURVIVOR-SELECTION CONTRACT (caller-facing): within a duplicate
    * group this keeps the FIRST ARRIVAL, which equals the batch twin's
    * "min doc_id per digest" rule ONLY when arrival order follows doc_id
    * order within the watermark horizon. Out-of-order arrival inside the
    * horizon silently picks a different (still single, still
    * deterministic-per-replay) survivor — the accepted SET of fingerprints
    * is identical either way; only WHICH doc represents a group differs.
    * Callers needing batch-identical survivors must either feed the
    * stream in doc_id order (the mode StreamingSpec pins with its
    * in-order-replay equality test) or reconcile downstream on the
    * emitted doc_id, which this passes through untouched for exactly
    * that purpose.
    */
  def ingestStream(docs: DataFrame, indexFps: DataFrame,
      horizon: String = "10 seconds"): DataFrame =
    docs.withColumn("fp", md5(expr(
        "array_join(sort_array(array_distinct(split(text, ' '))), ' ')")))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .join(indexFps, Seq("fp"), "left_anti")

  def wauStream(events: DataFrame, horizon: String = "8 days"): DataFrame = {
    val dayUs = 86400000000L
    events
      .select(col("user_id"),
        explode(expr(
          s"transform(sequence(0, 6), k -> timestamp_micros((unix_micros(ts) div $dayUs + k) * $dayUs))"))
          .as("wday_ts"))
      .withWatermark("wday_ts", horizon)
      .dropDuplicatesWithinWatermark("user_id", "wday_ts")
      .groupBy(window(col("wday_ts"), "1 day"))
      .agg(count(lit(1)).as("wau"))
      .select(col("window.start").as("wday_start"), col("wau"))
  }
}
