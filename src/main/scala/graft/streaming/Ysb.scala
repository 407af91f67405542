package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Yahoo Streaming Benchmark (reference benchmarks/src/ysb/: ad_events
  * stream + static campaigns map, query ysb.sql:1-7 — filter view events,
  * join ad→campaign, count per campaign per window). Same pure-column
  * deterministic generation style as Nexmark: 1000 ads mapping onto 100
  * campaigns (reference ysb/event.rs:42-84 proportions).
  */
object Ysb {
  val BaseMs: Long = Nexmark.BaseMs
  val NumAds = 1000
  val NumCampaigns = 100

  private def u(id: org.apache.spark.sql.Column, salt: String) =
    abs(xxhash64(id, lit(salt)))

  /** Pure-column ad-event projection over an `id` column — shared by the
    * batch replay and the live stream so both emit the bit-identical
    * event for a given id at any parallelism.
    */
  private def adEventsFromIds(ids: DataFrame, eventsPerSecond: Long,
      keep: Seq[String] = Nil): DataFrame = {
    val id = col("id")
    ids.select(Seq(
      (u(id, "ad") % NumAds).cast(IntegerType).as("ad_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (id % 3 + 1).cast(IntegerType)).as("event_type"),
      timestamp_millis(lit(BaseMs) + (id / eventsPerSecond).cast(LongType) * 1000L +
        ((id % eventsPerSecond) * 1000L / eventsPerSecond).cast(LongType))
        .as("event_time")) ++ keep.map(col): _*)
  }

  /** The ad-event projection over any frame with an `id` column (shared
    * by the batch replay, the rate stream, and the V2-source gate).
    * `keep` carries extra input columns through (e.g. the id itself for
    * sentinel rewriting).
    */
  def adEventsOverIds(ids: DataFrame, eventsPerSecond: Long = 1000,
      keep: Seq[String] = Nil): DataFrame =
    adEventsFromIds(ids, eventsPerSecond, keep)

  /** ad_events: ad_id, event_type (view/click/purchase, 1:1:1 like the
    * reference), event_time spread over 1 s epochs.
    */
  def adEvents(spark: SparkSession, nEvents: Long,
      eventsPerSecond: Long = 1000): DataFrame =
    adEventsFromIds(spark.range(0, nEvents).select(col("id")), eventsPerSecond)

  /** Streaming ad_events via the rate source: `rowsPerSecond` ids/sec over
    * `generators` source partitions (the reference CLI's generator count,
    * ysb/main.rs:41-50), each id mapped through the same projection as the
    * batch replay. Event time is the deterministic generator time, so
    * windows are reproducible.
    */
  def adEventStream(spark: SparkSession, rowsPerSecond: Int = 1000,
      eventsPerSecond: Long = 1000, generators: Int = 8): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", generators)
      .load()
    adEventsFromIds(rate.select(col("value").as("id")), eventsPerSecond)
  }

  /** ad_events through the native V2 generator source
    * (graft.sources.NexmarkV2): offset-tracked exactly-once with
    * per-trigger admission — `rowsPerTrigger` bounds intake
    * (maxOffsetsPerTrigger semantics) while `eventsPerSecond` makes ids
    * AVAILABLE at the offered wall-clock rate, so offered > admitted
    * accumulates as source backlog, not state growth.
    */
  def adEventStreamV2(spark: SparkSession, totalEvents: Long,
      rowsPerTrigger: Option[Long] = None,
      eventsPerSecond: Option[Long] = None,
      genEventsPerSecond: Long = 1000, generators: Int = 8): DataFrame =
    adEventsFromIds(
      graft.sources.NexmarkV2.ids(spark, totalEvents, rowsPerTrigger,
        eventsPerSecond, generators),
      genEventsPerSecond)

  /** Static campaigns dimension: ad_id → campaign_id (10 ads per campaign). */
  def campaigns(spark: SparkSession): DataFrame =
    spark.range(0, NumAds).select(
      col("id").cast(IntegerType).as("c_ad_id"),
      (col("id") % NumCampaigns).cast(IntegerType).as("campaign_id"))

  /** The YSB query (reference ysb.sql): works on batch and streaming
    * frames; campaigns broadcast (stream-static join).
    */
  def query(events: DataFrame, campaigns: DataFrame,
      windowSize: String = "10 seconds"): DataFrame =
    events.filter(col("event_type") === "view")
      .join(broadcast(campaigns), col("ad_id") === col("c_ad_id"))
      .groupBy(window(col("event_time"), windowSize).as("win"), col("campaign_id"))
      .agg(count(lit(1)).as("n_views"))
      .select(col("win.start").as("win_start"), col("campaign_id"), col("n_views"))
}
