package graft.operators

import graft.Q
import graft.streaming.{Nexmark, StreamQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NEXMark q0–q13 as batch replays of the deterministic generator
  * (SURVEY §2.D query-to-capability matrix; reference SQL at
  * benchmarks/src/nexmark/query/q*.sql) — the same transforms the
  * streaming module runs on live frames (graft.streaming.StreamQueries),
  * driven here over a fixed 100k-event replay exactly like the reference's
  * local query tests (flock/src/datasource/nexmark/queries/q*.rs).
  *
  * No DuckDB oracle (the generator is Spark-side; DuckDB cannot re-derive
  * the data), so the driver records rows-only checks; cross-engine value
  * checking for these operator *shapes* is covered by the oracle-checked
  * q/w/p/m catalog entries, and stream==batch equivalence is asserted in
  * StreamingSpec.
  */
object NexmarkBatch {
  private val N = 100000L

  private def bids(s: SparkSession) = Nexmark.bids(s, N)
  private def auctions(s: SparkSession) = Nexmark.auctions(s, N)
  private def persons(s: SparkSession) = Nexmark.persons(s, N)

  private def entry(name: String)(f: SparkSession => DataFrame): Q =
    Q(name, (s, _) => f(s), None)

  val all: Seq[Q] = Seq(
    entry("nx_q0_passthrough")(s => StreamQueries.q0(bids(s))),
    entry("nx_q1_currency")(s => StreamQueries.q1(bids(s))),
    entry("nx_q2_selection")(s => StreamQueries.q2(bids(s))),
    entry("nx_q3_local_item")(s => StreamQueries.q3(auctions(s), persons(s))),
    entry("nx_q4_avg_winning_bid")(s => StreamQueries.q4(bids(s), auctions(s))),
    entry("nx_q5_hot_items")(s => StreamQueries.q5(bids(s))),
    entry("nx_q6_avg_seller_price")(s => StreamQueries.q6(bids(s), auctions(s))),
    entry("nx_q7_highest_bid")(s => StreamQueries.q7(bids(s))),
    entry("nx_q8_monitor_new_users")(s => StreamQueries.q8(persons(s), auctions(s))),
    entry("nx_q9_winning_bids")(s => StreamQueries.q9(bids(s), auctions(s))),
    entry("nx_q11_bid_sessions")(s => StreamQueries.q11(bids(s))),
    entry("nx_q12_ptime_windows")(s =>
      StreamQueries.q12(bids(s)).toDF()
        .groupBy(col("bidder")).agg(sum(col("nBids")).as("n_bids"))
        .orderBy(col("bidder"))),
    entry("nx_q13_side_input")(s =>
      StreamQueries.q13(bids(s), Nexmark.sideInput(s))),
    entry("nx_ysb_campaigns")(s =>
      graft.streaming.Ysb.query(
        graft.streaming.Ysb.adEvents(s, N), graft.streaming.Ysb.campaigns(s))
        .orderBy(col("win_start"), col("campaign_id"))))
}
