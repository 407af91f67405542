package graft.operators

import graft.{Catalog, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Event-time window operators — the Flock streaming-window semantics
  * (SURVEY §2.C: tumbling / hopping / session / element-wise) expressed
  * with Spark's `window()` / `session_window()`. The same expressions run
  * unchanged on a streaming DataFrame (see graft.streaming); here they run
  * in batch over the `events` table so the driver's DuckDB oracle can
  * hash-check them.
  *
  * ns-precision note: `events.ts` is TIMESTAMP_NS parquet; Spark truncates
  * to µs on read, so every oracle works in epoch_us space
  * (DuckDB `epoch_us(ts)` truncates ns → µs identically).
  */
object EventWindows {
  import Catalog.dec

  private def T(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** w01 — tumbling window aggregate (Flock `Window::Tumbling`, reference
    * flock-function/src/aws/window/tumbling.rs:31-188; NEXMark q7/q8 use
    * 10 s tumbling per benchmarks/src/nexmark/main.rs:117-120).
    */
  private val w01 = Q(
    "w01_tumbling_agg",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .groupBy(window($"ts", "10 minutes").as("win"), $"event_type")
        .agg(count(lit(1)).as("n"), dec(sum(dec($"value", 12, 2)), 38, 2).as("sum_v"))
        .select(unix_micros($"win.start").as("win_start_us"), $"event_type", $"n", $"sum_v")
        .orderBy($"win_start_us", $"event_type")
    },
    Some("""
      SELECT (epoch_us(ts) // 600000000) * 600000000 AS win_start_us, event_type,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_v
      FROM events GROUP BY win_start_us, event_type
      ORDER BY win_start_us, event_type"""))

  /** w02 — hopping (sliding) window aggregate (Flock `Window::Hopping`,
    * reference window/hopping.rs:31-124; NEXMark q5 = Hopping(10,5)).
    * Size 10 min, hop 5 min → every event lands in exactly 2 windows.
    */
  private val w02 = Q(
    "w02_hopping_agg",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("win"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"win.start").as("win_start_us"), $"event_type", $"n")
        .orderBy($"win_start_us", $"event_type")
    },
    Some("""
      SELECT ((epoch_us(ts) // 300000000) - k) * 300000000 AS win_start_us,
        event_type, COUNT(*) AS n
      FROM events CROSS JOIN (VALUES (0), (1)) ks(k)
      GROUP BY win_start_us, event_type
      ORDER BY win_start_us, event_type"""))

  /** w03 — session window per key (Flock `Window::Session(timeout)`,
    * reference window/session.rs:64-321, NEXMark q11 count/min/max per
    * bidder per session). Session semantics: an event at exactly
    * prev_ts + gap starts a NEW session, window end = last + gap — the
    * oracle's island assignment uses `>= gap`. The Spark side computes
    * the islands explicitly rather than through the built-in
    * `session_window`, whose BATCH path merges touching sessions while
    * its streaming path splits them (the boundary inconsistency
    * StreamQueries.q11Batch documents; surfaced by the sf1 gate).
    */
  private val w03 = Q(
    "w03_session_agg",
    (s, d) => {
      import s.implicits._
      val gapUs = 6L * 3600 * 1000000
      val w = Window.partitionBy($"user_id").orderBy($"us")
      T(s, d, "events")
        .select($"user_id", $"value", unix_micros($"ts").as("us"))
        .withColumn("newS",
          when(lag($"us", 1).over(w).isNull ||
            $"us" - lag($"us", 1).over(w) >= gapUs, 1).otherwise(0))
        .withColumn("sid", sum($"newS").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"us").as("session_start_us"),
          (max($"us") + gapUs).as("session_end_us"),
          count(lit(1)).as("n"), min($"value").as("min_v"),
          max($"value").as("max_v"))
        .select($"user_id", $"session_start_us", $"session_end_us",
          $"n", $"min_v", $"max_v")
        .orderBy($"user_id", $"session_start_us")
    },
    Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      m AS (SELECT user_id, us, value,
              CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w >= 21600000000 THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      g AS (SELECT user_id, us, value,
              SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sid
            FROM m)
      SELECT user_id, MIN(us) AS session_start_us,
        MAX(us) + 21600000000 AS session_end_us,
        COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start_us"""))

  /** w04 — element-wise (Flock's default window, reference
    * window/elementwise.rs:30-186; NEXMark q0 `SELECT * FROM bid`): pure
    * per-row pass-through with an event-time projection.
    */
  private val w04 = Q(
    "w04_elementwise",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id", $"event_type",
          dec($"value", 12, 2).as("v"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        CAST(value AS DECIMAL(12,2)) AS v
      FROM events ORDER BY event_id"""))

  /** w05 — stream–static (side-input) join (NEXMark q13 / YSB campaign
    * join, reference query/q13.sql + benchmarks/src/ysb/ysb.sql:1-7):
    * events joined to a broadcast dimension, counted per dimension
    * attribute.
    */
  private val w05 = Q(
    "w05_stream_static_join",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer")
      T(s, d, "events")
        .filter($"event_type" === "click" || $"event_type" === "view")
        .join(broadcast(cust), $"user_id" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      FROM events JOIN customer ON user_id = c_custkey
      WHERE event_type IN ('click', 'view')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** w06 — windowed max + join-back (NEXMark q7 "highest bid per window",
    * reference query/q7.sql): Spark-first as rank-over-window — one shuffle,
    * no self-join against the aggregate.
    */
  private val w06 = Q(
    "w06_window_argmax",
    (s, d) => {
      import s.implicits._
      val winStart = (unix_micros($"ts") / lit(600000000L)).cast(LongType) * lit(600000000L)
      val w = Window.partitionBy($"win_start_us").orderBy($"value".desc, $"event_id")
      T(s, d, "events")
        .withColumn("win_start_us", winStart)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"win_start_us", $"event_id", $"user_id", $"value")
        .orderBy($"win_start_us")
    },
    Some("""
      SELECT win_start_us, event_id, user_id, value FROM (
        SELECT (epoch_us(ts) // 600000000) * 600000000 AS win_start_us,
          event_id, user_id, value,
          ROW_NUMBER() OVER (PARTITION BY (epoch_us(ts) // 600000000)
                             ORDER BY value DESC, event_id) AS rk
        FROM events) t
      WHERE rk = 1 ORDER BY win_start_us"""))

  /** w07 — count-based (row) windows per key: Flock's `Schedule::Rows(n)`
    * (reference flock/src/stream/window.rs:55-94) has no direct Structured
    * Streaming equivalent (SURVEY §1.1 Schedule row); expressed relationally
    * as ordered row_number per key bucketed into windows of 100 events.
    */
  private val w07 = Q(
    "w07_count_windows",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      T(s, d, "events")
        .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
          dec($"value", 12, 2).as("v"))
        .withColumn("win_id", ((row_number().over(w) - 1) / 100).cast(IntegerType))
        .groupBy($"user_id", $"win_id")
        .agg(count(lit(1)).as("n"), min($"us").as("first_us"),
          max($"us").as("last_us"), dec(sum($"v"), 38, 2).as("sum_v"))
        .orderBy($"user_id", $"win_id")
    },
    Some("""
      WITH r AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
          CAST(value AS DECIMAL(12,2)) AS v,
          CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) - 1) // 100 AS INT) AS win_id
        FROM events)
      SELECT user_id, win_id, COUNT(*) AS n, MIN(us) AS first_us,
        MAX(us) AS last_us, CAST(SUM(v) AS DECIMAL(38,2)) AS sum_v
      FROM r GROUP BY user_id, win_id ORDER BY user_id, win_id"""))

  val all: Seq[Q] = Seq(w01, w02, w03, w04, w05, w06, w07)
}
