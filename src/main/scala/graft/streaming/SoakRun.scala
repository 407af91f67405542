package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Stateful-streaming soak: runs one STATEFUL query shape (session
  * windows, processing-time gap windows, hopping aggregation) against the
  * live NEXMark generator at a sustained event rate and reports
  * batch-duration and state-store trajectories — the axis NexmarkRun's
  * stateless throughput runs don't cover. The reference's envelope is
  * ~1k events/s per Lambda worker (BASELINE.md §A); the point here is to
  * show the Spark substrate holds the same shapes at 50–100× that rate on
  * one node with BOUNDED state and NO growing backlog.
  *
  * State store: RocksDB provider (the 100 TB configuration — heap state
  * would cap at executor memory; RocksDB spills to local disk exactly as
  * a production cluster would run it).
  *
  * Usage: sbt "runMain graft.streaming.SoakRun -q q11 -s 60 -e 100000"
  * Shapes: q11 (session_window), q12 (proc-time gap, custom state),
  * q5agg (hopping window agg).
  *
  * Output: one JSON line with per-half mean batch durations (a growing
  * backlog shows up as second_half >> first_half), max batch duration,
  * final state rows/memory, and rows/s throughput.
  */
object SoakRun {
  def main(args: Array[String]): Unit = {
    val opts = args.grouped(2).map {
      case Array(k, v) if k.startsWith("-") && !v.startsWith("-") => k -> v
      case other => sys.error(
        s"bad argument pair '${other.mkString(" ")}' — expected -flag value")
    }.toMap
    val shape = opts.getOrElse("-q", "q11")
    val secs = opts.getOrElse("-s", "60").toInt
    val eps = opts.getOrElse("-e", "100000").toInt

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName(s"graft-soak-$shape")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bids = Nexmark.bidStream(spark, rowsPerSecond = eps)

    val df = shape match {
      // Watermark at 5 s: sessions close (and state evicts) once event
      // time passes session_end + gap — state stays bounded by the live
      // session count, not the run length.
      case "q11" => StreamQueries.q11(
        bids.withWatermark("b_date_time", "5 seconds"), gap = "10 seconds")
      // The explicit-timer session twin (SessionWindowProcessor, list
      // state): same shape as q11 but exercising transformWithState's
      // per-session timers and the open-session-list merge path — state
      // must stay bounded by live sessions exactly like the built-in.
      case "q11tws" =>
        StatefulProcessors.sessionWindowsTws(bids, delay = "5 seconds").toDF()
      // Online LSH near-dup claims under duplicate-heavy load: 1000
      // distinct synthetic texts cycle at full rate, so ~99.9% of
      // arrivals are duplicates — state must stay pinned at the bucket
      // count of the NOVEL corpus (≤ 4 bands x 1000 texts), not grow
      // with the stream.
      case "neardup" =>
        StatefulProcessors.nearDupStream(bids.select(
          (col("auction").cast("long") * 1000000L + col("bidder")).as("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("synthetic bid document text number "),
            (col("auction") % 1000).cast("string"),
            org.apache.spark.sql.functions.lit(" end marker")).as("text"),
          col("b_date_time").as("event_time"))).toDF()
      case "q12" => StreamQueries.q12(bids, sizeMs = 2000).toDF()
      case "q5agg" =>
        // The stateful half of q5 (hopping count per auction); the
        // ranking half is batch-only (row_number is unsupported on
        // streams) and replays per batch in NexmarkRun — here only the
        // window-state aggregation is under test.
        bids.withWatermark("b_date_time", "5 seconds")
          .groupBy(
            org.apache.spark.sql.functions.window(
              col("b_date_time"), "10 seconds", "5 seconds").as("win"),
            col("auction"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_bids"))
      case other => sys.error(s"unsupported soak shape: $other")
    }
    // q5agg aggregates emit on watermark close in append mode; update
    // mode would re-emit per batch. Both are stateful; append matches
    // the windows' one-result-per-window contract.
    val mode = if (shape == "q12") "append" else "append"
    val q = df.writeStream.format("noop")
      .outputMode(mode)
      .option("checkpointLocation",
        s"/tmp/soak_ckpt_${shape}_${System.currentTimeMillis()}")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    // Sample every progress update (recentProgress keeps the last 100;
    // at a 1 s trigger a <=100 s soak loses nothing).
    Thread.sleep(secs * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()

    case class Sample(batchMs: Long, inRows: Long, stateRows: Long,
        stateMemBytes: Long)
    val samples = progress.flatMap { p =>
      val ms = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      val st = p.stateOperators.headOption
      if (p.numInputRows == 0 && ms == 0) None
      else Some(Sample(ms, p.numInputRows,
        st.map(_.numRowsTotal).getOrElse(0L),
        st.map(_.memoryUsedBytes).getOrElse(0L)))
    }
    require(samples.nonEmpty, "no progress samples — soak too short")
    val (h1, h2) = samples.splitAt(samples.size / 2)
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0 else xs.sum.toDouble / xs.size
    val in = samples.map(_.inRows).sum
    val json =
      f"""{"shape":"$shape","eps":$eps,"secs":$secs,""" +
      f""""batches":${samples.size},"input_rows":$in,""" +
      f""""rows_per_sec":${in / secs}%d,""" +
      f""""mean_batch_ms_h1":${mean(h1.map(_.batchMs))}%.0f,""" +
      f""""mean_batch_ms_h2":${mean(h2.map(_.batchMs))}%.0f,""" +
      f""""max_batch_ms":${samples.map(_.batchMs).max},""" +
      f""""state_rows_mid":${h1.lastOption.map(_.stateRows).getOrElse(0L)},""" +
      f""""state_rows_last":${samples.last.stateRows},""" +
      f""""state_mem_mb_last":${samples.last.stateMemBytes / 1e6}%.1f}"""
    println(json)
    spark.stop()
  }
}
