package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-minute progress trajectory for the CLI drivers — the evidence
  * format the soak harness prints (mean/max batch ms, state rows,
  * source backlog), attached to a live query so a user running
  * NexmarkRun/YsbRun under overload SEES the graceful-overload contract:
  * bounded batch means, flat state, backlog growing at
  * offered − admitted. Backlog is read from the source's own offsets
  * (latestOffset − endOffset), which the V2 generator source reports as
  * plain id counts — the same `maxOffsetsPerTrigger`-style lag metric a
  * Kafka consumer would graph. The field is emitted ONLY when the
  * source is the V2 generator (matched on its progress description);
  * other sources' offsets (e.g. the rate source's seconds) are not row
  * counts and get no backlog field rather than a mislabeled one.
  */
final class ProgressLog(spark: SparkSession) {
  private case class S(atMs: Long, batchMs: Long, inRows: Long,
      stateRows: Long, backlogRows: Option[Long])
  private val buf = scala.collection.mutable.ArrayBuffer.empty[S]
  private val t0 = System.currentTimeMillis()

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val ms = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      val st = p.stateOperators.headOption
      // latestOffset − endOffset is a ROW count only for the V2
      // generator source (offset = id). The rate source's offsets are
      // seconds — emitting their delta as "backlog_rows" would mislabel
      // a seconds gap as rows, so the field is omitted for any source
      // whose description isn't the V2 generator's.
      val backlog = p.sources.headOption
        .filter(s => Option(s.description).exists(
          _.startsWith("nexmark-gen")))
        .flatMap { s =>
          (Option(s.latestOffset).flatMap(_.toLongOption),
            Option(s.endOffset).flatMap(_.toLongOption)) match {
            case (Some(l), Some(end)) => Some(math.max(0L, l - end))
            case _ => None
          }
        }
      if (p.numInputRows > 0 || ms > 0) buf.synchronized {
        buf += S(System.currentTimeMillis() - t0, ms, p.numInputRows,
          st.map(_.numRowsTotal).getOrElse(0L), backlog)
      }
    }
  }

  spark.streams.addListener(listener)

  /** Detach and return one JSON line per elapsed minute. */
  def finish(): Seq[String] = {
    spark.streams.removeListener(listener)
    val samples = buf.synchronized(buf.toSeq)
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0 else xs.sum.toDouble / xs.size
    samples.groupBy(_.atMs / 60000).toSeq.sortBy(_._1).map { case (m, ss) =>
      val backlog = ss.last.backlogRows
        .map(b => s""","backlog_rows":$b""").getOrElse("")
      String.format(java.util.Locale.ROOT,
        """{"m":%d,"batches":%d,"mean_batch_ms":%.0f,"max_batch_ms":%d,""" +
        """"input_rows":%d,"state_rows":%d%s}""",
        Long.box(m), Int.box(ss.size), Double.box(mean(ss.map(_.batchMs))),
        Long.box(ss.map(_.batchMs).max), Long.box(ss.map(_.inRows).sum),
        Long.box(ss.last.stateRows), backlog)
    }
  }
}
