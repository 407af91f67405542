package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One bid as consumed by the leaderboard processor. */
case class BidIn(auction: Int, bidder: Int, price: Int, tsUs: Long)

/** Bounded per-auction state: the current top-k bids. */
case class TopBids(bids: Seq[TopBid])
case class TopBid(price: Int, bidder: Int, tsUs: Long)

/** One emitted leaderboard row (re-emitted per trigger for auctions that
  * saw new bids).
  */
case class LeaderboardRow(auction: Int, rank: Int, price: Int, bidder: Int)

/** Leaderboard row for the APPEND-LOG form (the hard-gate replay sinks to
  * parquet, an append-only log): carries the bid timestamp so the final
  * per-(auction, rank) state is recoverable from the log by pure
  * aggregation — rank entries improve monotonically in (price desc,
  * tsUs asc, bidder asc), so final = max(struct(price, -tsUs, -bidder)).
  */
case class LeaderboardLog(auction: Int, rank: Int, price: Int, bidder: Int,
    tsUs: Long)

/** Heavy-hitters stream rows (p19 twin on transformWithState). */
case class HHIn(group: String, key: Long)
case class HHRow(group: String, nSeen: Long, rank: Int, value: Long,
    count: Long)

/** One event as consumed by the funnel processor. */
case class FunnelEvent(userId: Long, eventType: String, tsUs: Long)

/** O(1) per-user funnel progress; -1 marks a stage not yet reached. */
case class FunnelState(vUs: Long, cUs: Long, pUs: Long)

/** Emitted exactly once per user, when the purchase stage completes. */
case class FunnelDone(userId: Long, vUs: Long, cUs: Long, pUs: Long)

/** One attribution decision, emitted per purchase as it arrives. */
case class AttrOut(userId: Long, pUs: Long, attributed: Boolean, lagUs: Long)

/** Session-path twin rows (p54). */
case class PathEvent(userId: Long, eventId: Long, eventType: String, tsUs: Long)
case class PathState(lastUs: Long, lastId: Long, lastType: String)
case class PathEdge(userId: Long, src: String, dst: String)

/** Gap-spectrum twin rows (p108): O(1) per-user state — the previous
  * event's timestamp — and one magnitude-bucketed gap out per event that
  * has a predecessor.
  */
case class GapLastState(lastUs: Long)
case class GapOut(eventType: String, bucket: Int, gapUs: Long)

/** Session-window twin rows (q11): per-bidder event-time sessions.
  * `eventTime` carries the watermarked column through to the stateful
  * operator so the engine's late-row filtering applies to exactly the
  * rows the built-in would drop; the processor itself reads only tsUs.
  */
case class SessBidIn(bidder: Int, price: Int, tsUs: Long,
    eventTime: java.sql.Timestamp)
case class SessState(startUs: Long, lastUs: Long, n: Long,
    minP: Int, maxP: Int)
/** All concurrently-open sessions of one key, disjoint and gap-separated,
  * plus the key's single registered timer slot (0 = none) — carrying the
  * slot in state is what makes the lazy-timer discipline (see
  * SessionWindowProcessor) possible without a listTimers scan.
  */
case class SessList(sessions: Seq[SessState], timerMs: Long)
case class SessionRow(bidder: Int, sessionStartUs: Long, sessionEndUs: Long,
    nBids: Long, minPrice: Int, maxPrice: Int)

/** Near-dup twin rows: one (LSH band-bucket, doc) probe in, one claim
  * decision out; state is the bucket's first claimant.
  */
case class BucketProbe(bucket: String, docId: Long, tsUs: Long, band: Int)
case class ClaimState(tsUs: Long, docId: Long)
case class ClaimOut(docId: Long, band: Int, claimantId: Long, isDup: Boolean)

/** Keep-best twin rows (p63): one fingerprinted document in, one winner
  * CHANGE out; state is the current best member per cluster.
  */
case class KeepDocIn(simhash: Long, docId: Long, source: String, nChars: Long)
case class BestState(nChars: Long, docId: Long, source: String)
case class WinnerRow(simhash: Long, docId: Long, source: String, nChars: Long)

/** Streaming operators on Spark 4's `transformWithState` — the
  * arbitrary-state successor to `flatMapGroupsWithState` (typed per-key
  * state variables, explicit timers, TTL; RocksDB-backed). The reference's
  * per-key window drivers (flock-function/src/aws/window/global.rs:161-307,
  * session.rs:187-321) hand-roll exactly this machinery — keyed state plus
  * a timeout scan per epoch — so this API is their most direct Spark
  * mapping, more so than the fMGWS forms kept in StreamQueries for
  * comparison.
  *
  * Scale notes: state lives in the state store keyed by the group (one
  * partition owns a key — no cross-executor coordination); timers are
  * store-backed too, so a 100M-key stream carries 100M timers without
  * driver involvement. The two processors here keep O(k) and O(1) state
  * per key respectively, so state size is bounded by key cardinality, not
  * stream length.
  */
object StatefulProcessors {

  /** Per-auction top-k bid leaderboard: ValueState holds at most k
    * (price, bidder, ts) entries per auction — the streaming form of
    * "current best bids", with state bounded at k rows per key no matter
    * how many bids arrive. Each trigger folds the new bids and re-emits
    * the refreshed leaderboard for auctions that changed.
    *
    * Ordering is total (price desc, tsUs asc, bidder asc), so the
    * leaderboard is deterministic for any arrival order.
    */
  class AuctionTopK(k: Int)
      extends StatefulProcessor[Int, BidIn, LeaderboardRow] {
    @transient private var top: ValueState[TopBids] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getValueState[TopBids]("top",
        Encoders.product[TopBids], TTLConfig.NONE)

    override def handleInputRows(auction: Int, rows: Iterator[BidIn],
        timerValues: TimerValues): Iterator[LeaderboardRow] = {
      val prev = if (top.exists()) top.get().bids else Seq.empty
      val merged = (prev ++ rows.map(b => TopBid(b.price, b.bidder, b.tsUs)))
        .sortBy(t => (-t.price, t.tsUs, t.bidder))
        .take(k)
      top.update(TopBids(merged))
      merged.iterator.zipWithIndex.map { case (t, i) =>
        LeaderboardRow(auction, i + 1, t.price, t.bidder)
      }
    }
  }

  /** AuctionTopK's append-log twin: identical fold (same total order,
    * same k-bounded ValueState), but each refreshed leaderboard row also
    * carries its bid's event timestamp so an append-only sink (the gate's
    * parquet log) can recover the FINAL leaderboard by aggregation alone
    * — see LeaderboardLog. Top-k merge is commutative/idempotent over
    * bid arrival order, so no arrival contract is needed.
    */
  class AuctionTopKLog(k: Int)
      extends StatefulProcessor[Int, BidIn, LeaderboardLog] {
    @transient private var top: ValueState[TopBids] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getValueState[TopBids]("top",
        Encoders.product[TopBids], TTLConfig.NONE)

    override def handleInputRows(auction: Int, rows: Iterator[BidIn],
        timerValues: TimerValues): Iterator[LeaderboardLog] = {
      val prev = if (top.exists()) top.get().bids else Seq.empty
      val merged = (prev ++ rows.map(b => TopBid(b.price, b.bidder, b.tsUs)))
        .sortBy(t => (-t.price, t.tsUs, t.bidder))
        .take(k)
      top.update(TopBids(merged))
      merged.iterator.zipWithIndex.map { case (t, i) =>
        LeaderboardLog(auction, i + 1, t.price, t.bidder, t.tsUs)
      }
    }
  }

  /** Per-group SpaceSaving heavy hitters on transformWithState — the
    * p19 batch aggregate's sketch carried as keyed ValueState (serialized
    * bytes, RocksDB-backed), re-emitting the refreshed top-k per trigger.
    * In the exact regime (capacity ≥ per-group key cardinality, the same
    * contract the batch entry documents) insertion is commutative — no
    * arrival contract — and the log's final emission per group (max
    * nSeen: nSeen strictly increases every touched trigger) equals the
    * batch top-k, which is what the gate aggregates out.
    */
  class SpaceSavingProcessor(k: Int, capacity: Int)
      extends StatefulProcessor[String, HHIn, HHRow] {
    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("sketch",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(group: String, rows: Iterator[HHIn],
        timerValues: TimerValues): Iterator[HHRow] = {
      import graft.functions.SpaceSavingSketch
      val sk =
        if (st.exists()) SpaceSavingSketch.deserialize(st.get())
        else new SpaceSavingSketch(capacity)
      rows.foreach(r => sk.add(r.key))
      st.update(SpaceSavingSketch.serialize(sk))
      sk.topK(k).iterator.zipWithIndex.map { case ((v, c, _), i) =>
        HHRow(group, sk.nSeen, i + 1, v, c)
      }
    }
  }

  /** Append-log leaderboard stream over raw bid frames (NEXMark columns). */
  def auctionTopKLog(bids: DataFrame, k: Int = 3): Dataset[LeaderboardLog] = {
    val spark = bids.sparkSession
    import spark.implicits._
    bids.select(col("auction"), col("bidder"), col("price"),
        unix_micros(col("b_date_time")).as("tsUs"))
      .as[BidIn]
      .groupByKey(_.auction)
      .transformWithState(new AuctionTopKLog(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Heavy-hitters stream over raw event frames (event_type, user_id). */
  def heavyHittersTws(events: DataFrame, k: Int = 3,
      capacity: Int = 262144): Dataset[HHRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").as("group"),
        col("user_id").cast("long").as("key"))
      .as[HHIn]
      .groupByKey(_.group)
      .transformWithState(new SpaceSavingProcessor(k, capacity),
        TimeMode.None(), OutputMode.Append())
  }

  /** NEXMark q12's processing-time gap windows on the timer API: the exact
    * Flock Global(n s) semantics (flock-function/src/aws/window/global.rs —
    * per-bidder window opens at first bid, closes n seconds of wall-clock
    * later), expressed the way the new API intends: the window-close scan
    * that StreamQueries.q12 encodes via GroupStateTimeout is an explicit
    * per-key timer registered at open time and handled in
    * handleExpiredTimer. O(1) state + one timer per in-flight key.
    */
  class GapWindowProcessor(sizeMs: Long)
      extends StatefulProcessor[Int, BidKeyed, GapWindowOut] {
    @transient private var st: ValueState[GapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GapState]("gap",
        Encoders.product[GapState], TTLConfig.NONE)

    override def handleInputRows(bidder: Int, rows: Iterator[BidKeyed],
        timerValues: TimerValues): Iterator[GapWindowOut] = {
      var out = List.empty[GapWindowOut]
      var cur = if (st.exists()) Some(st.get()) else None
      rows.foreach { r =>
        cur match {
          case Some(s) if r.pTimeMs < s.startMs + sizeMs =>
            cur = Some(s.copy(n = s.n + 1))
          case Some(s) =>
            // The batch outran the timer: close the old window inline.
            out ::= GapWindowOut(bidder, s.startMs, s.startMs + sizeMs, s.n)
            getHandle.deleteTimer(s.startMs + sizeMs)
            cur = Some(GapState(r.pTimeMs, 1))
            getHandle.registerTimer(r.pTimeMs + sizeMs)
          case None =>
            cur = Some(GapState(r.pTimeMs, 1))
            getHandle.registerTimer(r.pTimeMs + sizeMs)
        }
      }
      cur.foreach(st.update)
      out.reverseIterator
    }

    override def handleExpiredTimer(bidder: Int, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GapWindowOut] = {
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      // Stale-expiry guard: when handleInputRows closes a window inline,
      // its deleteTimer may race a timer already in this batch's expired
      // set — acting on that stale expiry would close the FRESHLY opened
      // window with a partial count and wrong boundaries. Only the timer
      // registered for the CURRENT window (expiry == startMs + sizeMs)
      // may close it.
      if (expiredTimerInfo.getExpiryTimeInMs() != s.startMs + sizeMs)
        return Iterator.empty
      st.clear()
      Iterator.single(
        GapWindowOut(bidder, s.startMs, s.startMs + sizeMs, s.n))
    }
  }

  /** NEXMark q11's EVENT-TIME session windows on explicit timers — the
    * reference's actual per-key gap algorithm (flock-function/src/aws/
    * window/session.rs:64-179: per-key open-session state, close when the
    * event-time gap exceeds the threshold), where the gated q11 entry uses
    * the built-in `session_window` aggregate. Semantics match the
    * built-in exactly FOR ANY arrival order above the watermark: each
    * event is a proto-session [ts, ts+gap); sessions merge iff their
    * windows strictly overlap (touching windows don't merge), so a later
    * batch's earlier-timestamped row extends a session BACKWARDS or
    * bridges two open sessions, exactly like the built-in's
    * window-merging state.
    *
    * Emission discipline: sessions close ONLY via event-time timers —
    * never inline — because a session "outrun" by a same-batch successor
    * can still legally merge with an out-of-order row arriving in a later
    * microbatch (above the watermark, within the delay). State is the
    * full set of concurrently-open (disjoint, gap-separated) sessions per
    * key; one timer per open session at ceil((last+gap)/1ms). A fired
    * timer closes every session whose expiry it covers: the watermark has
    * passed last+gap, and any future row has ts ≥ watermark ≥ last+gap,
    * which the strict `<` extension test rejects — the close is final by
    * the same argument the reference's epoch scan makes. Open-session
    * count is bounded by (watermark delay / gap) + 1, so state stays O(1)
    * per key for any fixed lateness horizon.
    *
    * Timer discipline (the r12 throughput fix — timer churn was the
    * 4-24x gap to the other stateful shapes): at most ONE timer per key,
    * kept in state (SessList.timerMs), registered at the EARLIEST open
    * expiry and deliberately left in place when extensions move expiries
    * later. An "early" fire is cheap and safe: the handler closes by the
    * CURRENT WATERMARK (not the fired slot) — every session whose
    * last+gap the watermark has passed is final by the admission
    * argument above — and re-registers once at the new earliest expiry
    * if sessions remain. Extending a session therefore costs ZERO timer
    * writes (the old per-event delete+register pair was two state-store
    * writes each); timer traffic drops to ~one fire+register per gap
    * period per key. Closing by watermark also makes a single fire
    * absorb a large watermark jump (the far-future drain sentinel closes
    * everything in one call).
    */
  class SessionWindowProcessor(gapUs: Long)
      extends StatefulProcessor[Int, SessBidIn, SessionRow] {
    @transient private var st: ValueState[Array[Byte]] = _

    // State name "sess_v2": the v1 state was a ValueState[SessList]
    // product encoding with one timer PER SESSION; v2 is hand-packed
    // binary with a single in-state timer slot. The formats are
    // incompatible (and v1 checkpoints carry extra registered timers the
    // one-slot logic doesn't expect), so the bumped name makes a restore
    // of a v1 checkpoint fail loudly instead of mis-decoding.
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("sess_v2",
        Encoders.BINARY, TTLConfig.NONE)

    // Hand-packed state layout (the SpaceSavingProcessor pattern): the
    // nested-Seq product encoder was the per-key hot cost at the 100k+
    // brackets; a flat ByteBuffer is one array copy each way.
    // [timerMs: 8][count: 4] + count * [startUs 8 | lastUs 8 | n 8 |
    // minP 4 | maxP 4].
    private def pack(l: SessList): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + 32 * l.sessions.size)
      buf.putLong(l.timerMs).putInt(l.sessions.size)
      l.sessions.foreach { s =>
        buf.putLong(s.startUs).putLong(s.lastUs).putLong(s.n)
          .putInt(s.minP).putInt(s.maxP)
      }
      buf.array()
    }

    private def unpack(b: Array[Byte]): SessList = {
      val buf = java.nio.ByteBuffer.wrap(b)
      val timer = buf.getLong()
      val n = buf.getInt()
      val ss = List.newBuilder[SessState]
      var i = 0
      while (i < n) {
        ss += SessState(buf.getLong(), buf.getLong(), buf.getLong(),
          buf.getInt(), buf.getInt())
        i += 1
      }
      SessList(ss.result(), timer)
    }

    /** Timer slot for a session: first whole millisecond at or after the
      * µs close instant — a timer must never fire BEFORE the session can
      * still be extended.
      */
    private def expiryMs(s: SessState): Long =
      -Math.floorDiv(-(s.lastUs + gapUs), 1000L)

    private def emit(bidder: Int, s: SessState): SessionRow =
      SessionRow(bidder, s.startUs, s.lastUs + gapUs, s.n, s.minP, s.maxP)

    override def handleInputRows(bidder: Int, rows: Iterator[SessBidIn],
        timerValues: TimerValues): Iterator[SessionRow] = {
      // One store read: ValueState.get() returns null when absent.
      val prevBytes = st.get()
      val prevList = if (prevBytes == null) null else unpack(prevBytes)
      var sessions: List[SessState] =
        if (prevList == null) Nil else prevList.sessions.toList
      val prevTimer = if (prevList == null) 0L else prevList.timerMs
      // Merge is commutative and associative (interval union + agg fold),
      // so no within-batch sort is needed; a row can bridge at most two
      // gap-separated sessions and the partition absorbs both.
      rows.foreach { r =>
        var cur = SessState(r.tsUs, r.tsUs, 1L, r.price, r.price)
        val (hit, miss) = sessions.partition(s =>
          r.tsUs < s.lastUs + gapUs && s.startUs < r.tsUs + gapUs)
        hit.foreach { s =>
          cur = SessState(math.min(cur.startUs, s.startUs),
            math.max(cur.lastUs, s.lastUs), cur.n + s.n,
            math.min(cur.minP, s.minP), math.max(cur.maxP, s.maxP))
        }
        sessions = cur :: miss
      }
      // INLINE closure by the batch watermark — the throughput fix the
      // store profile demanded (expired timers ran at ~2× state
      // removals: every back-to-back session pair cost a full timer-fire
      // cycle). A session whose last+gap the watermark has passed is
      // final by the same admission argument the timer path uses, and
      // the wm value is the same one handleExpiredTimer would see THIS
      // batch — so emitting it here is bit-identical output, minus that
      // session's entire fire cycle (framework fire + state get +
      // re-register + put), the dominant per-session store cost.
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val (done, open) = sessions.partition(s => expiryMs(s) <= wmMs)
      // `open` is never empty: every input row's ts is at/above the
      // admission watermark, so its session expires at ts+gap > wm.
      val needMs = open.iterator.map(expiryMs).min
      // Timer rule: (a) no slot → register; (b) an EARLIER needed slot →
      // move; (c) a slot the watermark has already passed → move (left
      // in place it would fire right after this batch's input and waste
      // a full cycle on sessions we just proved open); (d) otherwise
      // keep the slot lazily — extensions cost zero timer writes and
      // resolve as one early fire.
      val timer =
        if (prevTimer == 0L) { getHandle.registerTimer(needMs); needMs }
        else if (needMs < prevTimer || prevTimer <= wmMs) {
          if (prevTimer != needMs) {
            getHandle.deleteTimer(prevTimer)
            getHandle.registerTimer(needMs)
          }
          needMs
        } else prevTimer
      // Open-session packing order is arbitrary (emit paths sort); the
      // old per-batch sortBy was pure overhead.
      st.update(pack(SessList(open, timer)))
      if (done.isEmpty) Iterator.empty
      else done.sortBy(_.startUs).iterator.map(emit(bidder, _))
    }

    override def handleExpiredTimer(bidder: Int, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] = {
      val curBytes = st.get()
      if (curBytes == null) return Iterator.empty
      val cur = unpack(curBytes)
      val wmMs = timerValues.getCurrentWatermarkInMs()
      // Stale fire: the key's stored slot is still in the future (e.g.
      // this batch's input already re-pointed the timer, or an earlier
      // fire in this batch re-registered). That live slot covers the
      // key; registering another here would leak a duplicate.
      if (cur.timerMs > wmMs) return Iterator.empty
      // Close by the CURRENT watermark: any session with last+gap at or
      // below it is final (future rows are admitted only at or above the
      // previous batch's eviction watermark, which the strict `<`
      // extension test rejects), and sessions the watermark has NOT
      // passed stay open no matter which slot fired — the stale-expiry
      // race resolves itself.
      val (done, open) = cur.sessions.partition(s => expiryMs(s) <= wmMs)
      if (open.isEmpty) st.clear()
      else {
        val t = open.iterator.map(expiryMs).min
        getHandle.registerTimer(t)
        st.update(pack(SessList(open, t)))
      }
      done.sortBy(_.startUs).iterator.map(emit(bidder, _))
    }
  }

  /** Streaming twin of the p44 batch funnel: a per-user three-stage
    * state machine (first 'view' → first 'click' strictly after it →
    * first 'purchase' strictly after that), emitting one completion row
    * per user the trigger its purchase stage closes. State is O(1) per
    * key (three timestamps) and the emission is once-only, so output
    * volume is bounded by users, not events.
    *
    * Exactness contract: identical to the batch recompute when each
    * user's events arrive in event-time order ACROSS triggers (the
    * usual keyed-source guarantee — e.g. a log partitioned by user);
    * within a trigger arrival order is irrelevant (the batch is
    * sorted). A later-arriving earlier 'view' cannot retroactively
    * re-open a stage — that would need unbounded event retention,
    * which is the batch entry's job.
    */
  class FunnelProcessor
      extends StatefulProcessor[Long, FunnelEvent, FunnelDone] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelDone] = {
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      val doneBefore = s.pUs >= 0
      rows.toSeq.sortBy(_.tsUs).foreach { r =>
        r.eventType match {
          case "view" if s.vUs < 0 => s = s.copy(vUs = r.tsUs)
          case "click" if s.vUs >= 0 && s.cUs < 0 && r.tsUs > s.vUs =>
            s = s.copy(cUs = r.tsUs)
          case "purchase" if s.cUs >= 0 && s.pUs < 0 && r.tsUs > s.cUs =>
            s = s.copy(pUs = r.tsUs)
          case _ => // stage already closed, or out of sequence
        }
      }
      st.update(s)
      if (!doneBefore && s.pUs >= 0)
        Iterator.single(FunnelDone(user, s.vUs, s.cUs, s.pUs))
      else Iterator.empty
    }
  }

  /** Streaming twin of the p46 batch attribution: per-user O(1) state
    * (the latest click timestamp), one attribution decision emitted per
    * purchase the moment it arrives. Matches p46's strictly-before
    * semantics exactly: same-timestamp purchases are processed BEFORE
    * same-timestamp clicks (the batch sort's tie-break), so a purchase
    * only ever sees clicks with a strictly smaller timestamp — the same
    * rows p46's `RANGE ... 1 PRECEDING` frame admits. Exact under the
    * per-key event-time-ordered arrival contract (see FunnelProcessor).
    */
  class AttributionProcessor(lookbackUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, AttrOut] {
    @transient private var lastClick: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastClick = getHandle.getValueState[Long]("lastClick",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[AttrOut] = {
      var last = if (lastClick.exists()) lastClick.get() else -1L
      var out = List.empty[AttrOut]
      rows.toSeq
        .sortBy(e => (e.tsUs, if (e.eventType == "purchase") 0 else 1))
        .foreach { e =>
          e.eventType match {
            case "purchase" =>
              val attr = last >= 0 && last < e.tsUs &&
                last >= e.tsUs - lookbackUs
              out ::= AttrOut(user, e.tsUs, attr,
                if (attr) e.tsUs - last else 0L)
            case "click" => last = math.max(last, e.tsUs)
            case _ =>
          }
        }
      lastClick.update(last)
      out.reverseIterator
    }
  }

  /** Attribution stream over raw event frames (user_id, event_type, ts). */
  def attribution(events: DataFrame,
      lookbackUs: Long = 3600000000L): Dataset[AttrOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("userId"),
        col("event_type").as("eventType"), unix_micros(col("ts")).as("tsUs"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .transformWithState(new AttributionProcessor(lookbackUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Funnel stream over raw event frames (user_id, event_type, ts). */
  def funnelStages(events: DataFrame): Dataset[FunnelDone] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("userId"),
        col("event_type").as("eventType"), unix_micros(col("ts")).as("tsUs"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of the p54 batch session-path analysis: per-user
    * O(1) state — the (ts, event_id, type) of the LAST event seen — and
    * one transition edge emitted per event: `_START_ → t` when a session
    * opens (first event, or gap > gapUs), `prev → t` inside a session,
    * and `last → _END_` the moment a gap closes the previous session.
    * Aggregating the edge stream reproduces the batch transition matrix
    * exactly, EXCEPT the `_END_` edges of sessions still open at the end
    * of the (unbounded) stream — those are unknowable online; a
    * `_FLUSH_` sentinel event (ts past every real event) closes them,
    * which is what the equivalence test feeds and what a production
    * drain does. Exact under the per-key event-time-ordered arrival
    * contract (see FunnelProcessor); within a trigger, rows are sorted
    * by the batch total order (ts, event_id).
    */
  class SessionPathProcessor(gapUs: Long)
      extends StatefulProcessor[Long, PathEvent, PathEdge] {
    @transient private var st: ValueState[PathState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PathState]("sessPath",
        Encoders.product[PathState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[PathEvent],
        timerValues: TimerValues): Iterator[PathEdge] = {
      var s = if (st.exists()) st.get() else PathState(-1L, -1L, "")
      val out = scala.collection.mutable.ListBuffer.empty[PathEdge]
      rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        val isFlush = e.eventType == "_FLUSH_"
        if (s.lastUs < 0) {
          if (!isFlush) out += PathEdge(user, "_START_", e.eventType)
        } else if (isFlush || e.tsUs - s.lastUs > gapUs) {
          out += PathEdge(user, s.lastType, "_END_")
          if (!isFlush) out += PathEdge(user, "_START_", e.eventType)
        } else {
          out += PathEdge(user, s.lastType, e.eventType)
        }
        s = if (isFlush) PathState(-1L, -1L, "")
            else PathState(e.tsUs, e.eventId, e.eventType)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Session-path edge stream over raw event frames
    * (user_id, event_id, event_type, ts). */
  def sessionPaths(events: DataFrame,
      gapUs: Long = 1800000000L): Dataset[PathEdge] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("userId"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("eventType"), unix_micros(col("ts")).as("tsUs"))
      .as[PathEvent]
      .groupByKey(_.userId)
      .transformWithState(new SessionPathProcessor(gapUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of the p63 batch keep-best selection: O(1) state per
    * SimHash cluster (the current best member) and one WINNER CHANGE
    * emitted whenever an arriving document beats it — a canonical-doc
    * changelog a downstream index can consume incrementally. Unlike the
    * funnel/attribution twins, keep-best needs NO arrival-order
    * contract: argmax is commutative and idempotent, so the final winner
    * per cluster equals the batch max(struct(n_chars, -doc_id)) under
    * ANY interleaving or batch split — the equivalence test feeds
    * deliberately shuffled chunks to prove it. State is bounded by
    * cluster cardinality, not stream length (and clusters outgrow
    * nothing: the state row never exceeds one member).
    */
  class KeepBestProcessor
      extends StatefulProcessor[Long, KeepDocIn, WinnerRow] {
    @transient private var best: ValueState[BestState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[BestState]("best",
        Encoders.product[BestState], TTLConfig.NONE)

    override def handleInputRows(sim: Long, rows: Iterator[KeepDocIn],
        timerValues: TimerValues): Iterator[WinnerRow] = {
      var s = if (best.exists()) best.get() else null
      var changed = false
      rows.foreach { r =>
        val better = s == null || r.nChars > s.nChars ||
          (r.nChars == s.nChars && r.docId < s.docId)
        if (better) { s = BestState(r.nChars, r.docId, r.source); changed = true }
      }
      if (changed) {
        best.update(s)
        Iterator.single(WinnerRow(sim, s.docId, s.source, s.nChars))
      } else Iterator.empty
    }
  }

  /** ONLINE MinHash-LSH near-dup detection — the streaming form of the
    * p08/p15 batch candidate generation: every arriving document probes
    * its LSH band buckets; the FIRST document to touch a bucket claims it
    * (first-writer-wins), and any later document hitting a claimed bucket
    * is flagged as a near-dup candidate of the claimant. This is exactly
    * what an ingestion filter needs: a per-document verdict available the
    * moment the document arrives, against everything already ingested —
    * no re-clustering, no batch recompute.
    *
    * Emits one ClaimOut per (doc, band): winners carry claimant == self /
    * isDup = false; a document is a near-dup candidate iff ANY of its
    * band rows has isDup = true (the same ≥1-shared-bucket rule as the
    * batch LSH candidate join) — the per-doc rollup is a trivial
    * aggregation of this evidence stream, same pattern as
    * SessionPathProcessor's edge stream.
    *
    * Arrival contract (same as FunnelProcessor): per-key event-time order
    * across triggers; within a trigger, rows sort by (tsUs, docId), so
    * same-batch collisions resolve to the batch total order
    * deterministically. State is ONE row per distinct claimed bucket —
    * bounded by corpus novelty, not stream length (duplicates add no
    * state); a production deployment bounds it further with a state TTL
    * (the claim window) — correctness-free here, so the test form keeps
    * claims forever.
    *
    * Out-of-order arrivals are GUARDED, not silently wrong: a probe
    * whose (tsUs, docId) precedes the stored claim violates the arrival
    * contract above. The dup/keeper PARTITION is arrival-order-invariant
    * either way (exactly one isDup=false per bucket — the first arrival —
    * so the dedup decision stays correct), but the CLAIMANT IDENTITY
    * would no longer match the batch min-(tsUs, docId) truth the
    * stream==batch tests pin. The guard makes that loud: `strict=true`
    * fails the query (use when the upstream replay is supposed to be
    * ordered); the default logs a warning per violating probe.
    */
  class BucketClaimProcessor(strict: Boolean = false)
      extends StatefulProcessor[String, BucketProbe, ClaimOut] {
    @transient private var owner: ValueState[ClaimState] = _
    @transient private lazy val log =
      org.slf4j.LoggerFactory.getLogger(classOf[BucketClaimProcessor])

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[ClaimState]("owner",
        Encoders.product[ClaimState], TTLConfig.NONE)

    override def handleInputRows(bucket: String, rows: Iterator[BucketProbe],
        timerValues: TimerValues): Iterator[ClaimOut] = {
      var cur = if (owner.exists()) owner.get() else null
      val out = scala.collection.mutable.ListBuffer.empty[ClaimOut]
      rows.toSeq.sortBy(r => (r.tsUs, r.docId)).foreach { r =>
        if (cur == null) {
          cur = ClaimState(r.tsUs, r.docId)
          out += ClaimOut(r.docId, r.band, r.docId, isDup = false)
        } else {
          if (r.tsUs < cur.tsUs ||
              (r.tsUs == cur.tsUs && r.docId < cur.docId)) {
            val msg = s"out-of-order probe on bucket=$bucket: " +
              s"doc=${r.docId} tsUs=${r.tsUs} precedes the stored claim " +
              s"(doc=${cur.docId} tsUs=${cur.tsUs}); claimant identity " +
              "no longer matches the batch min-(tsUs, docId) truth"
            if (strict) throw new IllegalStateException(msg)
            else log.warn(msg)
          }
          out += ClaimOut(r.docId, r.band, cur.docId, isDup = true)
        }
      }
      if (cur != null) owner.update(cur)
      out.iterator
    }
  }

  /** Near-dup claim stream over raw document frames
    * (doc_id, text, event_time): MinHash signature via the same native
    * expression as the batch entries (one md5 per shingle, k = `bands`
    * permutations, 1 row per band — p08's banding), exploded to
    * band-bucket probes. Stateless until the per-bucket claim state.
    */
  def nearDupStream(docs: DataFrame, bands: Int = 4,
      strict: Boolean = false): Dataset[ClaimOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("sig",
        graft.functions.MinHashShingleSig.minhash_sig(col("text"), bands))
      .select(col("doc_id").cast("long").as("docId"),
        unix_micros(col("event_time")).as("tsUs"),
        posexplode(col("sig")))
      .select(concat_ws(":", col("pos"), col("col")).as("bucket"),
        col("docId"), col("tsUs"), col("pos").cast("int").as("band"))
      .as[BucketProbe]
      .groupByKey(_.bucket)
      .transformWithState(new BucketClaimProcessor(strict),
        TimeMode.None(), OutputMode.Append())
  }

  /** Keep-best stream over fingerprinted document frames
    * (simhash, doc_id, source, n_chars).
    */
  /** Streaming twin of the p108 inter-event gap spectrum: per-user O(1)
    * state (the last event's µs timestamp) and one bucketed gap emitted
    * per event with a predecessor — the live form of the session-gap /
    * watermark tuning audit, so the histogram a downstream monitor
    * aggregates is available continuously instead of per batch job. The
    * bucket is the gap's binary magnitude (Long.toBinaryString length ==
    * the batch entry's length(bin(gap))). Same arrival contract as
    * SessionPathProcessor: within a batch rows sort by (tsUs, eventId);
    * across batches per-user event-time order must be non-decreasing —
    * the file-per-chunk replay pattern the restart tests pin.
    */
  class GapSpectrumProcessor
      extends StatefulProcessor[Long, PathEvent, GapOut] {
    @transient private var st: ValueState[GapLastState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GapLastState]("lastSeen",
        Encoders.product[GapLastState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[PathEvent],
        timerValues: TimerValues): Iterator[GapOut] = {
      var last = if (st.exists()) st.get().lastUs else -1L
      val out = scala.collection.mutable.ListBuffer.empty[GapOut]
      rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        if (last >= 0) {
          val gap = e.tsUs - last
          out += GapOut(e.eventType, java.lang.Long.toBinaryString(gap).length,
            gap)
        }
        last = e.tsUs
      }
      st.update(GapLastState(last))
      out.iterator
    }
  }

  /** Gap-spectrum stream over raw event frames
    * (user_id, event_id, event_type, ts). */
  def gapSpectrum(events: DataFrame): Dataset[GapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("userId"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("eventType"), unix_micros(col("ts")).as("tsUs"))
      .as[PathEvent]
      .groupByKey(_.userId)
      .transformWithState(new GapSpectrumProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  def keepBest(docs: DataFrame): Dataset[WinnerRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("simhash").cast("long").as("simhash"),
        col("doc_id").cast("long").as("docId"),
        col("source").as("source"), col("n_chars").cast("long").as("nChars"))
      .as[KeepDocIn]
      .groupByKey(_.simhash)
      .transformWithState(new KeepBestProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Leaderboard stream over raw bid frames (NEXMark columns). */
  def auctionTopK(bids: DataFrame, k: Int = 3): Dataset[LeaderboardRow] = {
    val spark = bids.sparkSession
    import spark.implicits._
    bids.select(col("auction"), col("bidder"), col("price"),
        unix_micros(col("b_date_time")).as("tsUs"))
      .as[BidIn]
      .groupByKey(_.auction)
      .transformWithState(new AuctionTopK(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** q11 twin of StreamQueries.q11, on explicit event-time timers.
    * Applies the watermark internally (event-time timers require one);
    * emits closed sessions with µs bounds — `timestamp_micros` the
    * sessionStartUs/sessionEndUs columns to compare against the batch
    * q11's timestamps.
    */
  def sessionWindowsTws(bids: DataFrame, gapUs: Long = 10000000L,
      delay: String = "5 seconds"): Dataset[SessionRow] = {
    val spark = bids.sparkSession
    import spark.implicits._
    bids.withWatermark("b_date_time", delay)
      .select(col("bidder").cast("int").as("bidder"),
        col("price").cast("int").as("price"),
        unix_micros(col("b_date_time")).as("tsUs"),
        col("b_date_time").as("eventTime"))
      .as[SessBidIn]
      .groupByKey(_.bidder)
      .transformWithState(new SessionWindowProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** q12 twin of StreamQueries.q12, on explicit timers. */
  def gapWindowsTws(bids: DataFrame,
      sizeMs: Long = 10000): Dataset[GapWindowOut] = {
    val spark = bids.sparkSession
    import spark.implicits._
    bids.select(col("bidder"),
        unix_millis(current_timestamp()).as("pTimeMs"))
      .as[BidKeyed]
      .groupByKey(_.bidder)
      .transformWithState(new GapWindowProcessor(sizeMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
