package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import graft.queries.EventsOps
import EventStreams.{OpenSession, Session, UserEvent}

/** Sessionization on Spark 4's `transformWithState` (state-v2) — the
  * modern arbitrary-stateful API: NAMED state variables resolved in
  * `init` (vs one opaque state object), EXPLICIT timers (register/
  * delete, many per key) instead of the single implicit
  * setTimeoutTimestamp slot, and separate input/timer callbacks.
  * Output is identical to [[EventStreams.sessionize]] in both modes —
  * the spec pins tws == gmws == batch q39 row-for-row.
  *
  * Semantics ported 1:1, including the closed-session MARKER (state
  * keeps the idx counter after a timeout close, nEvents == 0) and the
  * optional idle TTL that bounds marker lifetime. The TTL rides an
  * explicit event-time timer, NOT the API's built-in TTLConfig: the
  * built-in TTL is PROCESSING-time based, which on a backlog replay
  * (or any reprocessing) would expire state by wall clock rather than
  * stream time — non-reproducible. Event-time timers replay
  * deterministically.
  *
  * transformWithState requires the RocksDB state store provider —
  * the production backend (state > heap, incremental snapshots); the
  * spec sets it per run.
  *
  * Scale shape: identical to the gmws version — O(1) state per user
  * (one 4-long OpenSession row), per-batch work sorts only the
  * batch's slice, timer count is one per user with live state.
  */
object StateV2 {

  class SessionizeProcessor(boundedBacklog: Boolean, idleTtlUs: Option[Long])
      extends StatefulProcessor[Long, UserEvent, Session] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def close(userId: Long, s: OpenSession): Session =
      Session(userId, s.idx, s.nEvents, s.startUs, s.endUs,
        math.floor((s.endUs - s.startUs).toDouble / 1000000).toLong)

    /** One live timer per key: drop any previously-armed expiry, then
      * arm `expiryMs` (clamped ahead of the watermark — a coarse
      * watermark jump can land past the wanted expiry in the same
      * batch; the clamped timer then fires at the next advance, which
      * is exactly "already past").
      */
    private def rearm(expiryMs: Long, tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(expiryMs, tv.getCurrentWatermarkInMs + 1))
    }

    override def handleInputRows(userId: Long, it: Iterator[UserEvent],
        tv: TimerValues): Iterator[Session] = {
      val evs = it.toArray.sortBy(e => (e.us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      var cur = if (open.exists()) Option(open.get()) else None
      evs.foreach { ev =>
        cur = cur match {
          case Some(s) if s.nEvents == 0L =>
            // closed marker: any event after the timeout is past the
            // gap by the watermark contract — a new session, counter
            // continued
            Some(OpenSession(s.idx + 1, 1L, ev.us, ev.us))
          case Some(s) if ev.us - s.endUs > EventsOps.GapUs =>
            out += close(userId, s)
            Some(OpenSession(s.idx + 1, 1L, ev.us, ev.us))
          case Some(s) =>
            Some(s.copy(nEvents = s.nEvents + 1, endUs = ev.us))
          case None =>
            Some(OpenSession(1L, 1L, ev.us, ev.us))
        }
      }
      if (boundedBacklog) {
        // the whole backlog is one batch: flush the trailing session
        // inline — no timers, no carried state (TimeMode.None)
        cur.foreach(s => out += close(userId, s))
        open.clear()
      } else cur.foreach { s =>
        open.update(s)
        if (s.nEvents > 0L)
          rearm(s.endUs / 1000 + EventsOps.GapUs / 1000, tv)
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        if (s.nEvents == 0L) {
          // the marker's TTL timer fired: the user idled past the
          // horizon — drop the row (only armed when idleTtlUs is set)
          open.clear()
          Iterator.empty
        } else {
          // watermark passed end + gap: close and emit; degrade to a
          // marker, which (with a TTL) arms its own expiry
          open.update(OpenSession(s.idx, 0L, 0L, s.endUs))
          idleTtlUs.foreach(ttl =>
            rearm(s.endUs / 1000 + EventsOps.GapUs / 1000 + ttl / 1000, tv))
          Iterator.single(close(userId, s))
        }
      }
    }
  }

  case class TouchCredit(user_id: Long, purchase_id: Long, channel: String,
    clicks: Long, total_clicks: Long, weight: Double, credit: Double)

  /** Linear multi-touch attribution on MapState: each purchase splits
    * its value across every channel the user clicked STRICTLY BEFORE
    * it (by (ts, event_id) order), proportionally to per-channel
    * click counts — the standard "linear attribution" model beside
    * q143's last-touch. State is a MapState[channel → count]: one
    * integer per (user, channel-seen), i.e. at most |channels| rows
    * per user regardless of click volume — the map-shaped state this
    * API exists for (a gmws port would serialize the whole map into
    * one value blob per update; MapState updates one key).
    *
    * Purchases with no prior attributable click credit 'direct' in
    * full (weight 1.0), mirroring q143's fallback.
    *
    * `idleTtlUs` bounds the open-world key space the same way its
    * siblings do (SessionizeProcessor's marker TTL above,
    * attributeLastTouch's window): an event-time timer re-arms at
    * (user's last event + TTL) on every batch that touches the user;
    * on expiry the whole channel map is cleared. Steady-state is one
    * map per user ACTIVE within the TTL horizon instead of one per
    * user EVER SEEN. The accepted trade is the industry
    * "attribution window": a purchase by a user idle past the TTL
    * sees an empty map and credits 'direct'. Explicit timers, not
    * the built-in TTLConfig — that one is PROCESSING-time based and
    * would expire state by wall clock on a backlog replay.
    */
  class MultiTouchProcessor(idleTtlUs: Option[Long] = None)
      extends StatefulProcessor[Long, EventStreams.AttrEvent, TouchCredit] {

    @transient private var chans: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      chans = getHandle.getMapState("chans",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    /** One live timer per key (the SessionizeProcessor.rearm pattern):
      * drop the previous expiry, arm clamped ahead of the watermark.
      */
    private def rearm(expiryMs: Long, tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(expiryMs, tv.getCurrentWatermarkInMs + 1))
    }

    override def handleInputRows(userId: Long,
        it: Iterator[EventStreams.AttrEvent],
        tv: TimerValues): Iterator[TouchCredit] = {
      val sorted = it.toArray.sortBy(e => (e.us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[TouchCredit]()
      sorted.foreach { e =>
        if (e.event_type == "purchase") {
          val entries = chans.iterator().toArray.sortBy(_._1)
          val total = entries.map(_._2).sum
          if (total > 0L) entries.foreach { case (ch, n) =>
            out += TouchCredit(userId, e.event_id, ch, n, total,
              n.toDouble / total.toDouble, e.value * n / total)
          } else
            out += TouchCredit(userId, e.event_id, "direct", 0L, 0L, 1d, e.value)
        }
        if (e.event_type == "click") e.chan.foreach { c =>
          val n = if (chans.containsKey(c)) chans.getValue(c) else 0L
          chans.updateValue(c, n + 1L)
        }
      }
      idleTtlUs.foreach { ttl =>
        if (chans.exists())
          rearm(sorted.last.us / 1000 + ttl / 1000, tv)
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[TouchCredit] = {
      // idle past the attribution window: drop the whole channel map
      // (only reachable with idleTtlUs set — no timer is ever armed
      // otherwise)
      chans.clear()
      Iterator.empty
    }
  }

  /** Last-touch attribution on state-v2 — the
    * [[EventStreams.attributeLastTouch]] semantics 1:1 on the modern
    * API: ValueState carries the single last-click channel per user;
    * each purchase credits it ('direct' when none). `idleTtlUs` is
    * the attribution window, on an explicit event-time timer exactly
    * like the gmws version's EventTimeTimeout (the built-in TTLConfig
    * is processing-time based — non-reproducible on replay). The spec
    * pins tws == gmws on credits, removals, and final state count.
    *
    * Scale shape: O(1) state per user (one channel string), bounded
    * to the ACTIVE horizon when the TTL is set; per-batch work sorts
    * only the batch's slice.
    */
  class LastTouchProcessor(idleTtlUs: Option[Long] = None)
      extends StatefulProcessor[Long, EventStreams.AttrEvent, EventStreams.Credit] {

    @transient private var last: ValueState[EventStreams.LastTouch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState("last",
        Encoders.product[EventStreams.LastTouch], TTLConfig.NONE)

    private def rearm(expiryMs: Long, tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(expiryMs, tv.getCurrentWatermarkInMs + 1))
    }

    override def handleInputRows(userId: Long,
        it: Iterator[EventStreams.AttrEvent],
        tv: TimerValues): Iterator[EventStreams.Credit] = {
      val sorted = it.toArray.sortBy(e => (e.us, e.event_id))
      var cur = if (last.exists()) Option(last.get().chan) else None
      val out = Vector.newBuilder[EventStreams.Credit]
      sorted.foreach { e =>
        if (e.event_type == "purchase")
          out += EventStreams.Credit(userId, e.event_id,
            cur.getOrElse("direct"), e.value)
        // channel-less clicks ignored — the q142 last(ignoreNulls)
        // contract (see attributeLastTouch's comment)
        if (e.event_type == "click") e.chan.foreach(c => cur = Some(c))
      }
      cur.foreach(c => last.update(EventStreams.LastTouch(c)))
      idleTtlUs.foreach { ttl =>
        if (last.exists()) rearm(sorted.last.us / 1000 + ttl / 1000, tv)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[EventStreams.Credit] = {
      // attribution window closed: drop the carried channel (only
      // reachable with idleTtlUs set)
      last.clear()
      Iterator.empty
    }
  }

  /** [[EventStreams.attributeLastTouch]] on transformWithState; same
    * modes, same output.
    */
  def lastTouch(events: DataFrame,
                idleTtlUs: Option[Long] = None): Dataset[EventStreams.Credit] = {
    import events.sparkSession.implicits._
    val src =
      if (idleTtlUs.isDefined) events.withWatermark("ts", "2 hours") else events
    src
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          concat(lit("ch"),
            pmod(get_json_object(col("props"), "$.k").cast("long"), lit(3))))
          .as("chan"),
        col("ts"))
      .as[EventStreams.AttrEvent]
      .groupByKey(_.user_id)
      .transformWithState(new LastTouchProcessor(idleTtlUs),
        if (idleTtlUs.isDefined) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming linear multi-touch attribution (see
    * [[MultiTouchProcessor]]); correct across micro-batches when
    * batches arrive in per-user event-time order — the same
    * file-replay contract as [[EventStreams.attributeLastTouch]].
    * With `idleTtlUs` the input gains the 2h event-time watermark the
    * timers need (matching the sibling operators' continuous mode).
    */
  def multiTouch(events: DataFrame,
                 idleTtlUs: Option[Long] = None): Dataset[TouchCredit] = {
    import events.sparkSession.implicits._
    val src =
      if (idleTtlUs.isDefined) events.withWatermark("ts", "2 hours") else events
    src
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          concat(lit("ch"),
            pmod(get_json_object(col("props"), "$.k").cast("long"), lit(3))))
          .as("chan"),
        col("ts"))
      .as[EventStreams.AttrEvent]
      .groupByKey(_.user_id)
      .transformWithState(new MultiTouchProcessor(idleTtlUs),
        if (idleTtlUs.isDefined) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
  }

  case class WinItem(win_us: Long, user_id: Long, us: Long, event_id: Long,
    ts: java.sql.Timestamp)
  case class MgSummary(ids: Array[Long], counts: Array[Long])
  case class Trend(win_us: Long, user_id: Long, est: Long)

  /** Streaming heavy hitters — a Misra-Gries summary AS the window's
    * state (sketch-as-state): per hourly window the state is m
    * (id, count) pairs, NEVER the per-user count table, so state per
    * window is a fixed few KB regardless of how many distinct users
    * the window sees — the composition that makes trending detection
    * viable at firehose scale (a plain streaming groupBy(window, user)
    * carries one state row per (window, user) pair).
    *
    * The MG invariant survives merging and batching: any user with
    * more than n/(m+1) of a window's events is guaranteed present in
    * that window's summary, and est <= true <= est + (decrements) <=
    * est + n/(m+1). q168 recounts the emitted candidates exactly
    * against the batch table (the q161 two-phase discipline), so the
    * DECLARED output is exact top-k whenever the true top-k is inside
    * the candidate set — always, at any m >= the guarantee threshold
    * of the heaviest non-candidate.
    *
    * Determinism: the per-batch fold sorts its slice by (us,
    * event_id), and the MG transition (hit +1 / insert below capacity
    * / decrement-all) is independent of map iteration order, so the
    * summary is a pure function of the window's event sequence.
    *
    * Window close mirrors SessionizeProcessor: boundedBacklog folds
    * and emits inline (one-batch replay, TimeMode.None); continuous
    * mode keeps the summary in ValueState and emits on an event-time
    * timer at window end (clamped past the watermark), clearing the
    * state — bounded to windows inside the watermark horizon.
    */
  class TrendingProcessor(m: Int, boundedBacklog: Boolean)
      extends StatefulProcessor[Long, WinItem, Trend] {

    @transient private var mg: ValueState[MgSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mg = getHandle.getValueState("mg",
        Encoders.product[MgSummary], TTLConfig.NONE)

    private def fold(prev: MgSummary, items: Array[WinItem]): MgSummary = {
      val cur = scala.collection.mutable.HashMap.empty[Long, Long]
      prev.ids.indices.foreach(i => cur(prev.ids(i)) = prev.counts(i))
      items.foreach { e =>
        val id = e.user_id
        if (cur.contains(id)) cur(id) += 1L
        else if (cur.size < m) cur(id) = 1L
        else {
          // decrement-all (the new item is absorbed by the shared
          // decrement); drop zeros — order-independent, deterministic
          cur.keys.toArray.foreach { k =>
            val v = cur(k) - 1L
            if (v == 0L) cur.remove(k) else cur(k) = v
          }
        }
      }
      val sorted = cur.toArray.sortBy(_._1)
      MgSummary(sorted.map(_._1), sorted.map(_._2))
    }

    private def emit(winUs: Long, s: MgSummary): Iterator[Trend] =
      s.ids.indices.iterator.map(i => Trend(winUs, s.ids(i), s.counts(i)))

    private def rearm(expiryMs: Long, tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(expiryMs, tv.getCurrentWatermarkInMs + 1))
    }

    override def handleInputRows(winUs: Long, it: Iterator[WinItem],
        tv: TimerValues): Iterator[Trend] = {
      val items = it.toArray.sortBy(e => (e.us, e.event_id))
      val prev = if (mg.exists()) mg.get() else MgSummary(Array.empty, Array.empty)
      val next = fold(prev, items)
      if (boundedBacklog) {
        mg.clear()
        emit(winUs, next)
      } else {
        mg.update(next)
        // fire when the watermark passes the window end
        rearm(winUs / 1000 + 3600L * 1000, tv)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(winUs: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Trend] = {
      val out = if (mg.exists()) emit(winUs, mg.get()) else Iterator.empty
      mg.clear()
      out
    }
  }

  /** Per-hourly-window trending-user candidates via [[TrendingProcessor]];
    * q168 recounts them exactly batch-side.
    */
  def trendingUsers(events: DataFrame, m: Int = TrendingM,
      boundedBacklog: Boolean = true): Dataset[Trend] = {
    import events.sparkSession.implicits._
    val src =
      if (boundedBacklog) events else events.withWatermark("ts", "2 hours")
    src
      .select(expr("unix_micros(ts) DIV 3600000000 * 3600000000").as("win_us"),
        col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("ts"))
      .as[WinItem]
      .groupByKey(_.win_us)
      .transformWithState(new TrendingProcessor(m, boundedBacklog),
        if (boundedBacklog) TimeMode.None() else TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Summary capacity: far above any test window's distinct users (so
    * the declared replay is EXACT — no decrement ever fires at the
    * three SFs) yet a fixed ~8 KB of state per window at any corpus
    * size; production sets it from the guarantee share 1/(m+1).
    */
  final val TrendingM = 512

  case class WinHash(win_us: Long, h: Long, ts: java.sql.Timestamp)
  case class WinDistinct(win_us: Long, s_fp: Long, zero_regs: Long)

  /** Streaming per-window distinct counting — the HLL register array
    * AS the window's state, closing the streaming sketch family (KMV
    * q74, Misra-Gries q168, drift histogram q174, HLL here): per
    * hourly window the ENTIRE state is the 256-byte register array,
    * never a per-user row, so distinct-user tracking costs a constant
    * 256 bytes per live window at ANY stream rate (a plain streaming
    * dropDuplicates/approx variant keys state by user). The register
    * fold is [[graft.functions.HllSketch.updateRegisters]] — the SAME
    * code the batch aggregate runs, so a replayed stream's registers
    * equal the batch sketch bit-for-bit, and register max is
    * commutative + idempotent, so no per-batch sorting is needed: the
    * summary is a pure function of the window's hash SET regardless
    * of batch slicing (StreamingSpec pins 1/8-partition replays).
    *
    * At window close (event-time timer past the watermark, mirroring
    * TrendingProcessor; inline for a one-batch backlog) the processor
    * emits the exact integer S and the zero-register count — the
    * oracle-checkable form (see [[graft.functions.HllSketch]] for why
    * S, not a corrected estimate, is what crosses engines).
    */
  class HllWindowProcessor(boundedBacklog: Boolean)
      extends StatefulProcessor[Long, WinHash, WinDistinct] {

    @transient private var regs: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getValueState("regs", Encoders.BINARY, TTLConfig.NONE)

    private def emit(winUs: Long, buf: Array[Byte]): Iterator[WinDistinct] = {
      val (s, zeros) = graft.functions.HllSketch.summarize(buf)
      Iterator.single(WinDistinct(winUs, s, zeros))
    }

    private def rearm(expiryMs: Long, tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(expiryMs, tv.getCurrentWatermarkInMs + 1))
    }

    override def handleInputRows(winUs: Long, it: Iterator[WinHash],
        tv: TimerValues): Iterator[WinDistinct] = {
      val buf =
        if (regs.exists()) regs.get()
        else new Array[Byte](graft.functions.HllSketch.M)
      it.foreach(e => graft.functions.HllSketch.updateRegisters(buf, e.h))
      if (boundedBacklog) {
        // ACCUMULATE across micro-batches and emit the CUMULATIVE
        // summary each time the window sees rows (TimeMode.None has no
        // timers to defer the emission to). Registers only grow, so S
        // is monotone non-increasing over a window's emissions and the
        // window's COMPLETE sketch is its MINIMUM S row — the
        // split-safe algebra q177 selects with, replacing the former
        // clear-and-emit-partials convention that was only correct
        // when the backlog replayed as ONE batch (StreamingSpec pins a
        // forced multi-batch replay).
        regs.update(buf)
        emit(winUs, buf)
      } else {
        regs.update(buf)
        // fire when the watermark passes the window end
        rearm(winUs / 1000 + 3600L * 1000, tv)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(winUs: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[WinDistinct] = {
      val out = if (regs.exists()) emit(winUs, regs.get()) else Iterator.empty
      regs.clear()
      out
    }
  }

  /** Per-hourly-window distinct-user HLL summaries via
    * [[HllWindowProcessor]]; q177 attaches the raw estimate and the
    * exact batch recount. The hash is computed as a codegen'd column
    * BEFORE the stateful operator (hash60 of the decimal user id —
    * the form the DuckDB oracle mirrors), so the processor only folds
    * longs.
    */
  def windowDistinct(events: DataFrame,
      boundedBacklog: Boolean = true): Dataset[WinDistinct] = {
    import events.sparkSession.implicits._
    val src =
      if (boundedBacklog) events else events.withWatermark("ts", "2 hours")
    src
      .select(expr("unix_micros(ts) DIV 3600000000 * 3600000000").as("win_us"),
        graft.functions.TextFns.hash60(col("user_id").cast("string")).as("h"),
        col("ts"))
      .as[WinHash]
      .groupByKey(_.win_us)
      .transformWithState(new HllWindowProcessor(boundedBacklog),
        if (boundedBacklog) TimeMode.None() else TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** [[EventStreams.sessionize]] on transformWithState; same modes,
    * same output.
    */
  def sessionize(events: DataFrame, boundedBacklog: Boolean = true,
                 idleTtlUs: Option[Long] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val src =
      if (boundedBacklog) events else events.withWatermark("ts", "2 hours")
    src
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionizeProcessor(boundedBacklog, idleTtlUs),
        if (boundedBacklog) TimeMode.None() else TimeMode.EventTime(),
        OutputMode.Append())
  }
}
