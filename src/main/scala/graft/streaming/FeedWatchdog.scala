package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A stalled-feed alert: `source` has emitted nothing since `last_seen`
  * and the silence has exceeded the watchdog threshold.
  */
case class FeedStall(source: String, last_seen: Timestamp, silence_ms: Long)

/** Missed-heartbeat watchdog on Spark 4's `transformWithState` — the
  * operational alarm dq6 (batch freshness) and StreamingVolume (daily
  * volume) can't raise PROMPTLY: "source X has gone quiet", detected the
  * moment event time provably passes the allowed silence, not at the next
  * batch audit. This is the one streaming semantic in the pack that needs
  * per-key TIMERS — an alert must fire on the ABSENCE of input, so no
  * input-driven operator (`flatMapGroupsWithState` over arriving rows,
  * windows, watermark dedup) can express it without piggybacking on other
  * keys' traffic; the modern stateful API owns exactly this.
  *
  * Mechanics: one ValueState[Long] per source holds the latest event
  * time; every arrival re-arms a single EVENT-TIME timer at
  * `latest + silenceMillis` (old timers deleted — at most one live timer
  * per key). When the watermark passes an armed timer with no newer
  * arrival, `handleExpiredTimer` emits the stall row. Event-time timers
  * make the alarm REPLAY-DETERMINISTIC: reprocessing the same log yields
  * the same alerts at the same event-time points, which a
  * processing-time watchdog can never guarantee.
  *
  * Scale: state is one long + one timer per source (bounded by the
  * source vocabulary, not traffic); RocksDB-backed like all
  * transformWithState operators, partitioned by the grouping key.
  */
class FeedWatchdog(silenceMillis: Long)
  extends StatefulProcessor[String, (String, Timestamp), FeedStall] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long](
      "lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String,
                               rows: Iterator[(String, Timestamp)],
                               timers: TimerValues): Iterator[FeedStall] = {
    val maxTs = rows.map(_._2.getTime).max
    val latest =
      if (lastSeen.exists()) math.max(lastSeen.get(), maxTs) else maxTs
    lastSeen.update(latest)
    // re-arm: exactly one live timer per source, at the new deadline
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(latest + silenceMillis)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[FeedStall] = {
    // A timer for a key implies its state exists (handleInputRows always
    // writes lastSeen before registering). Guard anyway: if a future
    // clear()/TTL change breaks that invariant, `get()` on empty state would
    // return a default and emit a garbage epoch-0 stall alert — emitting
    // nothing keeps the break loud in tests (missing alert) instead of
    // corrupting the output.
    if (!lastSeen.exists()) Iterator.empty
    else {
      val last = lastSeen.get()
      Iterator.single(
        FeedStall(key, new Timestamp(last), expired.getExpiryTimeInMs - last))
    }
  }
}
