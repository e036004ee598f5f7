package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental feed-volume maintenance over an event STREAM — the streaming
  * counterpart of the batch `dq7_volume_anomaly` monitor
  * ([[graft.queries.Quality.volumeAnomaly]]): as events arrive, each
  * (event_type, day) cell's count converges to exactly what the batch
  * aggregation over the full history would produce, and the trailing-week
  * ratio readout ([[graft.queries.Quality.volumeReadout]]) runs unchanged
  * over a snapshot of this state — the alarm a pipeline watches LIVE for
  * a feed that silently halves or doubles, instead of discovering it in
  * the next morning's batch audit.
  *
  * Counts are ADDITIVE — commutative and associative — so this is one
  * declarative streaming aggregation (the StreamingOhlc argument): no
  * arrival-order or chunking sensitivity, late events simply land in
  * their own day's cell, replay converges to the same counts, and counts
  * from independent jobs merge by plain addition (a CRDT counter per
  * cell).
  *
  * Scale shape: state is one small row per live (event_type, day) cell —
  * bounded by event-type cardinality × the lateness horizon, not by
  * stream length; a watermark on `day` retires cells the trailing-week
  * readout can no longer reference. The same function body serves batch
  * (dq7 calls it on the full table) and stream, so the batch gate and the
  * live alarm can never drift apart structurally.
  */
object StreamingVolume {

  /** Per-(event_type, day) event counts over (event_type, ts, ...) rows —
    * batch or streaming input. Streaming emit in Update/Complete mode.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
}
