package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental OHLC bar maintenance over an event STREAM — the streaming
  * counterpart of the batch `tsr3_ohlc_bars` downsampler
  * ([[graft.queries.TimeSeries.ohlcBars]]): as observations arrive, each
  * (series, day) bar converges to exactly what the batch aggregation over
  * the full history would produce.
  *
  * Every bar component is associative and commutative over the total
  * (ts, event_id) order, so the whole operator is ONE declarative
  * aggregation with no arrival-order or chunking sensitivity:
  *   - open  = `min_by(value, (ts, event_id))` — first observation wins,
  *     regardless of when it ARRIVES;
  *   - close = `max_by(value, (ts, event_id))`;
  *   - high/low = exact `max`/`min` (bit-deterministic extremes);
  *   - turnover rides decimal, so partial sums merge exactly.
  * Late data therefore needs no special handling for correctness; a
  * watermark on the bar day may be added to RETIRE closed bars from state
  * once lateness is bounded (the usual completeness-vs-state trade).
  *
  * Scale shape: state is one small row per OPEN (series, day) bar —
  * bounded by live series × lateness horizon, not by stream length —
  * sharded on the uniform composite key. The same function body serves
  * batch (tsr3 calls it on the full table) and stream: the batch gate and
  * the live feed can never drift apart structurally.
  */
object StreamingOhlc {

  /** OHLC bars over (user_id, day, ts, event_id, value) rows — batch or
    * streaming input. Streaming emit in Update/Complete mode.
    */
  def bars(obs: DataFrame): DataFrame =
    obs
      .groupBy(col("user_id"), col("day"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("turnover"))
}
