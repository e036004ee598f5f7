package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators over the irregular `events` stream —
  * the resample/align layer every metrics store and feature pipeline needs
  * before per-entity series can be compared, joined, or fed to a model:
  * observation timestamps are arbitrary, training frames want fixed steps.
  *
  * Scale shapes (the same argument for every query here):
  *   - Everything partitions by `user_id` (the series key) and each series is
  *     human-activity-sized — thousands of rows, not billions — so per-series
  *     windows never spill regardless of total corpus size. The only wide
  *     shuffles key on (user_id) or (user_id, day), both uniform.
  *   - The grid is generated, not stored: `sequence()` over a literal range
  *     explodes to (users × steps) rows. The users side is the data; the
  *     steps side is a constant handful of rows that rides broadcast — never
  *     a CartesianProduct over two data relations.
  *   - Gap-filling (LOCF) and interpolation are expressed as
  *     ignore-nulls window `last`/`first` over the union of observations and
  *     grid points — one sort per series, no self-join, no per-gap probing.
  *     This is the plan a purpose-built timeseries DB (e.g. the
  *     `time_bucket_gapfill`/LOCF family) runs internally, declared in
  *     DataFrame algebra so Catalyst owns the physical plan.
  *   - Nothing sums doubles in a data-dependent order: OHLC extremes are
  *     min/max (exact), turnover goes through decimal, interpolation is a
  *     fixed per-row expression.
  *
  * The grid bounds are pinned to the generator's [2024-01-01, 2024-01-30]
  * window (TESTDATA.md) so results are deterministic across scale factors.
  */
object TimeSeries extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val D0 = "2024-01-01"
  private val D1 = "2024-01-30"

  /** Distinct series keys × generated grid timestamps (broadcast explode). */
  private def grid(s: SparkSession, dir: String, step: String, end: String)
      : DataFrame = {
    val steps = s.range(1).select(explode(sequence(
      to_timestamp(lit(s"$D0 00:00:00")),
      to_timestamp(lit(end)),
      expr(s"interval $step"))).as("gts"))
    ev(s, dir).select(col("user_id")).distinct()
      .crossJoin(broadcast(steps))
  }

  /** tsr1: daily close carried forward (LOCF) on a fixed 30-day grid — the
    * resample primitive. Per (user, day) the close is the last event by
    * (ts, event_id); grid days with no activity inherit the previous close
    * via an ignore-nulls running `last`. Days before a user's first event
    * stay null (LOCF has nothing to carry).
    */
  val dailyFfill = GQuery(
    "tsr1_daily_ffill",
    (s, dir) => {
      val closes = ev(s, dir)
        .withColumn("day", date_trunc("DAY", col("ts")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"), col("day"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("day"), col("value").as("close"))
      grid(s, dir, "1 day", s"$D1 00:00:00")
        .withColumnRenamed("gts", "day")
        .join(closes, Seq("user_id", "day"), "left")
        .withColumn("value", last(col("close"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("day"), col("value"))
    },
    Some(s"""
      WITH days AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '$D0 00:00:00',
                    TIMESTAMP '$D1 00:00:00', INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
      ranked AS (
        SELECT user_id, date_trunc('day', ts) AS day, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events),
      closes AS (SELECT user_id, day, value AS close FROM ranked WHERE rk = 1),
      g AS (SELECT user_id, day
            FROM (SELECT DISTINCT user_id FROM events) CROSS JOIN days)
      SELECT g.user_id, g.day,
             last_value(c.close IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      FROM g LEFT JOIN closes c ON g.user_id = c.user_id AND g.day = c.day"""))

  /** tsr2: linear interpolation onto a 6-hour grid. Observations and grid
    * points union into one per-user ordered stream (observations sort before
    * a grid point at the same instant); the bracketing observations come from
    * ignore-nulls `last` over the preceding rows and `first` over the
    * following rows — one window sort, no join against shifted copies. Grid
    * points outside a user's observed range (no bracket) are dropped, the
    * standard interpolation contract.
    */
  val gridInterp = GQuery(
    "tsr2_grid_interp",
    (s, dir) => {
      val obs = ev(s, dir).select(
        col("user_id"), col("ts"), col("value"),
        col("event_id"), lit(0).as("kind"))
      val g = grid(s, dir, "6 hours", s"$D1 18:00:00").select(
        col("user_id"), col("gts").as("ts"),
        lit(null).cast("double").as("value"),
        lit(null).cast("long").as("event_id"), lit(1).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
      val obsT = when(col("kind") === 0, unix_micros(col("ts")))
      val obsV = when(col("kind") === 0, col("value"))
      val interp = obs.unionByName(g)
        .withColumn("tp", last(obsT, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("vp", last(obsV, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tn", first(obsT, ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("vn", first(obsV, ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("kind") === 1 && col("tp").isNotNull && col("tn").isNotNull)
      interp.select(
        col("user_id"), col("ts"),
        when(col("tn") === col("tp"), col("vp")).otherwise(
          col("vp") + (col("vn") - col("vp")) *
            (unix_micros(col("ts")) - col("tp")).cast("double") /
            (col("tn") - col("tp")).cast("double")).as("value"))
    },
    Some(s"""
      WITH g0 AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '$D0 00:00:00',
                    TIMESTAMP '$D1 18:00:00', INTERVAL 6 HOUR)) AS TIMESTAMP) AS ts),
      rows_u AS (
        SELECT user_id, ts, value, event_id, 0 AS kind FROM events
        UNION ALL
        SELECT u.user_id, g0.ts, NULL, NULL, 1
        FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN g0),
      br AS (
        SELECT user_id, ts, kind,
               last_value(CASE WHEN kind = 0 THEN epoch_us(ts) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
               first_value(CASE WHEN kind = 0 THEN epoch_us(ts) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn,
               first_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn
        FROM rows_u)
      SELECT user_id, ts,
             CASE WHEN tn = tp THEN vp
                  ELSE vp + (vn - vp) * CAST(epoch_us(ts) - tp AS DOUBLE)
                                      / CAST(tn - tp AS DOUBLE) END AS value
      FROM br
      WHERE kind = 1 AND tp IS NOT NULL AND tn IS NOT NULL"""))

  /** tsr3: OHLC downsampling — per (user, day) candlestick: first/last by
    * (ts, event_id), exact min/max, count, decimal turnover. The financial
    * bar-building primitive. The aggregation body is STRUCTURALLY SHARED
    * with [[graft.streaming.StreamingOhlc]] (every component associative
    * over the (ts, event_id) total order), so this is one partial-aggregable
    * shuffle on the composite day key — `min_by`/`max_by` elect open/close
    * inside the aggregate, with no window sort at all; the oracle proves the
    * election equivalent to the row_number formulation.
    */
  val ohlcBars = GQuery(
    "tsr3_ohlc_bars",
    (s, dir) => graft.streaming.StreamingOhlc.bars(
      ev(s, dir).withColumn("day", date_trunc("DAY", col("ts")))),
    Some("""
      WITH r AS (
        SELECT user_id, date_trunc('day', ts) AS day, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts, event_id) AS rk_open,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rk_close
        FROM events)
      SELECT user_id, day,
             MAX(CASE WHEN rk_open = 1 THEN value END) AS open,
             MAX(value) AS high,
             MIN(value) AS low,
             MAX(CASE WHEN rk_close = 1 THEN value END) AS close,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS turnover
      FROM r GROUP BY user_id, day"""))

  /** tsr4: Donchian-channel breakout detection — flag events whose value
    * escapes the [min, max] envelope of the previous 20 observations of the
    * same series. Trailing extremes are exact min/max (bit-deterministic,
    * unlike rolling mean/stddev whose float accumulation order differs
    * between engines), the full-window gate (`cnt = 20`) suppresses warm-up
    * noise. One window sort per series, output rows ∝ anomalies.
    */
  val channelBreakout = GQuery(
    "tsr4_channel_breakout",
    (s, dir) => {
      val trail = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
      ev(s, dir)
        .withColumn("hi", max(col("value")).over(trail))
        .withColumn("lo", min(col("value")).over(trail))
        .withColumn("cnt", count(lit(1)).over(trail))
        .filter(col("cnt") === 20 &&
          (col("value") > col("hi") || col("value") < col("lo")))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          when(col("value") > col("hi"), lit("up")).otherwise(lit("down"))
            .as("direction"))
    },
    Some("""
      WITH w AS (
        SELECT event_id, user_id, ts, value,
               MAX(value) OVER t AS hi, MIN(value) OVER t AS lo,
               COUNT(*) OVER t AS cnt
        FROM events
        WINDOW t AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, ts, value,
             CASE WHEN value > hi THEN 'up' ELSE 'down' END AS direction
      FROM w WHERE cnt = 20 AND (value > hi OR value < lo)"""))

  /** tsr5: seasonal-naive forecast backtest — the baseline every forecasting
    * system must beat before anything fancier ships: predict each day's
    * per-user activity total with the value from 7 days earlier (weekly
    * seasonality), then score the prediction over the rest of the window
    * with MAE and sMAPE. The output is the per-user error report a model
    * registry stores as the champion-challenger floor.
    *
    * Scale shape: daily totals are one partial-aggregable shuffle on
    * (user_id, day); the dense grid comes from the broadcast `sequence`
    * explode (missing days are real zeros — absence of activity IS the
    * observation here); lag(7) and the scoring ride one window sort per
    * series. Error math discipline: totals and absolute errors accumulate
    * in decimal (exact, associative); sMAPE's per-day ratio is computed in
    * double but immediately quantized to decimal(18,12) so the per-user
    * mean is an exact sum too — no order-dependent float accumulation
    * anywhere.
    */
  val seasonalBacktest = GQuery(
    "tsr5_seasonal_backtest",
    (s, dir) => {
      val daily = ev(s, dir)
        .withColumn("day", date_trunc("DAY", col("ts")))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v0"))
      val series = grid(s, dir, "1 day", s"$D1 00:00:00")
        .withColumnRenamed("gts", "day")
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("v", coalesce(col("v0"), lit(0).cast("decimal(38,6)")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val scored = series
        .withColumn("f", lag(col("v"), 7).over(w))
        .filter(col("f").isNotNull)
        .withColumn("abs_err", abs(col("v") - col("f")))
        .withColumn("smape_t",
          when(abs(col("v")) + abs(col("f")) === 0, lit(0.0))
            .otherwise(lit(2.0) * col("abs_err").cast("double") /
              (abs(col("v")) + abs(col("f"))).cast("double"))
            .cast("decimal(18,12)"))
      scored.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_scored"),
          (sum(col("abs_err")).cast("double") / count(lit(1))).as("mae"),
          (sum(col("smape_t")).cast("double") / count(lit(1))).as("smape"))
    },
    Some(s"""
      WITH days AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '$D0 00:00:00',
                    TIMESTAMP '$D1 00:00:00', INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
      daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS v0
        FROM events GROUP BY 1, 2),
      series AS (
        SELECT g.user_id, g.day, COALESCE(d.v0, 0) AS v
        FROM (SELECT user_id, day
              FROM (SELECT DISTINCT user_id FROM events) CROSS JOIN days) g
        LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day),
      fc AS (
        SELECT user_id, day, v,
               lag(v, 7) OVER (PARTITION BY user_id ORDER BY day) AS f
        FROM series),
      scored AS (
        SELECT user_id, abs(v - f) AS abs_err,
               CAST(CASE WHEN abs(v) + abs(f) = 0 THEN 0.0
                         ELSE 2.0 * CAST(abs(v - f) AS DOUBLE)
                              / CAST(abs(v) + abs(f) AS DOUBLE) END
                    AS DECIMAL(18,12)) AS smape_t
        FROM fc WHERE f IS NOT NULL)
      SELECT user_id, COUNT(*) AS n_scored,
             CAST(SUM(abs_err) AS DOUBLE) / COUNT(*) AS mae,
             CAST(SUM(smape_t) AS DOUBLE) / COUNT(*) AS smape
      FROM scored GROUP BY 1"""))

  /** tsr6: autocorrelation profile — the periodicity detector that tells a
    * forecaster (tsr5 assumed its 7-day season; this MEASURES seasonality)
    * which lags matter: Pearson ACF of each event type's hourly count
    * series at lags {1, 2, 3, 6, 12, 24}, zero-filled on the fixed hour
    * grid so gaps read as true zeros rather than silently shortening lags.
    *
    * Scale shape (the cdc3 grid argument): the series is DATE-RANGE-
    * bounded, not data-bounded — the corpus collapses to ≤ types × 697
    * hourly counts in one map-side-combined aggregate and every
    * subsequent step walks grid rows. All six lag columns come off ONE
    * per-type window sort (six `lag()` exprs over the same window); the
    * normal-equation sums are exact integer counts and products, and the
    * correlation algebra mirrors g6's double expression tree, so the one
    * float per row is bit-equal across engines.
    */
  val autocorrelation = GQuery(
    "tsr6_autocorrelation",
    (s, dir) => {
      val lags = Seq(1, 2, 3, 6, 12, 24)
      val hours = s.range(1).select(explode(sequence(
        to_timestamp(lit(s"$D0 00:00:00")),
        to_timestamp(lit(s"$D1 00:00:00")),
        expr("interval 1 hour"))).as("gts"))
      val types = ev(s, dir).select(col("event_type")).distinct()
      val counts = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("gts"))
        .agg(count(lit(1)).as("cnt"))
      val full = types.crossJoin(broadcast(hours))
        .join(counts, Seq("event_type", "gts"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val w = Window.partitionBy(col("event_type")).orderBy(col("gts"))
      // lag columns materialize in their own projection first — a window
      // function inside explode()'s argument is an unsupported Generate
      // expression; as plain columns all six still share one w sort
      val lagged = lags.foldLeft(full)((df, l) =>
        df.withColumn(s"x$l", lag(col("cnt"), l).over(w)))
      val pairs = lagged
        .withColumn("p", explode(array(lags.map(l =>
          struct(lit(l).as("lag"), col(s"x$l").as("x"))): _*)))
        .filter(col("p.x").isNotNull)
        .select(col("event_type"), col("p.lag").as("lag"),
          col("p.x").as("x"), col("cnt").as("y"))
      val sums = pairs.groupBy(col("event_type"), col("lag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
      val varX = col("n") * col("sxx") - col("sx") * col("sx")
      val varY = col("n") * col("syy") - col("sy") * col("sy")
      sums.select(col("event_type"), col("lag"),
        col("n").cast("long").as("n_pairs"),
        when(varX > 0 && varY > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(varX) * sqrt(varY)))
          .otherwise(lit(0.0)).as("acf"))
    },
    Some(s"""
      WITH types AS (SELECT DISTINCT event_type FROM events),
      g AS (SELECT unnest(generate_series(
              TIMESTAMP '$D0 00:00:00', TIMESTAMP '$D1 00:00:00',
              INTERVAL 1 HOUR)) AS gts),
      c AS (SELECT event_type, date_trunc('hour', ts) AS gts,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2),
      onGrid AS (
        SELECT t.event_type, g.gts, COALESCE(c.cnt, 0) AS cnt
        FROM types t CROSS JOIN g
        LEFT JOIN c ON c.event_type = t.event_type AND c.gts = g.gts),
      lagtab AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag),
      pairs AS (
        SELECT b.event_type, l.lag, a.cnt AS x, b.cnt AS y
        FROM onGrid a
        CROSS JOIN lagtab l
        JOIN onGrid b ON b.event_type = a.event_type
                     AND b.gts = a.gts + l.lag * INTERVAL 1 HOUR),
      sums AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM pairs GROUP BY 1, 2)
      SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN (n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                  ELSE 0.0 END AS acf
      FROM sums"""))

  override def queries: Seq[GQuery] =
    Seq(dailyFfill, gridInterp, ohlcBars, channelBreakout, seasonalBacktest,
      autocorrelation)
}
