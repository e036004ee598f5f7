package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Windowing / batching / ordering operators over the `events` table —
  * the engine-native replacements for the reference's count/time windowing
  * machinery (SURVEY §2.7 W1–W7):
  *   - W1 sliding count windows → count batches via row_number (exact
  *     semantics) and sliding TIME windows (the idiomatic streaming form);
  *   - W2 tumbling `chunked` → tumbling time windows;
  *   - T8's absent session analytics → `session_window` (we add it);
  *   - W5/W6 ordering, W7 limits → window-function top-k.
  *
  * All window starts are epoch-aligned (`window()` and DuckDB `time_bucket`
  * agree); sums go through DECIMAL so the oracle hash-compare is exact.
  */
object Windows extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** W2: tumbling 1-hour windows — count + exact sum + distinct users. */
  val tumbling = GQuery(
    "w2_tumbling_hourly",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users")),
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2"""))

  /** W1: sliding windows (1 h width, 30 min slide) — each event lands in two
    * windows; the oracle unions the two candidate starts per row.
    */
  val sliding = GQuery(
    "w1_sliding_1h_30m",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"), col("sum_value")),
    Some("""
      WITH starts AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
      )
      SELECT window_start, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM starts GROUP BY 1"""))

  /** T8 (beyond-reference): 30-minute-gap session windows per user via
    * `session_window`; oracle = classic gaps-and-islands.
    */
  val sessions = GQuery(
    "t8_session_windows",
    (s, dir) => ev(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value")),
    Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
               -- strict > matches Spark session_window (4.1.2, batch AND
               -- streaming, verified empirically): an event exactly gap
               -- after its predecessor MERGES into the open session (the
               -- window extends to ts+gap whenever ts <= prev+gap)
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
      )
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM numbered GROUP BY user_id, session_id"""))

  /** W1 exact count-window semantics (the reference's `windowed(size=100,
    * step=100)`): per-user batches of 100 events in (ts, event_id) order.
    */
  val countBatches = GQuery(
    "w1_count_batches_100",
    (s, dir) => {
      val rn = row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
      ev(s, dir)
        .withColumn("batch_id", ((rn - 1) / 100).cast("long"))
        .groupBy(col("user_id"), col("batch_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"),
          dsum(col("value")).as("sum_value"))
    },
    Some("""
      WITH numbered AS (
        SELECT *, CAST(floor((row_number() OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 100) AS BIGINT)
               AS batch_id
        FROM events
      )
      SELECT user_id, batch_id, COUNT(*) AS n_events,
             MIN(event_id) AS first_event, MAX(event_id) AS last_event,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM numbered GROUP BY user_id, batch_id"""))

  /** T2-style dedup (first event wins, deterministically) — the relational
    * form of the reference's `lastSeen` height dedup.
    */
  val dedupFirst = GQuery(
    "t2_dedup_first_event",
    (s, dir) => ev(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_occurrences")),
    Some("""
      SELECT user_id, event_type,
             MIN(event_id) AS first_event_id,
             COUNT(*) AS n_occurrences
      FROM events GROUP BY 1, 2"""))

  /** W6/W7: ordered top-k per group (top-3 events by value per user). */
  val topK = GQuery(
    "w7_topk_per_user",
    (s, dir) => {
      val rk = row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id")))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("value"), rk.as("rk"))
        .filter(col("rk") <= 3)
    },
    Some("""
      SELECT user_id, event_id, value, rk FROM (
        SELECT user_id, event_id, value,
               row_number() OVER
                 (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        FROM events)
      WHERE rk <= 3"""))

  /** Lag/lead deltas: per-user inter-event gap and value change — the
    * sequential-analytics primitive under sessionization and rate metrics.
    * One shuffle (partition by user), exact integer microsecond gaps.
    */
  val eventDeltas = GQuery(
    "w8_event_deltas",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir).select(
        col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_micros"),
        (col("value") - lag(col("value"), 1).over(w)).as("value_delta"))
    },
    Some("""
      SELECT user_id, event_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_micros,
             value - lag(value) OVER w AS value_delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  /** F15/T11: semi-structured JSON props decoded relationally — `from_json`
    * with an explicit schema (PERMISSIVE: garbage → NULL, the reference's
    * `MessageType.Unknown` channel), then a plain aggregate over the
    * extracted field. Catalyst's `OptimizeJsonExprs` prunes the parse to the
    * single referenced key, so at 100 TB the JSON decode cost is one pruned
    * struct field per row, not a full-document parse.
    */
  val propsJson = GQuery(
    "j1_props_json",
    (s, dir) => ev(s, dir)
      .select(
        col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"),
        col("value"))
      .groupBy(col("event_type"), (col("k") - col("k") % 10).as("k_decade"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        dsum(col("value")).as("sum_value")),
    Some("""
      WITH j AS (
        SELECT event_type,
               -- json_valid guard = Spark's PERMISSIVE garbage->NULL channel
               -- (DuckDB json_extract ERRORS on malformed JSON)
               CAST(json_extract(CASE WHEN json_valid(props) THEN props END,
                                 '$.k') AS BIGINT) AS k,
               value
        FROM events)
      SELECT event_type, k - k % 10 AS k_decade,
             COUNT(*) AS n_events, MIN(k) AS min_k, MAX(k) AS max_k,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM j GROUP BY 1, 2"""))

  /** Running (cumulative) aggregates: per-user prefix count and exact
    * decimal prefix sum in (ts, event_id) order — the running-balance /
    * cumulative-metric window frame. One shuffle on user_id; the frame is
    * computed in a single per-partition pass.
    */
  val runningTotals = GQuery(
    "w10_running_totals",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir).select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("running_n"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_value"))
    },
    Some("""
      SELECT user_id, event_id,
             COUNT(*) OVER w AS running_n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)"""))

  /** Skew-salted aggregation ([[graft.functions.Salt.saltedSumCount]]) on
    * the oracle gate: counts + exact sums by event_type computed through the
    * two-phase (key, salt) → key plan, hash-compared against the plain
    * GROUP BY — proving the hot-key mitigation is value-identical. Sums are
    * decimal (associative), so the extra merge step cannot drift.
    */
  val saltedStats = GQuery(
    "w11_salted_type_stats",
    (s, dir) => graft.functions.Salt
      .saltedSumCount(ev(s, dir), "event_type",
        col("value").cast("decimal(18,2)"), n = 8, saltBy = col("event_id"))
      .select(col("event_type"), col("n"), col("total").cast("double").as("total")),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type"""))

  /** RANGE-framed rolling window: per event, how many events (and their
    * exact sum) the same user produced in the trailing hour — a
    * value-range frame over event time, not a row count (two events at the
    * same instant both see each other). The per-partition pass is a sliding
    * two-pointer over the sorted user timeline — no self-join, no per-row
    * re-scan; one shuffle on user_id.
    */
  val rolling1h = GQuery(
    "w12_rolling_1h",
    (s, dir) => {
      // integer microseconds: RANGE bounds must be exact, and unix_micros
      // is the lossless image of the timestamp
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000 * 1000, 0L)
      ev(s, dir).select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_trailing_1h"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_trailing_1h"))
    },
    Some("""
      SELECT user_id, event_id,
             COUNT(*) OVER w AS n_trailing_1h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS sum_trailing_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""))

  /** The rank-function family beyond row_number: dense_rank (no gaps),
    * percent_rank ((rank−1)/(n−1), identical closed form in both engines),
    * and ntile(4) quartile buckets — per user over event values. One
    * shuffle on user_id; ties broken by event_id where the function is
    * order-sensitive.
    */
  val rankFamily = GQuery(
    "w13_rank_family",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir).select(
        col("user_id"), col("event_id"),
        dense_rank().over(w).cast("long").as("drk"),
        percent_rank().over(w).as("prk"),
        ntile(4).over(w).cast("long").as("quartile"))
    },
    Some("""
      SELECT user_id, event_id,
             dense_rank() OVER w AS drk,
             percent_rank() OVER w AS prk,
             ntile(4) OVER w AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)"""))

  /** Next-event training pairs: for every event, the user's next event type
    * and the gap to it — the (context → label) example extraction step of a
    * next-action prediction pipeline. One shuffle on user_id; the per-user
    * sort is bounded by per-user history, and the gap is exact integer
    * epoch-ms arithmetic (no float time math). Ties on ts break by event_id
    * so the pairing is deterministic under any partitioning.
    */
  val nextEventPairs = GQuery(
    "w14_next_event_pairs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .withColumn("ms", expr("unix_millis(ts)"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap_ms", lead(col("ms"), 1).over(w) - col("ms"))
        .filter(col("next_type").isNotNull)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("ctx_type"), col("next_type"), col("gap_ms"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id, event_type AS ctx_type,
               lead(event_type, 1) OVER w AS next_type,
               lead(epoch_ms(ts), 1) OVER w - epoch_ms(ts) AS gap_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id, ctx_type, next_type, gap_ms
      FROM p WHERE next_type IS NOT NULL"""))

  /** Ordered conversion funnel per session: within each 30-minute-gap
    * session, the first `view`, the first `click` AT OR AFTER that view,
    * and the first `purchase` at or after that click — the strictly-ordered
    * funnel (a click before any view does not count) every product
    * analytics stack computes.
    *
    * Plan shape (r14, guide §2.4): session ids come from the lag/running-sum
    * idiom (row-level ids, which `session_window`'s aggregate-only API
    * cannot give); the three funnel stages are conditional MINs computed as
    * a CHAIN OF WINDOWS over the session key — each stage's cutoff
    * (view_ts, then click_ts) is a per-session constant the next stage
    * reads off its own row, so the whole cascade needs ONE exchange on
    * hash(user_id) (the session windows' ClusteredDistribution is satisfied
    * by the user partitioning) and one final aggregate — the r9–r13 shape
    * re-ran the sessionization three times and re-attached each stage with
    * a (user, sid)-keyed join, i.e. three corpus passes + five shuffles for
    * the same rows. Gap comparison is exact integer epoch-ms (no interval
    * semantics drift).
    */
  val funnel = GQuery(
    "w15_session_funnel",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val base = ev(s, dir)
        // NULL-key parity with the oracle (and with the pre-r14 join-back
        // shape): the oracle's stage joins on user_id, which drops
        // NULL-user sessions, while a window PARTITION BY groups NULLs
        // into one partition and would keep them — filter explicitly so
        // the window rewrite cannot diverge on data that carries NULL ids
        // (the fixtures don't today; this pins the semantics, not a bug).
        .filter(col("user_id").isNotNull)
        .withColumn("ms", expr("unix_millis(ts)"))
        .withColumn("new_session",
          when(lag(col("ms"), 1).over(byUser).isNull ||
            col("ms") - lag(col("ms"), 1).over(byUser) > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySession = Window.partitionBy(col("user_id"), col("sid"))
      val staged = base
        .withColumn("view_ts",
          min(when(col("event_type") === "view", col("ts"))).over(bySession))
        .withColumn("click_ts",
          min(when(col("event_type") === "click" &&
            col("ts") >= col("view_ts"), col("ts"))).over(bySession))
        .withColumn("purchase_ts",
          min(when(col("event_type") === "purchase" &&
            col("ts") >= col("click_ts"), col("ts"))).over(bySession))
      staged.groupBy(col("user_id"), col("sid"))
        .agg(
          min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"),
          first(col("view_ts")).as("view_ts"),
          first(col("click_ts")).as("click_ts"),
          first(col("purchase_ts")).as("purchase_ts"))
        .select(col("user_id"), col("session_start"), col("n_events"),
          col("view_ts").isNotNull.as("reached_view"),
          col("click_ts").isNotNull.as("reached_click"),
          col("purchase_ts").isNotNull.as("reached_purchase"))
    },
    Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT *, SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked),
      v AS (
        SELECT user_id, sid, MIN(ts) AS session_start, COUNT(*) AS n_events,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS view_ts
        FROM numbered GROUP BY 1, 2),
      c AS (
        SELECT n.user_id, n.sid,
               MIN(CASE WHEN n.event_type = 'click' AND n.ts >= v.view_ts
                        THEN n.ts END) AS click_ts
        FROM numbered n JOIN v ON n.user_id = v.user_id AND n.sid = v.sid
        GROUP BY 1, 2),
      p AS (
        SELECT n.user_id, n.sid,
               MIN(CASE WHEN n.event_type = 'purchase' AND n.ts >= c.click_ts
                        THEN n.ts END) AS purchase_ts
        FROM numbered n JOIN c ON n.user_id = c.user_id AND n.sid = c.sid
        GROUP BY 1, 2)
      SELECT v.user_id, v.session_start, v.n_events,
             v.view_ts IS NOT NULL AS reached_view,
             c.click_ts IS NOT NULL AS reached_click,
             p.purchase_ts IS NOT NULL AS reached_purchase
      FROM v
      JOIN c ON v.user_id = c.user_id AND v.sid = c.sid
      JOIN p ON v.user_id = p.user_id AND v.sid = p.sid"""))

  /** Cohort retention: users grouped by the DAY of their first event, and
    * for each (cohort, day-offset) cell, how many of that cohort's users
    * were active — the retention matrix behind every engagement dashboard.
    * Shuffles all land on uniform keys: min(ts) per user (the cohort
    * assignment), a shuffle join back on user_id — deliberately NOT
    * broadcast: firstDay has one row per USER, which grows with the data
    * and would OOM executors at scale (a per-user aggregate is not a
    * dimension table; PlanSpec pins the no-broadcast shape) — then the
    * distinct (cohort, offset, user) aggregate. Offsets are exact integer
    * day arithmetic on date-truncated timestamps.
    */
  val cohortRetention = GQuery(
    "w16_cohort_retention",
    (s, dir) => {
      val firstDay = ev(s, dir).groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
        .join(firstDay.hint("shuffle_hash"), "user_id")
        .select(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).as("day_offset"),
          col("user_id"))
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    },
    Some("""
      WITH f AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id),
      act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
             COUNT(DISTINCT act.user_id) AS n_users
      FROM act JOIN f ON act.user_id = f.user_id
      GROUP BY 1, 2"""))

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next_type | prev_type) estimated from counts — the behavioral-model /
    * anomalous-sequence primitive on top of the w14 pair extraction.
    *
    * Scale shape: one shuffle on user_id for the lag, then a groupBy on the
    * (prev, next) pair — a TYPES²-sized aggregate with map-side partials, so
    * the second exchange moves only the tiny matrix. The row-normalizing
    * window runs over that matrix, not the corpus. `prob` is one division of
    * two exact counts — no float-association drift.
    */
  val markovTransitions = GQuery(
    "w17_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(
          col("user_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          col("event_type").as("next_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prob",
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
    },
    Some("""
      WITH seq AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events),
      m AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
             CAST(n AS DOUBLE) /
               CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
      FROM m"""))

  /** Sequence-anomaly scoring: apply the w17 transition model BACK to the
    * event stream — each user's average transition "surprisal" (tx9-style
    * exact integer inverse-probability micro-units, no floating ln), top-20
    * most anomalous users. The model-apply pattern: a corpus-derived,
    * domain-bounded model (TYPES² rows) broadcast against the corpus that
    * built it.
    *
    * Scale shape: one user_id shuffle for the lag (the pair stream persists
    * so model-build and scoring share it rather than re-running the window);
    * the model aggregate is TYPES²-sized and broadcasts back; per-user
    * scoring is a second uniform-key aggregate; top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  val sequenceAnomaly = GQuery(
    "w18_sequence_anomaly",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, dir)
        .select(
          col("user_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          col("event_type").as("next_type"))
        .filter(col("prev_type").isNotNull)
        .persist()
      val model = pairs.groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot",
          sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      val perUser = pairs.join(broadcast(model), Seq("prev_type", "next_type"))
        .withColumn("inv_p_micro", expr("tot * 1000000L div n"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_steps"),
          sum(col("inv_p_micro")).as("sum_inv_p_micro"))
        .withColumn("avg_inv_p_micro", expr("sum_inv_p_micro div n_steps"))
      perUser
        .orderBy(col("avg_inv_p_micro").desc, col("user_id")).limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("avg_inv_p_micro").desc, col("user_id"))))
    },
    Some("""
      WITH seq AS (
        SELECT user_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events),
      pairs AS (
        SELECT user_id, prev_type, next_type
        FROM seq WHERE prev_type IS NOT NULL),
      m AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM pairs GROUP BY 1, 2),
      model AS (
        SELECT prev_type, next_type, n,
               SUM(n) OVER (PARTITION BY prev_type) AS tot
        FROM m),
      scored AS (
        SELECT user_id, (tot * 1000000) // n AS inv_p_micro
        FROM pairs JOIN model USING (prev_type, next_type)),
      peruser AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
               CAST(SUM(inv_p_micro) AS BIGINT) AS sum_inv_p_micro,
               CAST(CAST(SUM(inv_p_micro) AS BIGINT) // COUNT(*) AS BIGINT)
                 AS avg_inv_p_micro
        FROM scored GROUP BY 1)
      SELECT user_id, n_steps, sum_inv_p_micro, avg_inv_p_micro,
             row_number() OVER (ORDER BY avg_inv_p_micro DESC, user_id) AS rk
      FROM peruser QUALIFY rk <= 20"""))

  /** Time-weighted average value per user (TWAP): each event's value holds
    * until the user's next event, so the mean weights every value by how
    * long it was in force — the monitoring/finance aggregation a plain
    * AVG silently gets wrong on irregular sampling. The last event of a
    * user has no holding interval and contributes nothing.
    *
    * Exactness: values quantize to integer cents through decimal(18,2)
    * (both engines round-to-nearest identically), durations are exact
    * integer epoch-ms deltas from lead(), and the weighted sum runs as
    * decimal(19,0)×decimal(19,0) products (prof7's widening: cents×ms×
    * corpus-length overflows int64 at 100 TB). The published TWAP is an
    * integer milli-cents ratio — no floats anywhere.
    *
    * Scale shape: one hash-shuffle by user for the lead() window, then a
    * map-side-combinable aggregate on the same key — the exchange is
    * reused across both (PlanSpec's w14 pattern). Output is
    * entity-bounded.
    */
  val timeWeightedAvg = GQuery(
    "w19_time_weighted_avg",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      ev(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_millis(ts)").as("ms"),
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
            .as("cents"))
        .withColumn("dur_ms", lead(col("ms"), 1).over(byUser) - col("ms"))
        .filter(col("dur_ms").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_intervals"),
          sum(col("dur_ms")).as("total_dur_ms"),
          sum(dec(col("cents")) * dec(col("dur_ms"))).as("wsum"))
        .select(col("user_id"), col("n_intervals"), col("total_dur_ms"),
          expr("cast(wsum * 1000 div total_dur_ms as bigint)")
            .as("twap_millicents"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                                           ORDER BY epoch_ms(ts), event_id)
                 - epoch_ms(ts) AS dur_ms
        FROM events)
      SELECT user_id, COUNT(*) AS n_intervals,
             CAST(SUM(dur_ms) AS BIGINT) AS total_dur_ms,
             CAST(SUM(CAST(cents AS HUGEINT) * dur_ms) * 1000
                  // CAST(SUM(dur_ms) AS HUGEINT) AS BIGINT)
               AS twap_millicents
      FROM p WHERE dur_ms IS NOT NULL
      GROUP BY 1"""))

  /** w20: pointwise mutual information between event types co-occurring in
    * the same (user, day) session — the association statistic feature
    * engineering and recommender co-visitation pipelines compute over
    * billions of sessions (and the word-association classic in NLP). All
    * counts are exact integers from two aggregations; PMI is a single
    * per-output-row `ln` over an exact integer ratio, so there is no
    * order-dependent float accumulation anywhere.
    *
    * 100 TB shape: session membership distincts on the session key, the
    * pair expansion is a self-join ON the session key (per-session fan-out
    * bounded by TYPES² = 25, never corpus-quadratic), and the marginals +
    * session total join back as broadcasts (TYPES-sized and scalar). One
    * uniform session-key shuffle carries everything.
    */
  val pmiCooccurrence = GQuery(
    "w20_pmi_cooccurrence",
    (s, dir) => {
      val present = ev(s, dir)
        .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"),
          col("event_type"))
        .distinct()
      val marginals = present.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_single"))
      val nSessions = present.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val x = present.select(col("user_id"), col("day"),
        col("event_type").as("type_a"))
      val y = present.select(col("user_id"), col("day"),
        col("event_type").as("type_b"))
      x.join(y, Seq("user_id", "day"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(marginals
          .select(col("event_type").as("type_a"), col("n_single").as("n_a"))),
          "type_a")
        .join(broadcast(marginals
          .select(col("event_type").as("type_b"), col("n_single").as("n_b"))),
          "type_b")
        .crossJoin(broadcast(nSessions))
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
          col("n_b"), col("n_sessions"),
          log(col("n_ab").cast("double") * col("n_sessions").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("pmi"))
    },
    Some("""
      WITH present AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
        FROM events),
      marginals AS (
        SELECT event_type, COUNT(*) AS n_single FROM present GROUP BY 1),
      tot AS (
        SELECT COUNT(*) AS n_sessions
        FROM (SELECT DISTINCT user_id, day FROM present)),
      pairs AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               COUNT(*) AS n_ab
        FROM present x JOIN present y
          ON x.user_id = y.user_id AND x.day = y.day
         AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_ab, a.n_single AS n_a, b.n_single AS n_b,
             n_sessions,
             ln(CAST(n_ab AS DOUBLE) * CAST(n_sessions AS DOUBLE)
                / (CAST(a.n_single AS DOUBLE) * CAST(b.n_single AS DOUBLE)))
               AS pmi
      FROM pairs
      JOIN marginals a ON pairs.type_a = a.event_type
      JOIN marginals b ON pairs.type_b = b.event_type
      CROSS JOIN tot"""))

  /** w21: single change-point detection per series — binary segmentation's
    * first split, the workhorse behind metric-regression alarms: for every
    * candidate split t in a user's (ts, event_id)-ordered value sequence,
    * score the split by the scaled mean shift
    * `|mean(prefix) - mean(suffix)| * sqrt(t*(n-t)/n)` (the CUSUM-equivalent
    * two-sample statistic), and report the argmax split with both means.
    * Unlike the recursive CUSUM filter (S_t = max(0, S_{t-1}+...), which is
    * non-associative and needs stateful iteration), this statistic is pure
    * prefix-sum algebra, so it rides ONE window sort per series.
    *
    * Scale shape: everything partitions by user_id (bounded human-scale
    * series, same argument as tsr*); prefix sums accumulate in
    * decimal(18,6) in the deterministic (ts, event_id) window order, so
    * both the scores and the argmax are bit-stable at any parallelism;
    * per-row score math is double but derived from exact decimals. The
    * argmax is a row_number over the same partition — no second shuffle.
    */
  val changePoint = GQuery(
    "w21_change_point",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val scored = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").cast("decimal(18,6)").as("v"))
        .withColumn("t", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("s_t", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("s_n", sum(col("v")).over(Window.partitionBy(col("user_id"))))
        .filter(col("t") < col("n"))
        .withColumn("mean_before",
          col("s_t").cast("double") / col("t"))
        .withColumn("mean_after",
          (col("s_n") - col("s_t")).cast("double") / (col("n") - col("t")))
        .withColumn("score",
          abs(col("mean_before") - col("mean_after")) *
            sqrt((col("t") * (col("n") - col("t"))).cast("double") /
              col("n").cast("double")))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("score").desc, col("ts"), col("event_id"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("n").cast("long").as("n_events"),
          col("ts").as("split_ts"), col("t").cast("long").as("split_pos"),
          col("mean_before"), col("mean_after"), col("score"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
               row_number() OVER w AS t,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) OVER (
                 w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
               SUM(CAST(value AS DECIMAL(18,6))) OVER (
                 PARTITION BY user_id) AS s_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      scored AS (
        SELECT user_id, ts, event_id, t, n,
               CAST(s_t AS DOUBLE) / t AS mean_before,
               CAST(s_n - s_t AS DOUBLE) / (n - t) AS mean_after,
               abs(CAST(s_t AS DOUBLE) / t - CAST(s_n - s_t AS DOUBLE) / (n - t))
                 * sqrt(CAST(t * (n - t) AS DOUBLE) / CAST(n AS DOUBLE)) AS score
        FROM seq WHERE t < n)
      SELECT user_id, CAST(n AS BIGINT) AS n_events, ts AS split_ts,
             CAST(t AS BIGINT) AS split_pos, mean_before, mean_after, score
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY score DESC, ts, event_id) AS rk
        FROM scored)
      WHERE rk = 1"""))

  /** w23: conversion-latency distribution — how long from a user's FIRST
    * view to their first purchase at-or-after it, summarized as exact
    * quartiles + p90 in whole seconds: the time-to-convert readout that
    * sits next to w15's conversion-rate funnel on every growth dashboard.
    *
    * Scale shape: the first-view anchor is a window over the user
    * partition and the per-user reduction a groupBy on the SAME key, so
    * Catalyst reuses one exchange for both (no second shuffle); the
    * summary is a single aggregate over the per-user relation. Delays are
    * exact integer seconds (micros subtraction, integral division);
    * `percentile` interpolation matches the oracle per the prof4
    * precedent. At 100 TB the drop-in is `approx_percentile` — or the
    * sk8 log-bucket sketch when the dashboard needs mergeable state.
    */
  val conversionLatency = GQuery(
    "w23_conversion_latency",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      val withFv = ev(s, dir)
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ts"))).over(w))
      val users = withFv
        .groupBy(col("user_id"))
        .agg(
          max(col("fv")).as("fv"),
          min(when(col("event_type") === "purchase" && col("ts") >= col("fv"),
            col("ts"))).as("fp"))
        .withColumn("delay_s",
          expr("(unix_micros(fp) - unix_micros(fv)) div 1000000"))
      users.agg(
          sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("n_with_view"),
          sum(when(col("fp").isNotNull, 1L).otherwise(0L)).as("n_converted"),
          expr("percentile(delay_s, array(0.25, 0.5, 0.75, 0.9))").as("qs"))
        .select(col("n_with_view"), col("n_converted"),
          element_at(col("qs"), 1).as("d25"),
          element_at(col("qs"), 2).as("d50"),
          element_at(col("qs"), 3).as("d75"),
          element_at(col("qs"), 4).as("d90"))
    },
    Some("""
      WITH fv AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv
        FROM events GROUP BY 1),
      fp AS (
        SELECT e.user_id, MIN(e.ts) AS fp
        FROM events e JOIN fv USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= fv.fv
        GROUP BY 1),
      users AS (
        SELECT fv.user_id,
               CAST((epoch_us(fp.fp) - epoch_us(fv.fv)) // 1000000 AS BIGINT)
                 AS delay_s,
               fv.fv, fp.fp
        FROM fv LEFT JOIN fp USING (user_id))
      SELECT CAST(SUM(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_view,
             CAST(SUM(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
             quantile_cont(delay_s, 0.25) AS d25,
             quantile_cont(delay_s, 0.5) AS d50,
             quantile_cont(delay_s, 0.75) AS d75,
             quantile_cont(delay_s, 0.9) AS d90
      FROM users"""))

  /** w22: rolling active-user stickiness — per day, the distinct actives
    * that day (DAU), the distinct actives over the trailing 7 days (WAU),
    * and their ratio, the standard product-engagement curve. The
    * interesting part is DISTINCT over a SLIDING window, which SQL window
    * frames cannot express (no count(distinct) over RANGE): the exact
    * scale shape is to collapse to (user, day) first — the corpus shrinks
    * to its activity grid — then explode each activity day into the ≤7
    * window days it contributes to (bounded ×7, map-side) and count
    * distinct per window day. One uniform (day, user) shuffle; no self-join
    * over the day range, no per-day rescan; days without activity join out.
    */
  val activeStickiness = GQuery(
    "w22_active_stickiness",
    (s, dir) => {
      val ud = ev(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
      wexp AS (
        SELECT user_id, day, unnest(range(0, 7)) AS i FROM ud),
      wau AS (
        SELECT day + CAST(i AS INTEGER) AS day,
               COUNT(DISTINCT user_id) AS wau
        FROM wexp GROUP BY 1)
      SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau,
             CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      FROM dau JOIN wau USING (day)"""))

  /** w24: inter-event gap profile — the distribution every sessionizer's
    * threshold should be READ FROM instead of guessed: per-user
    * consecutive-event gaps in exact integer seconds, reduced to the
    * quartile/p90/p99 profile plus the fraction of gaps beyond the classic
    * 30-minute cut (t8's session gap lives exactly at that knee). One
    * user-keyed window for the lag, one global aggregate over integer
    * gaps — the percentile interpolation is exact rational arithmetic on
    * integers (the w23 argument), identical in both engines.
    */
  val gapProfile = GQuery(
    "w24_gap_profile",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(expr(
          "(unix_micros(ts) - unix_micros(prev)) div 1000000").as("gap_s"))
      gaps.agg(
          count(lit(1)).as("n_gaps"),
          expr("percentile(gap_s, array(0.5, 0.9, 0.99))").as("qs"),
          max(col("gap_s")).as("max_gap_s"),
          sum(when(col("gap_s") > 1800, 1L).otherwise(0L)).as("n_over_30m"))
        .select(col("n_gaps"),
          element_at(col("qs"), 1).as("p50_s"),
          element_at(col("qs"), 2).as("p90_s"),
          element_at(col("qs"), 3).as("p99_s"),
          col("max_gap_s"),
          expr("n_over_30m * 1000000L div n_gaps").as("over_30m_ppm"))
    },
    Some("""
      WITH gaps AS (
        SELECT CAST((epoch_us(ts) - epoch_us(prev)) // 1000000 AS BIGINT)
                 AS gap_s
        FROM (SELECT ts, lag(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
              FROM events)
        WHERE prev IS NOT NULL)
      SELECT COUNT(*) AS n_gaps,
             quantile_cont(gap_s, 0.5) AS p50_s,
             quantile_cont(gap_s, 0.9) AS p90_s,
             quantile_cont(gap_s, 0.99) AS p99_s,
             MAX(gap_s) AS max_gap_s,
             CAST(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) * 1000000
                  // COUNT(*) AS BIGINT) AS over_30m_ppm
      FROM gaps"""))

  override def queries: Seq[GQuery] =
    Seq(tumbling, sliding, sessions, countBatches, dedupFirst, topK,
      eventDeltas, propsJson, runningTotals, saltedStats, rolling1h,
      rankFamily, nextEventPairs, funnel, cohortRetention, markovTransitions,
      sequenceAnomaly, timeWeightedAvg, pmiCooccurrence, changePoint,
      conversionLatency, activeStickiness, gapProfile)
}
