package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization — applying an ordered changelog to
  * produce (a) the current snapshot and (b) the full slowly-changing-
  * dimension history. This is the lakehouse MERGE/SCD surface a training
  * pipeline needs the moment its corpus is fed by upstream mutations rather
  * than append-only files (the reference's world is append-only blocks;
  * CDC is the natural extension once sources can update or retract).
  *
  * The events table plays the changelog: each row is a change record for
  * entity `user_id`, ordered by the total order (ts, event_id) — event_id
  * uniqueness makes every window below deterministic — with
  * `event_type = 'error'` standing in for a retraction (DELETE) and every
  * other type an UPSERT carrying the row's payload.
  *
  * Scale shape: both operators are one hash-shuffle by entity key followed
  * by per-key windows — the changelog never self-joins and nothing is
  * driver-side. This is exactly how Delta/Iceberg-style MERGE dedup works
  * (latest-wins by a version column within the key partition), and the
  * SCD2 build is the lead()-over-key idiom that turns a log into validity
  * intervals in a single pass. Snapshot output is entity-bounded; history
  * output is changelog-bounded. Timestamps flow as exact integer epoch-ms.
  */
object Cdc extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val byKey = Window.partitionBy(col("user_id"))
    .orderBy(col("ts").desc, col("event_id").desc)

  /** Latest-wins snapshot: the newest change per entity wins; entities
    * whose newest change is a DELETE leave the snapshot entirely. Also
    * carries per-entity changelog lineage (change count, first-seen ms) —
    * the audit columns a MERGE materialization job emits for free.
    */
  val latestSnapshot = GQuery(
    "cdc1_latest_snapshot",
    (s, dir) => {
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          col("value"), col("props"))
        .withColumn("rk", row_number().over(byKey))
        .withColumn("n_changes", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .withColumn("first_ms", min(expr("unix_millis(ts)")).over(
          Window.partitionBy(col("user_id"))))
        .filter(col("rk") === 1 && col("op") === "upsert")
        .select(col("user_id"),
          expr("unix_millis(ts)").as("as_of_ms"),
          col("value").as("current_value"),
          col("props").as("current_props"),
          col("n_changes"), col("first_ms"))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op,
               value, props
        FROM events),
      ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes,
               MIN(epoch_ms(ts)) OVER (PARTITION BY user_id) AS first_ms
        FROM log)
      SELECT user_id, epoch_ms(ts) AS as_of_ms, value AS current_value,
             props AS current_props, n_changes, first_ms
      FROM ranked WHERE rk = 1 AND op = 'upsert'"""))

  /** SCD type-2 history: every UPSERT opens a version valid from its own
    * timestamp until the next change of the same entity (upsert OR delete
    * — the next change closes the version either way); the last version is
    * open-ended (valid_to NULL) unless a delete closed it. version_no
    * numbers the upserts per entity in change order.
    */
  val scd2History = GQuery(
    "cdc2_scd2_history",
    (s, dir) => {
      val byKeyAsc = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_millis(ts)").as("ms"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          col("value"))
        .withColumn("next_ms", lead(col("ms"), 1).over(byKeyAsc))
        .filter(col("op") === "upsert")
        .withColumn("version_no", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ms"), col("event_id"))))
        .select(col("user_id"), col("version_no"),
          col("event_id").as("change_id"),
          col("ms").as("valid_from_ms"),
          col("next_ms").as("valid_to_ms"),
          (col("next_ms").isNull).as("is_current"),
          col("value"))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op,
               value
        FROM events),
      nexts AS (
        SELECT *,
               lead(ms, 1) OVER (PARTITION BY user_id
                                 ORDER BY ms, event_id) AS next_ms
        FROM log),
      ups AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ms, event_id) AS version_no
        FROM nexts WHERE op = 'upsert')
      SELECT user_id, version_no, event_id AS change_id,
             ms AS valid_from_ms, next_ms AS valid_to_ms,
             next_ms IS NULL AS is_current, value
      FROM ups"""))

  /** Version-concurrency profile: how many SCD2 versions were live over
    * time, on an hourly grid — the temporal-density view of the history
    * ("are we accumulating open versions?" is the standard CDC health
    * check). A version opens at its valid_from and closes at its valid_to
    * (open-ended versions never close).
    *
    * Scale shape — the sweep-line is done on a BOUNDED grid: opens/closes
    * aggregate per hour bucket first (uniform keys, map-side combine), and
    * only then does the running sum walk the hour rows — a window over the
    * time-grid cardinality (constant in data size), not over the
    * changelog. The naive sweep (global running sum ordered by raw change
    * timestamps) would be a single-partition sort over the whole log.
    */
  val concurrencyProfile = GQuery(
    "cdc3_concurrency_profile",
    (s, dir) => {
      val byKeyAsc = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val iv = ev(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_millis(ts)").as("ms"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"))
        .withColumn("next_ms", lead(col("ms"), 1).over(byKeyAsc))
        .filter(col("op") === "upsert")
      val deltas = iv
        .select(expr("ms div 3600000").as("hour"), lit(1L).as("d_open"),
          lit(0L).as("d_close"))
        .union(iv.filter(col("next_ms").isNotNull)
          .select(expr("next_ms div 3600000").as("hour"), lit(0L).as("d_open"),
            lit(1L).as("d_close")))
      deltas.groupBy(col("hour"))
        .agg(sum(col("d_open")).as("n_opened"),
          sum(col("d_close")).as("n_closed"))
        .withColumn("n_active_eoh",
          sum(col("n_opened") - col("n_closed")).over(
            Window.orderBy(col("hour"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op
        FROM events),
      iv AS (
        SELECT *,
               lead(ms, 1) OVER (PARTITION BY user_id
                                 ORDER BY ms, event_id) AS next_ms
        FROM log QUALIFY op = 'upsert'),
      deltas AS (
        SELECT ms // 3600000 AS hour, CAST(1 AS BIGINT) AS d_open,
               CAST(0 AS BIGINT) AS d_close
        FROM iv
        UNION ALL
        SELECT next_ms // 3600000, 0, 1 FROM iv WHERE next_ms IS NOT NULL),
      hourly AS (
        SELECT hour, CAST(SUM(d_open) AS BIGINT) AS n_opened,
               CAST(SUM(d_close) AS BIGINT) AS n_closed
        FROM deltas GROUP BY 1)
      SELECT hour, n_opened, n_closed,
             CAST(SUM(n_opened - n_closed) OVER (ORDER BY hour) AS BIGINT)
               AS n_active_eoh
      FROM hourly"""))

  /** Point-in-time enrichment — the feature-store correctness join. Every
    * observation (click/view interaction) is enriched with the profile
    * version that was live AT ITS OWN TIMESTAMP: the version opened by the
    * latest profile change (signup/purchase; error = deletion) at or
    * before the observation. Joining "latest profile" instead (cdc1)
    * leaks the future into training rows; this is the join that makes
    * offline features match what online serving saw.
    *
    * Built on [[graft.operators.AsofJoin]] — the single-shuffle
    * union+window merge, no candidate blow-up against the unbounded
    * history side. Deletions ride the SAME as-of payload with an
    * `is_delete` flag (a tombstone must shadow older upserts, and
    * `last(ignoreNulls)` would skip a NULL payload, so the reset is
    * resolved AFTER the join by nulling the attached version) — an
    * observation between a deletion and the next signup has no live
    * version.
    */
  val pointInTime = GQuery(
    "cdc4_point_in_time",
    (s, dir) => {
      val base = ev(s, dir)
      val chg = base
        .filter(col("event_type").isin("signup", "purchase", "error"))
        .select(col("user_id"),
          expr("unix_millis(ts)").as("version_from_ms"),
          col("event_id").as("change_id"),
          (col("event_type") === "error").as("is_delete"),
          col("value").as("profile_value"))
      val obs = base
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id"),
          expr("unix_millis(ts)").as("obs_ms"),
          col("event_type").as("obs_type"))
      graft.operators.AsofJoin
        .backward(obs, chg, Seq("user_id"), "obs_ms", "version_from_ms")
        .select(col("user_id"), col("event_id"), col("obs_ms"),
          col("obs_type"),
          when(col("is_delete"), lit(null)).otherwise(col("change_id"))
            .as("version_change_id"),
          when(col("is_delete"), lit(null))
            .otherwise(col("version_from_ms")).as("live_from_ms"),
          when(col("is_delete"), lit(null)).otherwise(col("profile_value"))
            .as("profile_value"),
          coalesce(!col("is_delete"), lit(false)).as("has_live_version"))
    },
    Some("""
      WITH chg AS (
        SELECT user_id, epoch_ms(ts) AS version_from_ms,
               event_id AS change_id,
               event_type = 'error' AS is_delete,
               value AS profile_value
        FROM events WHERE event_type IN ('signup', 'purchase', 'error')),
      obs AS (
        SELECT user_id, event_id, epoch_ms(ts) AS obs_ms,
               event_type AS obs_type
        FROM events WHERE event_type IN ('click', 'view'))
      SELECT o.user_id, o.event_id, o.obs_ms, o.obs_type,
             CASE WHEN c.is_delete THEN NULL ELSE c.change_id END
               AS version_change_id,
             CASE WHEN c.is_delete THEN NULL ELSE c.version_from_ms END
               AS live_from_ms,
             CASE WHEN c.is_delete THEN NULL ELSE c.profile_value END
               AS profile_value,
             COALESCE(NOT c.is_delete, FALSE) AS has_live_version
      FROM obs o ASOF LEFT JOIN chg c
        ON o.user_id = c.user_id AND o.obs_ms >= c.version_from_ms"""))

  /** Interval × interval: which profile versions were live during which
    * activity sessions — the two-sided generalization of cdc4 (whose
    * observations are points). Sessions are the 30-minute-gap islands of a
    * user's events (closed intervals [first, last]); versions are cdc2's
    * half-open validity intervals with open ends capped at the log
    * horizon. Runs on [[graft.operators.IntervalJoin]]: both sides explode
    * into day-wide time buckets, overlap pairs meet in the bucket of any
    * common instant (exact recall by pigeonhole), the precise predicate
    * prunes, pair identity dedupes — an equi-join plan where Spark's raw
    * overlap predicate would nest-loop.
    */
  val sessionVersionOverlap = GQuery(
    "cdc5_session_version_overlap",
    (s, dir) => {
      val base = ev(s, dir).select(col("user_id"), col("event_id"),
        expr("unix_millis(ts)").as("ms"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("upsert")).as("op"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val sessions = base
        .withColumn("new_s",
          when(lag(col("ms"), 1).over(byUser).isNull ||
            col("ms") - lag(col("ms"), 1).over(byUser) > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ms")).as("s_from"), max(col("ms")).as("s_to"),
          count(lit(1)).as("n_events"))
      val versions = base
        .withColumn("next_ms", lead(col("ms"), 1).over(byUser))
        .filter(col("op") === "upsert")
        .withColumn("version_no", row_number().over(byUser))
      val cap = base.agg((max(col("ms")) + 1).as("capms"))
      val capped = versions.crossJoin(broadcast(cap))
        .select(col("user_id"), col("version_no"),
          col("ms").as("v_from"),
          coalesce(col("next_ms"), col("capms")).as("v_to"))
      graft.operators.IntervalJoin
        .overlap(sessions, capped, Seq("user_id"),
          "s_from", "s_to", "v_from", "v_to",
          bucketMs = 86400000L,
          pairId = Seq("user_id", "session_id", "version_no"))
        .select(col("user_id"), col("session_id"),
          col("s_from").as("session_from_ms"), col("n_events"),
          col("version_no"), col("v_from").as("version_from_ms"),
          (least(col("s_to"), col("v_to") - 1) -
            greatest(col("s_from"), col("v_from"))).as("overlap_ms"))
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op
        FROM events),
      marked AS (
        SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                         OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END
                    AS new_s
        FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      numbered AS (
        SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
        FROM marked),
      sessions AS (
        SELECT user_id, session_id, MIN(ms) AS s_from, MAX(ms) AS s_to,
               COUNT(*) AS n_events
        FROM numbered GROUP BY 1, 2),
      vers AS (
        SELECT *, lead(ms, 1) OVER (PARTITION BY user_id
                                    ORDER BY ms, event_id) AS next_ms
        FROM base),
      ups AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ms, event_id) AS version_no
        FROM vers WHERE op = 'upsert'),
      cap AS (SELECT MAX(ms) + 1 AS capms FROM base),
      v2 AS (
        SELECT user_id, version_no, ms AS v_from,
               COALESCE(next_ms, capms) AS v_to
        FROM ups, cap)
      SELECT s.user_id, s.session_id, s.s_from AS session_from_ms,
             s.n_events, v.version_no, v.v_from AS version_from_ms,
             least(s.s_to, v.v_to - 1) - greatest(s.s_from, v.v_from)
               AS overlap_ms
      FROM sessions s JOIN v2 v
        ON s.user_id = v.user_id
       AND v.v_from <= s.s_to AND v.v_to > s.s_from"""))

  /** cdc6: incremental aggregate maintenance (IVM) — the delta-compute
    * pattern that lets a 100 TB rollup absorb a new partition WITHOUT
    * rescanning history: per-entity aggregates are computed separately over
    * the base (history ≤ the cut) and the delta (the new arrivals), then
    * MERGED by the aggregates' own combine laws — counts add, decimal sums
    * add exactly, maxes max. The oracle aggregates the full log directly,
    * so the hash gate IS the proof that partial-merge ≡ full recompute.
    *
    * In production the base partials are the stored materialized-view
    * state and only the delta side runs per batch (the streaming dual is
    * the same merge inside a stateful aggregation — see
    * `streaming.StreamingCdc`'s latest-wins variant). Plan shape: two
    * filtered scans with the cut pushed to parquet, each partially
    * aggregated map-side, one uniform entity-key shuffle for the merge.
    */
  val incrementalRollup = GQuery(
    "cdc6_incremental_rollup",
    (s, dir) => {
      val cut = "2024-01-16 00:00:00"
      def partial(side: DataFrame): DataFrame = side
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,6)")).as("ps"),
          max(col("value")).as("pm"))
      val base = partial(ev(s, dir).filter(col("ts") < lit(cut)))
      val delta = partial(ev(s, dir).filter(col("ts") >= lit(cut)))
      base.unionByName(delta)
        .groupBy(col("user_id"))
        .agg(
          sum(col("pn")).as("n_events"),
          sum(col("ps")).cast("double").as("total_value"),
          max(col("pm")).as("max_value"))
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             MAX(value) AS max_value
      FROM events GROUP BY 1"""))

  /** cdc7: time-travel snapshot diff — the "what changed between versions"
    * readout every lakehouse exposes (Delta CDF / Iceberg changelog): the
    * visible snapshot as of Jan 15 vs the final snapshot, each entity
    * classified inserted / deleted / updated / unchanged, with the entity
    * and change-event mass per class. "Present" means the entity's latest
    * change at the cutoff is an upsert (a tombstone at the top = absent) —
    * exactly cdc1's visibility rule applied at two points in time.
    *
    * Scale shape: each snapshot is cdc1's plan (one user-keyed window over
    * the pushdown-filtered changelog); the diff is one full-outer join on
    * the entity key (uniform, entity-bounded sides) classified per row and
    * reduced to a 4-row census. Update detection compares the winning
    * change's event_id — exact integers, no payload comparison needed.
    */
  val snapshotDiff = GQuery(
    "cdc7_snapshot_diff",
    (s, dir) => {
      def visibleAt(cutoff: Option[String]): DataFrame = {
        val base = ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("event_type") === "error", lit("delete"))
              .otherwise(lit("upsert")).as("op"))
        val cut = cutoff.fold(base)(c => base.filter(col("ts") <= lit(c)))
        cut.withColumn("rk", row_number().over(byKey))
          .filter(col("rk") === 1 && col("op") === "upsert")
          .select(col("user_id"), col("event_id"))
      }
      val t1 = visibleAt(Some("2024-01-15 00:00:00"))
        .select(col("user_id").as("u1"), col("event_id").as("e1"))
      val t2 = visibleAt(None)
        .select(col("user_id").as("u2"), col("event_id").as("e2"))
      t1.join(t2, col("u1") === col("u2"), "full_outer")
        .select(
          when(col("u1").isNull, lit("inserted"))
            .when(col("u2").isNull, lit("deleted"))
            .when(col("e1") === col("e2"), lit("unchanged"))
            .otherwise(lit("updated")).as("diff_class"),
          coalesce(col("u1"), col("u2")).as("user_id"))
        .groupBy(col("diff_class"))
        .agg(count(lit(1)).as("n_entities"))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op
        FROM events),
      t1 AS (
        SELECT user_id AS u1, event_id AS e1 FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rk
          FROM log WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        WHERE rk = 1 AND op = 'upsert'),
      t2 AS (
        SELECT user_id AS u2, event_id AS e2 FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rk
          FROM log)
        WHERE rk = 1 AND op = 'upsert')
      SELECT CASE WHEN u1 IS NULL THEN 'inserted'
                  WHEN u2 IS NULL THEN 'deleted'
                  WHEN e1 = e2 THEN 'unchanged'
                  ELSE 'updated' END AS diff_class,
             COUNT(*) AS n_entities
      FROM t1 FULL OUTER JOIN t2 ON u1 = u2
      GROUP BY 1"""))

  override def queries: Seq[GQuery] =
    Seq(latestSnapshot, scd2History, concurrencyProfile, pointInTime,
      sessionVersionOverlap, incrementalRollup, snapshotDiff)
}
