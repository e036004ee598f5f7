package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-contract enforcement — the declarative expectation suite a 100 TB
  * ingest runs before anything downstream trusts the batch (the
  * Great-Expectations/dbt-test shape, expressed as one engine query).
  * tx17 scores free-text quality; this pack checks RELATIONAL contracts:
  * value ranges, null bans, referential integrity, key uniqueness — plus
  * the privacy-risk census (k-anonymity / l-diversity) a dataset release
  * gate runs over quasi-identifier combinations (dq4/dq5).
  *
  * Plan shapes, by rule kind:
  *   - value/null rules: conditional sums riding ONE scan per table —
  *     adding a rule costs an expression, not a pass;
  *   - referential integrity: left-anti join on the uniform FK key (the
  *     dimension side broadcasts when small);
  *   - key uniqueness: one aggregate comparing COUNT vs COUNT(DISTINCT).
  * The summary is a union of tiny per-rule rows — nothing wide ever
  * shuffles.
  */
object Quality extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** One row per contract rule: population, violations, violation ppm. */
  val contractSummary = GQuery(
    "dq1_contract_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      def ruleRow(name: String, checked: Column, viol: Column): Column =
        struct(lit(name).as("rule"), checked.as("n_checked"),
          viol.as("n_violations"))
      // lineitem value rules: one scan, one aggregate — the rule set is
      // SHARED with the streaming monitor (ContractMonitor.lineitemRules)
      // so batch gate and live dashboard can never drift apart
      val shared = graft.streaming.ContractMonitor.lineitemRules
      val liAggs = count(lit(1)).as("n") +: shared.zipWithIndex.map {
        case ((_, viol), i) =>
          sum(when(viol, 1L).otherwise(0L)).as(s"v$i")
      }
      val liRules = li.agg(liAggs.head, liAggs.tail: _*)
        .select(explode(array(shared.zipWithIndex.map {
          case ((name, _), i) => ruleRow(name, col("n"), col(s"v$i"))
        }: _*)).as("r"))
        .select(col("r.*"))
      // orders value rules + key uniqueness: one aggregate
      val ordRules = ord.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v1"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v2"))
        .select(explode(array(
          ruleRow("orders.totalprice_positive", col("n"), col("v1")),
          ruleRow("orders.orderkey_unique", col("n"), col("v2")))).as("r"))
        .select(col("r.*"))
      // referential integrity: anti-join counts on the FK keys
      val liN = li.count()
      val ordN = ord.count()
      val fkLi = li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(lit("lineitem.orderkey_fk_orders").as("rule"),
          lit(liN).as("n_checked"), col("v").as("n_violations"))
      val fkOrd = ord.join(broadcast(cust.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(lit("orders.custkey_fk_customer").as("rule"),
          lit(ordN).as("n_checked"), col("v").as("n_violations"))
      liRules.unionByName(ordRules).unionByName(fkLi).unionByName(fkOrd)
        .withColumn("violation_ppm",
          expr("n_violations * 1000000L div n_checked"))
    },
    Some("""
      WITH li AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS v1,
               SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS v2,
               SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS v3,
               SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v4,
               SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v5
        FROM lineitem),
      ord AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v1,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS v2
        FROM orders),
      fkli AS (
        SELECT COUNT(*) AS v FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      fkord AS (
        SELECT COUNT(*) AS v FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
      rules AS (
        SELECT 'lineitem.quantity_in_1_50' AS rule,
               n AS n_checked, CAST(v1 AS BIGINT) AS n_violations FROM li
        UNION ALL SELECT 'lineitem.discount_le_5pct', n, CAST(v2 AS BIGINT) FROM li
        UNION ALL SELECT 'lineitem.quantity_le_45', n, CAST(v3 AS BIGINT) FROM li
        UNION ALL SELECT 'lineitem.shipdate_not_null', n, CAST(v4 AS BIGINT) FROM li
        UNION ALL SELECT 'lineitem.extendedprice_positive', n, CAST(v5 AS BIGINT) FROM li
        UNION ALL SELECT 'orders.totalprice_positive', n, CAST(v1 AS BIGINT) FROM ord
        UNION ALL SELECT 'orders.orderkey_unique', n, CAST(v2 AS BIGINT) FROM ord
        UNION ALL SELECT 'lineitem.orderkey_fk_orders',
               (SELECT COUNT(*) FROM lineitem), CAST(v AS BIGINT) FROM fkli
        UNION ALL SELECT 'orders.custkey_fk_customer',
               (SELECT COUNT(*) FROM orders), CAST(v AS BIGINT) FROM fkord)
      SELECT rule, n_checked, n_violations,
             CAST(n_violations * 1000000 // n_checked AS BIGINT) AS violation_ppm
      FROM rules"""))

  /** Deterministic evidence sample: the first 5 violating rows per firing
    * value rule, keyed by the natural row id — what the on-call engineer
    * looks at before deciding to quarantine a batch. A per-rule window
    * over only the violating rows (the filter rides the scan; sample cost
    * scales with violations, not table size).
    */
  val violationSample = GQuery(
    "dq2_violation_sample",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
      val viols = li
        .select(col("l_orderkey"), col("l_linenumber"), explode(array(
          when(col("l_discount") > 0.05,
            struct(lit("lineitem.discount_le_5pct").as("rule"),
              col("l_discount").cast("double").as("observed"))),
          when(col("l_quantity") > 45,
            struct(lit("lineitem.quantity_le_45").as("rule"),
              col("l_quantity").cast("double").as("observed")))))
          .as("v"))
        .filter(col("v").isNotNull)
        .select(col("v.rule").as("rule"), col("l_orderkey"),
          col("l_linenumber"), col("v.observed").as("observed"))
      // order by the FULL output tuple: the generator emits duplicate
      // (l_orderkey, l_linenumber) pairs at sf0.1, and a tie in the sort key
      // across rows with different `observed` made ranks engine-dependent
      viols.withColumn("rk", row_number().over(
          Window.partitionBy(col("rule"))
            .orderBy(col("l_orderkey"), col("l_linenumber"), col("observed"))))
        .filter(col("rk") <= 5)
    },
    Some("""
      WITH viols AS (
        SELECT 'lineitem.discount_le_5pct' AS rule, l_orderkey, l_linenumber,
               CAST(l_discount AS DOUBLE) AS observed
        FROM lineitem WHERE l_discount > 0.05
        UNION ALL
        SELECT 'lineitem.quantity_le_45', l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE)
        FROM lineitem WHERE l_quantity > 45)
      SELECT * FROM (
        SELECT rule, l_orderkey, l_linenumber, observed,
               row_number() OVER (PARTITION BY rule
                                  ORDER BY l_orderkey, l_linenumber, observed) AS rk
        FROM viols) WHERE rk <= 5"""))

  /** dq3: source-vs-derived reconciliation — the "does the rollup still
    * equal the detail" audit every warehouse runs between a header table
    * and its recomputed line-level total (here: o_totalprice vs the
    * lineitem-derived TPC-H pricing formula). The output is a one-row
    * drift report: coverage, orphaned headers, tolerance-banded match
    * counts, and the worst relative drift — on THIS generator the columns
    * are independent, so the report correctly shows ~100% drift; the
    * operator's job is to measure, not to assume.
    *
    * Scale shape: the detail side partial-aggregates to one decimal row
    * per order before the join (exact, associative), then one uniform
    * orderkey join against the header scan; every census figure is a
    * conditional sum riding that single pass. Per-row drift is a decimal
    * difference (exact) rendered to relative doubles only inside each
    * row — no order-dependent float accumulation; the max is over exact
    * per-row values.
    */
  val reconciliation = GQuery(
    "dq3_reconciliation",
    (s, dir) => {
      val derived = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) + col("l_tax")) *
          (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("derived"))
      val joined = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .join(derived, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("diff",
          abs(col("o_totalprice").cast("decimal(18,4)") -
            coalesce(col("derived"), lit(0).cast("decimal(18,4)"))))
        .withColumn("rel",
          col("diff").cast("double") / col("o_totalprice").cast("double"))
      joined.agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("derived").isNull, 1L).otherwise(0L)).as("n_orphaned"),
        sum(when(col("diff") < 0.01, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("rel") <= 0.01, 1L).otherwise(0L)).as("n_within_1pct"),
        sum(when(col("rel") <= 0.10, 1L).otherwise(0L)).as("n_within_10pct"),
        max(col("rel")).as("max_rel_drift"))
    },
    Some("""
      WITH derived AS (
        SELECT l_orderkey,
               SUM(CAST(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                   AS DECIMAL(18,4))) AS derived
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT o_orderkey, o_totalprice, derived,
               abs(CAST(o_totalprice AS DECIMAL(18,4))
                   - COALESCE(derived, 0)) AS diff,
               CAST(abs(CAST(o_totalprice AS DECIMAL(18,4))
                   - COALESCE(derived, 0)) AS DOUBLE)
                 / CAST(o_totalprice AS DOUBLE) AS rel
        FROM orders LEFT JOIN derived ON o_orderkey = l_orderkey)
      SELECT COUNT(*) AS n_orders,
             CAST(SUM(CASE WHEN derived IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphaned,
             CAST(SUM(CASE WHEN diff < 0.01 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
             CAST(SUM(CASE WHEN rel <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_1pct,
             CAST(SUM(CASE WHEN rel <= 0.10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_10pct,
             MAX(rel) AS max_rel_drift
      FROM j"""))

  /** dq4: k-anonymity census — before a table ships to a training pipeline,
    * how re-identifiable are its rows under the chosen quasi-identifiers?
    * A row is "k-anonymous" if at least k rows share its QI tuple (here
    * (c_nationkey, c_mktsegment)); the census reports, for each policy
    * threshold k ∈ {2,5,10,25}, how many QI equivalence classes and how
    * many actual rows fall below it. This is the aggregate a governance
    * gate thresholds on ("quarantine if >0.1% of rows are below k=5").
    *
    * Scale shape: one groupBy on the QI tuple (the only shuffle — uniform,
    * low-cardinality keys), then the threshold census is a conditional-sum
    * aggregate over the tiny per-class relation, exploded against a literal
    * threshold array. Adding a threshold costs an expression, not a pass.
    */
  val kAnonymity = GQuery(
    "dq4_k_anonymity",
    (s, dir) => {
      val classes = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("sz"))
      val ks = Seq(2, 5, 10, 25)
      val aggs = Seq(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows")) ++
        ks.flatMap(k => Seq(
          sum(when(col("sz") < k, 1L).otherwise(0L)).as(s"g$k"),
          sum(when(col("sz") < k, col("sz")).otherwise(0L)).as(s"r$k")))
      classes.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(ks.map(k => struct(
          lit(k).as("k"),
          col("n_classes"), col("n_rows"),
          col(s"g$k").as("classes_below_k"),
          col(s"r$k").as("rows_below_k"))): _*)).as("c"))
        .select(col("c.*"))
        .withColumn("rows_below_ppm",
          expr("rows_below_k * 1000000L div n_rows"))
    },
    Some("""
      WITH classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
        FROM customer GROUP BY 1, 2),
      census AS (
        SELECT COUNT(*) AS n_classes, CAST(SUM(sz) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
               CAST(SUM(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT) AS r2,
               CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
               CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS r5,
               CAST(SUM(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS g10,
               CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT) AS r10,
               CAST(SUM(CASE WHEN sz < 25 THEN 1 ELSE 0 END) AS BIGINT) AS g25,
               CAST(SUM(CASE WHEN sz < 25 THEN sz ELSE 0 END) AS BIGINT) AS r25
        FROM classes)
      SELECT k, n_classes, n_rows, classes_below_k, rows_below_k,
             CAST(rows_below_k * 1000000 // n_rows AS BIGINT) AS rows_below_ppm
      FROM (
        SELECT 2 AS k, n_classes, n_rows,
               CAST(g2 AS BIGINT) AS classes_below_k,
               CAST(r2 AS BIGINT) AS rows_below_k FROM census
        UNION ALL SELECT 5, n_classes, n_rows, g5, r5 FROM census
        UNION ALL SELECT 10, n_classes, n_rows, g10, r10 FROM census
        UNION ALL SELECT 25, n_classes, n_rows, g25, r25 FROM census)"""))

  /** dq5: l-diversity — k-anonymity's complement: an equivalence class can
    * be large yet still leak if everyone in it shares the same sensitive
    * value. Per QI class, count DISTINCT sensitive buckets (account balance
    * in 1000-unit bands); report the classes whose diversity l < 3 and the
    * row mass they carry. One-row governance summary.
    *
    * Scale shape: the distinct-count rides the same single QI shuffle as
    * dq4 (partial aggregation on (QI, bucket) first would also work; with
    * low-cardinality buckets Spark's ObjectHashAggregate handles the
    * per-class distinct without a second shuffle). Output is O(1).
    */
  val lDiversity = GQuery(
    "dq5_l_diversity",
    (s, dir) => {
      val classes = t(s, dir, "customer")
        .withColumn("sens_bucket", floor(col("c_acctbal") / 1000))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("sens_bucket")).as("l"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("classes_below_3"),
        sum(when(col("l") < 3, col("sz")).otherwise(0L)).as("rows_below_3"))
    },
    Some("""
      WITH classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz,
               COUNT(DISTINCT FLOOR(c_acctbal / 1000)) AS l
        FROM customer GROUP BY 1, 2)
      SELECT COUNT(*) AS n_classes, CAST(SUM(sz) AS BIGINT) AS n_rows,
             MIN(l) AS min_l,
             CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_3,
             CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT)
               AS rows_below_3
      FROM classes"""))

  /** dq6: freshness audit — per-source staleness every ingest dashboard
    * tracks: each event type's latest timestamp against the corpus
    * high-water mark, with the lag in whole seconds. Anchoring on the
    * corpus max (not wall clock) keeps the audit deterministic and
    * replayable; production swaps the anchor for now() at the call site.
    *
    * Scale shape: ONE scan partial-aggregating to a ≤ |types| relation;
    * the high-water mark is a window over THAT tiny relation (bounded
    * single partition over a handful of rows), never a second pass.
    */
  val freshness = GQuery(
    "dq6_freshness",
    (s, dir) => {
      val groups = Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("latest_ts"))
      groups
        .withColumn("high_water_ts", max(col("latest_ts")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("event_type"), col("n_events"), col("latest_ts"),
          col("high_water_ts"),
          expr("(unix_micros(high_water_ts) - unix_micros(latest_ts))" +
            " div 1000000").as("lag_seconds"))
    },
    Some("""
      WITH groups AS (
        SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS latest_ts
        FROM events GROUP BY 1)
      SELECT event_type, n_events, latest_ts,
             MAX(latest_ts) OVER () AS high_water_ts,
             CAST((epoch_us(MAX(latest_ts) OVER ()) - epoch_us(latest_ts))
                  // 1000000 AS BIGINT) AS lag_seconds
      FROM groups"""))

  /** dq7: volume-anomaly monitor — the pipeline-operations alarm dq6's
    * freshness check doesn't cover: a feed can be fresh and still have
    * silently halved (an upstream filter bug) or doubled (a replay). Each
    * (event_type, day) cell's count is compared to its own trailing 7-day
    * volume; the ratio lives in exact integer parts-per-million
    * (`7·cnt·1e6 div trailing_sum`, so 1e6 = exactly on-trend) and a day
    * flags when it runs over 2× or under 0.5× trend. Warm-up days (window
    * not yet full) are excluded rather than diluted.
    *
    * Scale shape (the cdc3/tsr6 grid argument): the corpus collapses to
    * the DATE-RANGE-bounded (type, day) grid in one map-side-combined
    * aggregate — zero-filled so missing days read as true zero-volume
    * anomalies, which is exactly the failure the monitor exists to catch —
    * and every window below walks grid rows. Integer-only: no float
    * thresholds to drift.
    */
  /** The trailing-week ratio readout over a (event_type, day, cnt)
    * relation — shared verbatim by the batch dq7 gate and the live
    * [[graft.streaming.StreamingVolume]] state snapshot, so the alarm and
    * the audit can never drift apart.
    */
  def volumeReadout(s: SparkSession, counts: DataFrame): DataFrame = {
    val days = s.range(1).select(explode(sequence(
      to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
      expr("interval 1 day"))).as("day"))
    // the rename round-trip mints a fresh attribute id for the type list —
    // without it the grid join self-references `counts` and fails
    // resolution when counts is a streaming memory view
    val types = counts.select(col("event_type").as("et")).distinct()
      .select(col("et").as("event_type"))
    val grid = types.crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    grid
      .withColumn("trailing_sum",
        sum(col("cnt")).over(w.rowsBetween(-7, -1)))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") > 7 && col("trailing_sum") > 0)
      .withColumn("ratio_ppm",
        expr("(7L * cnt * 1000000L) div trailing_sum"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("trailing_sum"), col("ratio_ppm"),
        (col("ratio_ppm") > 2000000L || col("ratio_ppm") < 500000L)
          .as("anomalous"))
  }

  val volumeAnomaly = GQuery(
    "dq7_volume_anomaly",
    (s, dir) => volumeReadout(s,
      graft.streaming.StreamingVolume.dailyCounts(t(s, dir, "events"))),
    Some("""
      WITH types AS (SELECT DISTINCT event_type FROM events),
      days AS (SELECT unnest(generate_series(
                 DATE '2024-01-01', DATE '2024-01-30',
                 INTERVAL 1 DAY)) AS day),
      c AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, CAST(d.day AS DATE) AS day,
               COALESCE(c.cnt, 0) AS cnt
        FROM types t CROSS JOIN days d
        LEFT JOIN c ON c.event_type = t.event_type
                   AND c.day = CAST(d.day AS DATE)),
      wind AS (
        SELECT event_type, day, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trailing_sum,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS pos
        FROM grid)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
             CAST(trailing_sum AS BIGINT) AS trailing_sum,
             CAST((7 * cnt * 1000000) // trailing_sum AS BIGINT)
               AS ratio_ppm,
             CAST((7 * cnt * 1000000) // trailing_sum AS BIGINT) > 2000000
               OR CAST((7 * cnt * 1000000) // trailing_sum AS BIGINT)
                  < 500000 AS anomalous
      FROM wind WHERE pos > 7 AND trailing_sum > 0"""))

  override def queries: Seq[GQuery] =
    Seq(contractSummary, violationSample, reconciliation, kAnonymity,
      lDiversity, freshness, volumeAnomaly)
}
