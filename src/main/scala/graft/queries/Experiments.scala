package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment (A/B test) analysis over the events stream — the readout layer
  * every growth/ML platform runs nightly: deterministic variant assignment,
  * per-variant metric moments, the two-sample effect test, the
  * sample-ratio-mismatch guardrail, and CUPED variance reduction.
  *
  * The single scale argument, shared by all four queries: experiment
  * analysis at 100 TB is ONE user-keyed partial-aggregable shuffle (events →
  * per-user metric), after which every test statistic is algebra over a
  * handful of EXACT moment sums (n, Σm, Σm², Σxy …) carried in decimal.
  * Nothing here ever sorts, samples, or iterates — the z-score, χ², and
  * CUPED θ all come from sums that merge associatively, which is also why
  * the same statistics are computable one-pass in a streaming aggregation.
  *
  * Determinism discipline (the pack-wide rule): variant assignment is the
  * top bit of the Knuth multiplicative hash of user_id (the samp1 idiom —
  * never rand(); the LOW bit of id·odd mod 2^32 is id's own parity, so the
  * top bit is the one to use); per-user metrics accumulate in decimal; test
  * statistics are double algebra over exact scalars with expression
  * structure mirrored in the oracle, so results hash-match bit-for-bit.
  *
  * Windows: pre-period [2024-01-01, 2024-01-16), post-period from
  * 2024-01-16 — the generator's fixed 30-day span (TESTDATA.md), split as
  * cdc6 splits it.
  */
object Experiments extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val Cut = "2024-01-16 00:00:00"

  /** variant ∈ {0, 1}: top bit of the 32-bit Knuth hash of user_id. */
  private def variant(id: Column): Column =
    when((id * 2654435761L) % 4294967296L >= 2147483648L, 1L).otherwise(0L)
  private val SqlVariant =
    "CASE WHEN (user_id * 2654435761) % 4294967296 >= 2147483648 " +
      "THEN 1 ELSE 0 END"

  /** Per-user post-period metric (decimal-exact activity total) + variant.
    * The per-user total is re-bounded to decimal(18,6) (it trivially fits)
    * so second moments m·m stay inside decimal(38,12) in BOTH engines —
    * Σ(decimal(38,6))² would hit the precision cap and round differently
    * per engine.
    */
  private def userMetric(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("ts") >= lit(Cut))
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)").as("m"))
      .withColumn("variant", variant(col("user_id")))
  private val SqlUserMetric = s"""
      um AS (
        SELECT user_id, $SqlVariant AS variant,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS m
        FROM events WHERE ts >= TIMESTAMP '$Cut' GROUP BY 1, 2)"""

  /** ab1: per-variant metric moments — the experiment dashboard row: user
    * count, mean, and sample variance of the per-user metric, all derived
    * from exact (n, Σm, Σm²) sums. The aggregation body is STRUCTURALLY
    * SHARED with [[graft.streaming.StreamingAb]] (this query calls the
    * same function), so the live dashboard and the nightly batch readout
    * can never drift apart — the ContractMonitor/StreamingOhlc pattern.
    */
  val variantMetrics = GQuery(
    "ab1_variant_metrics",
    (s, dir) => graft.streaming.StreamingAb.moments(userMetric(s, dir)),
    Some(s"""
      WITH $SqlUserMetric
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(m) AS DOUBLE) / COUNT(*) AS mean_metric,
             (COUNT(*) * CAST(SUM(CAST(m AS DECIMAL(19,6)) * CAST(m AS DECIMAL(19,6))) AS DOUBLE)
               - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE))
               / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS var_metric
      FROM um GROUP BY 1"""))

  /** ab2: two-sample effect readout — mean difference, its standard error
    * (Welch), and the z-score. On this generator assignment is independent
    * of behaviour, so the z correctly hovers near 0 — the null pipeline
    * check an experimentation platform runs before trusting real effects.
    */
  val effectTest = GQuery(
    "ab2_effect_test",
    (s, dir) => {
      val agg = userMetric(s, dir)
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n0"), sum(col("m")).cast("double").as("sm"),
          sum(col("m") * col("m")).cast("double").as("smm"))
        .select(col("variant"),
          col("n0").cast("double").as("n"),
          col("sm"),
          ((col("n0") * col("smm") - col("sm") * col("sm")) /
            (col("n0").cast("double") * (col("n0") - 1))).as("v"))
        // consumed by BOTH variant filters below: persist the 2-row
        // aggregate so the user-level pipeline materializes once, not twice
        .persist()
      val a = agg.filter(col("variant") === 0)
        .select(col("n").as("n_a"), col("sm").as("sm_a"), col("v").as("v_a"))
      val b = agg.filter(col("variant") === 1)
        .select(col("n").as("n_b"), col("sm").as("sm_b"), col("v").as("v_b"))
      a.crossJoin(b)
        .select(
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          (col("sm_b") / col("n_b") - col("sm_a") / col("n_a")).as("diff"),
          sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")).as("se"),
          ((col("sm_b") / col("n_b") - col("sm_a") / col("n_a")) /
            sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
            .as("z_score"))
    },
    Some(s"""
      WITH $SqlUserMetric,
      agg AS (
        SELECT variant, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(m) AS DOUBLE) AS sm,
               (COUNT(*) * CAST(SUM(CAST(m AS DECIMAL(19,6)) * CAST(m AS DECIMAL(19,6))) AS DOUBLE)
                 - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE))
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS v
        FROM um GROUP BY 1),
      a AS (SELECT n AS n_a, sm AS sm_a, v AS v_a FROM agg WHERE variant = 0),
      b AS (SELECT n AS n_b, sm AS sm_b, v AS v_b FROM agg WHERE variant = 1)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             sm_b / n_b - sm_a / n_a AS diff,
             sqrt(v_a / n_a + v_b / n_b) AS se,
             (sm_b / n_b - sm_a / n_a) / sqrt(v_a / n_a + v_b / n_b)
               AS z_score
      FROM a, b"""))

  /** ab3: sample-ratio-mismatch guardrail — χ² of observed variant counts
    * against the designed 50/50 split. An SRM means the assignment or
    * logging pipeline is broken and every downstream readout is invalid;
    * platforms gate on χ² > 3.84 (p < 0.05, 1 dof).
    */
  val srmCheck = GQuery(
    "ab3_srm_check",
    (s, dir) => {
      val counts = ev(s, dir)
        .select(col("user_id")).distinct()
        .withColumn("variant", variant(col("user_id")))
        .groupBy(col("variant")).agg(count(lit(1)).as("n"))
        .persist() // two consumers (a/b filters) — one distinct+agg pass
      val a = counts.filter(col("variant") === 0).select(col("n").as("n_a"))
      val b = counts.filter(col("variant") === 1).select(col("n").as("n_b"))
      a.crossJoin(b)
        .withColumn("expected", (col("n_a") + col("n_b")).cast("double") / 2)
        .select(col("n_a"), col("n_b"),
          (((col("n_a") - col("expected")) * (col("n_a") - col("expected")) +
            (col("n_b") - col("expected")) * (col("n_b") - col("expected"))) /
            col("expected")).as("chi2"))
        .withColumn("srm_flag", col("chi2") > 3.84)
    },
    Some(s"""
      WITH counts AS (
        SELECT $SqlVariant AS variant, COUNT(*) AS n
        FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
      a AS (SELECT n AS n_a FROM counts WHERE variant = 0),
      b AS (SELECT n AS n_b FROM counts WHERE variant = 1),
      j AS (SELECT n_a, n_b, CAST(n_a + n_b AS DOUBLE) / 2 AS expected
            FROM a, b)
      SELECT n_a, n_b,
             ((n_a - expected) * (n_a - expected)
              + (n_b - expected) * (n_b - expected)) / expected AS chi2,
             ((n_a - expected) * (n_a - expected)
              + (n_b - expected) * (n_b - expected)) / expected > 3.84
               AS srm_flag
      FROM j"""))

  /** ab4: CUPED variance reduction — the industry-standard sensitivity
    * boost: regress the post-period metric on the pre-period covariate
    * (θ = cov(x,y)/var(x), pooled across variants), adjust
    * y' = y − θ·(x − x̄), and report the adjusted effect plus the variance
    * reduction ratio (= pre/post correlation², the share of noise the
    * covariate explains). Everything is algebra over exact pooled and
    * per-variant sums (n, Σx, Σy, Σxy, Σx², Σy²) from ONE user-level
    * relation — CUPED costs one extra column in the same shuffle, which is
    * why it is free at any scale.
    */
  val cuped = GQuery(
    "ab4_cuped",
    (s, dir) => {
      val users = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < lit(Cut), col("value").cast("decimal(18,6)"))
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("decimal(18,6)").as("x"),
          sum(when(col("ts") >= lit(Cut), col("value").cast("decimal(18,6)"))
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("decimal(18,6)").as("y"))
        .withColumn("variant", variant(col("user_id")))
        // three consumers (pooled moments, per-variant sums a and b): the
        // user-keyed shuffle must run ONCE — without this the plan scans
        // and shuffles the events table three times
        .persist()
      val pooled = users.agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n").cast("double").as("n"),
          col("sx").cast("double").as("sx"),
          col("sy").cast("double").as("sy"),
          col("sxy").cast("double").as("sxy"),
          col("sxx").cast("double").as("sxx"),
          col("syy").cast("double").as("syy"))
        .select(col("n"), col("sx"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("theta"),
          (((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy"))))
            .as("var_reduction"))
      val byVariant = users.groupBy(col("variant"))
        .agg(count(lit(1)).as("vn"), sum(col("x")).as("vsx"),
          sum(col("y")).as("vsy"))
        .select(col("variant"), col("vn").cast("double").as("vn"),
          col("vsx").cast("double").as("vsx"),
          col("vsy").cast("double").as("vsy"))
      val a = byVariant.filter(col("variant") === 0)
        .select(col("vn").as("n_a"), col("vsx").as("sx_a"),
          col("vsy").as("sy_a"))
      val b = byVariant.filter(col("variant") === 1)
        .select(col("vn").as("n_b"), col("vsx").as("sx_b"),
          col("vsy").as("sy_b"))
      a.crossJoin(b).crossJoin(broadcast(pooled))
        .select(
          col("theta"), col("var_reduction"),
          (col("sy_b") / col("n_b") - col("sy_a") / col("n_a"))
            .as("raw_diff"),
          ((col("sy_b") / col("n_b") -
            col("theta") * (col("sx_b") / col("n_b") - col("sx") / col("n"))) -
           (col("sy_a") / col("n_a") -
            col("theta") * (col("sx_a") / col("n_a") - col("sx") / col("n"))))
            .as("cuped_diff"))
    },
    Some(s"""
      WITH users AS (
        SELECT user_id, $SqlVariant AS variant,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '$Cut'
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END)
                    AS DECIMAL(18,6)) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '$Cut'
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END)
                    AS DECIMAL(18,6)) AS y
        FROM events GROUP BY 1, 2),
      pooled AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        FROM users),
      th AS (
        SELECT n, sx,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
               ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 AS var_reduction
        FROM pooled),
      byv AS (
        SELECT variant, CAST(COUNT(*) AS DOUBLE) AS vn,
               CAST(SUM(x) AS DOUBLE) AS vsx, CAST(SUM(y) AS DOUBLE) AS vsy
        FROM users GROUP BY 1),
      a AS (SELECT vn AS n_a, vsx AS sx_a, vsy AS sy_a FROM byv
            WHERE variant = 0),
      b AS (SELECT vn AS n_b, vsx AS sx_b, vsy AS sy_b FROM byv
            WHERE variant = 1)
      SELECT theta, var_reduction,
             sy_b / n_b - sy_a / n_a AS raw_diff,
             (sy_b / n_b - theta * (sx_b / n_b - sx / n))
               - (sy_a / n_a - theta * (sx_a / n_a - sx / n)) AS cuped_diff
      FROM a, b, th"""))

  /** ab5: power analysis — the "how long must this test run" table every
    * platform shows next to ab2's readout: for a grid of minimum
    * detectable effects (1/2/5/10% of the pooled mean), the per-arm sample
    * size n = 2(z_{α/2}+z_β)²·s²_p/δ² at α = 5% two-sided, 80% power, and
    * whether the CURRENT arms already clear it. An experiment read before
    * its powered size is a coin flip with a dashboard — this is the
    * guardrail that says when reading ab2 is legitimate.
    *
    * Determinism: the z constants enter as shared double literals; pooled
    * variance and mean come from the same exact decimal sums as ab1/ab2;
    * the MDE grid is a ×4 literal explode; `ceil` lands identically on
    * identical doubles. Scale: everything after the one user-keyed
    * shuffle is algebra over a 2-row aggregate.
    */
  val powerAnalysis = GQuery(
    "ab5_power_analysis",
    (s, dir) => {
      val agg = userMetric(s, dir)
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n0"), sum(col("m")).cast("double").as("sm"),
          sum(col("m") * col("m")).cast("double").as("smm"))
        .select(col("variant"), col("n0"),
          col("sm"),
          ((col("n0") * col("smm") - col("sm") * col("sm")) /
            (col("n0").cast("double") * (col("n0") - 1))).as("v"))
      val a = agg.filter(col("variant") === 0)
        .select(col("n0").as("n_a"), col("sm").as("sm_a"), col("v").as("v_a"))
      val b = agg.filter(col("variant") === 1)
        .select(col("n0").as("n_b"), col("sm").as("sm_b"), col("v").as("v_b"))
      val base = a.crossJoin(b)
        .select(col("n_a"), col("n_b"),
          ((col("sm_a") + col("sm_b")) /
            (col("n_a") + col("n_b")).cast("double")).as("pooled_mean"),
          (((col("n_a") - 1) * col("v_a") + (col("n_b") - 1) * col("v_b")) /
            (col("n_a") + col("n_b") - 2).cast("double")).as("pooled_var"))
      // z_{0.025} + z_{0.20}: 1.9599639845400545 + 0.8416212335729143
      val zsum = lit(1.9599639845400545 + 0.8416212335729143)
      base
        .select(col("*"), explode(array(
          lit(1L), lit(2L), lit(5L), lit(10L))).as("mde_pct"))
        .withColumn("mde_abs",
          col("pooled_mean") * col("mde_pct").cast("double") / 100.0)
        .withColumn("required_n_per_arm",
          ceil(lit(2.0) * zsum * zsum * col("pooled_var") /
            (col("mde_abs") * col("mde_abs"))).cast("long"))
        .select(col("mde_pct"), col("mde_abs"), col("required_n_per_arm"),
          least(col("n_a"), col("n_b")).as("current_n_min"),
          (least(col("n_a"), col("n_b")) >= col("required_n_per_arm"))
            .as("powered"))
    },
    Some(s"""
      WITH $SqlUserMetric,
      agg AS (
        SELECT variant, COUNT(*) AS n0,
               CAST(SUM(m) AS DOUBLE) AS sm,
               (COUNT(*) * CAST(SUM(CAST(m AS DECIMAL(19,6))
                                    * CAST(m AS DECIMAL(19,6))) AS DOUBLE)
                 - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE))
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS v
        FROM um GROUP BY 1),
      a AS (SELECT n0 AS n_a, sm AS sm_a, v AS v_a FROM agg WHERE variant = 0),
      b AS (SELECT n0 AS n_b, sm AS sm_b, v AS v_b FROM agg WHERE variant = 1),
      base AS (
        SELECT n_a, n_b,
               (sm_a + sm_b) / CAST(n_a + n_b AS DOUBLE) AS pooled_mean,
               ((n_a - 1) * v_a + (n_b - 1) * v_b)
                 / CAST(n_a + n_b - 2 AS DOUBLE) AS pooled_var
        FROM a, b),
      grid AS (SELECT unnest([1, 2, 5, 10]) AS mde_pct)
      SELECT CAST(mde_pct AS BIGINT) AS mde_pct,
             pooled_mean * CAST(mde_pct AS DOUBLE) / 100.0 AS mde_abs,
             CAST(CEIL(2.0 * ${1.9599639845400545 + 0.8416212335729143}
                       * ${1.9599639845400545 + 0.8416212335729143}
                       * pooled_var
                       / ((pooled_mean * CAST(mde_pct AS DOUBLE) / 100.0)
                          * (pooled_mean * CAST(mde_pct AS DOUBLE) / 100.0)))
                  AS BIGINT) AS required_n_per_arm,
             least(n_a, n_b) AS current_n_min,
             least(n_a, n_b) >= CAST(CEIL(2.0
                       * ${1.9599639845400545 + 0.8416212335729143}
                       * ${1.9599639845400545 + 0.8416212335729143}
                       * pooled_var
                       / ((pooled_mean * CAST(mde_pct AS DOUBLE) / 100.0)
                          * (pooled_mean * CAST(mde_pct AS DOUBLE) / 100.0)))
                  AS BIGINT) AS powered
      FROM base, grid"""))

  override def queries: Seq[GQuery] =
    Seq(variantMetrics, effectTest, srmCheck, cuped, powerAnalysis)
}
