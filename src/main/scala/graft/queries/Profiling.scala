package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-profiling and physical-layout operators — the "know your table before
  * you train on it" surface (per-column stats, categorical tops, space-filling
  * curve layout). These are the ops a 100 TB ingest runs FIRST, so their plan
  * shapes matter as much as the query packs':
  *
  *   - prof1 computes every numeric column's stats in ONE scan (a single
  *     multi-expression aggregate, then an unpivot of the 1-row result) — the
  *     naive per-column loop would scan the table N_cols times;
  *   - prof2 turns the per-column categorical histogram into ONE shuffle by
  *     exploding (column, value) pairs out of each row — profile M columns
  *     for the price of one groupBy;
  *   - z1 assigns each row its Morton (Z-order) curve position and derives
  *     the layout bucket from the curve's high bits — a pure per-row
  *     computation (NO global sort, no window), which is exactly how a
  *     cluster-scale writer lays out multi-dimensionally-pruned files.
  */
object Profiling extends QueryPack {

  private val NumCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Per-numeric-column null count / exact distinct / min / max in a single
    * pass — via the same VALUE-HISTOGRAM substrate as prof4 rather than a
    * multi-`count_distinct` aggregate: Spark plans N exact distincts as an
    * Expand that multiplies every row ×(N+1) before the shuffle, which
    * made this the inventory's 6th-slowest plan. The melt shuffles each
    * row's N values ONCE on the uniform (column, value) key with map-side
    * combine (low-cardinality columns collapse before the wire), and
    * every profile figure is then an aggregate over the per-column
    * distinct-value relation: n_distinct = COUNT of non-null histogram
    * rows, nulls/rows from the counts, min/max over values. Values melt
    * through DECIMAL(38,6), exact for every column whose values fit
    * |v| < 10^32 at 10^-6 resolution — all integer/decimal/price-scale
    * columns, and far beyond 2^53 where a double melt would conflate
    * BIGINTs. Outside that envelope the cast is GUARDED: raw-null rows
    * divert to a marked bucket of the same histogram, `n_nulls` counts
    * exactly them, and any null the cast introduces (overflow) poisons
    * `n_nulls` with `raise_error` the moment a consumer reads it —
    * instead of drifting into the figures (ProfilingSpec fires the guard
    * both ways). Sub-1e-6 conflation remains undetectable
    * here — profile such columns with a per-type melt. Min/max cast to double only on
    * output. All stages mergeable. The sketch swap-in
    * remains sk6_hll_column_profile (8×256 HLL registers, one scan);
    * SqlSurfaceSpec pins Spark's built-in approx agg tolerance.
    */
  val numericProfile = GQuery(
    "prof1_numeric_profile",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // n_nulls must count RAW nulls (the oracle profiles the raw column),
      // and any null the DECIMAL(38,6) cast *introduces* (|v| >= 10^32
      // overflow) is an envelope violation that must fail LOUDLY, not
      // drift into the profile. Both come from ONE melt: raw-null rows
      // divert to a '!'-marked bucket of the same histogram (key
      // cardinality +8, partials stay count-only), so raw nulls and
      // cast-introduced nulls are separable without a second scan or a
      // per-row flag aggregate. The guard poisons the VALUE, not the row
      // set: n_nulls raises via raise_error the moment a consumer reads a
      // violated figure, while metadata-only access (count(*), pruning)
      // stays on the old single-purpose plan — a guard FILTER here
      // measured +3.4 s in a cold JVM because it blocks the aggregate
      // pruning Bench's count() otherwise enjoys. (Sub-1e-6 precision
      // conflation remains the documented envelope; it cannot be detected
      // without a per-type distinct.)
      val melted = li.select(expr(
        s"stack(${NumCols.size}, " +
          NumCols.map(c =>
            s"CASE WHEN $c IS NULL THEN '$c!' ELSE '$c' END, " +
              s"CAST($c AS DECIMAL(38,6))").mkString(", ") +
          ") as (mkey, value)"))
      val isRawNull = col("mkey").endsWith("!")
      melted.groupBy(col("mkey"), col("value"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(rtrim(col("mkey"), "!").as("column_name"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          sum(when(isRawNull, col("cnt")).otherwise(0L)).as("raw_nulls"),
          sum(when(!isRawNull && col("value").isNull, col("cnt"))
            .otherwise(0L)).as("cast_nulls"),
          count(col("value")).as("n_distinct"),
          min(col("value")).cast("double").as("min_value"),
          max(col("value")).cast("double").as("max_value"))
        .select(col("column_name"), col("n_rows"),
          when(col("cast_nulls") === 0L, col("raw_nulls"))
            .otherwise(raise_error(concat(
              lit("prof1 melt envelope violated: DECIMAL(38,6) cast " +
                "nulled values in "), col("column_name"))).cast("long"))
            .as("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    },
    Some(NumCols.map(c => s"""
      SELECT '$c' AS column_name, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             COUNT(DISTINCT $c) AS n_distinct,
             CAST(MIN($c) AS DOUBLE) AS min_value,
             CAST(MAX($c) AS DOUBLE) AS max_value
      FROM lineitem""").mkString(" UNION ALL ")))

  private val CatCols = Seq("l_returnflag", "l_linestatus")

  /** Categorical profile (distinct count + modal value) for M columns in ONE
    * shuffle: each row explodes into (column_name, value) pairs, a single
    * groupBy builds every column's histogram at once, and the per-column
    * top-1 is a window over the (tiny) histogram, not the data.
    */
  val categoricalProfile = GQuery(
    "prof2_categorical_profile",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val pairs = li.select(explode(array(CatCols.map(c =>
        struct(lit(c).as("column_name"), col(c).as("v"))): _*)).as("p"))
        .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
      val counts = pairs.groupBy(col("column_name"), col("v"))
        .agg(count(lit(1)).as("n"))
      val rk = row_number().over(Window.partitionBy(col("column_name"))
        .orderBy(col("n").desc, col("v")))
      val top = counts.withColumn("rk", rk).filter(col("rk") === 1)
        .select(col("column_name"), col("v").as("top_value"),
          col("n").as("top_count"))
      val nd = counts.groupBy(col("column_name"))
        .agg(count(lit(1)).as("n_distinct"))
      top.join(nd, "column_name")
        .select(col("column_name"), col("n_distinct"),
          col("top_value"), col("top_count"))
    },
    Some(s"""
      WITH pairs AS (${CatCols.map(c =>
        s"SELECT '$c' AS column_name, $c AS v FROM lineitem")
        .mkString(" UNION ALL ")}),
      counts AS (
        SELECT column_name, v, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
      top AS (
        SELECT column_name, v AS top_value, n AS top_count,
               row_number() OVER (PARTITION BY column_name
                                  ORDER BY n DESC, v) AS rk
        FROM counts),
      nd AS (SELECT column_name, COUNT(*) AS n_distinct FROM counts GROUP BY 1)
      SELECT column_name, n_distinct, top_value, top_count
      FROM top JOIN nd USING (column_name) WHERE rk = 1"""))

  /** Z-order (Morton curve) layout over `events(user_id, ts)`: interleave the
    * low 16 bits of the two dimensions into a 32-bit curve position, derive
    * the layout bucket from the curve's TOP 5 bits (32 buckets), and report
    * each bucket's dimension envelope. The envelope shows why the layout
    * works: every bucket is tight in BOTH user_id-space and time-space, so a
    * scan with predicates on either dimension prunes most buckets (the
    * min/max file statistics any parquet reader checks).
    *
    * Scale shape: the curve position and bucket are per-row bit math riding
    * the scan — no sort, no window, no sampling pass. A writer would
    * `repartitionByRange($"zval")` + sortWithinPartitions to get one tight
    * file per bucket; the bucket agg here is one uniform-key shuffle.
    */
  val zorderLayout = GQuery(
    "z1_zorder_layout",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val x = pmod(col("user_id"), lit(65536L))
      val y = pmod(expr("unix_millis(ts) div 1000"), lit(65536L))
      e.select(x.as("x"), y.as("y"), graft.functions.Morton.z16(x, y).as("zval"))
        .withColumn("bucket", shiftright(col("zval"), 27))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
    },
    Some {
      val terms = graft.functions.Morton.sqlZ16("x", "y")
      s"""
      WITH d AS (
        SELECT user_id % 65536 AS x,
               (epoch_ms(ts) // 1000) % 65536 AS y
        FROM events),
      z AS (SELECT x, y, $terms AS zval FROM d)
      SELECT zval >> 27 AS bucket, COUNT(*) AS n_events,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             MIN(zval) AS min_z, MAX(zval) AS max_z
      FROM z GROUP BY 1"""
    })

  /** z2: layout-pruning audit — the quantified WHY behind z1: bucket the
    * same rows under three physical orders (time-major, user-major,
    * Z-order) and measure what a min/max-pruning reader would actually
    * scan for a point probe on each dimension. Single-dimension layouts
    * are perfect on their own axis and useless on the other (their
    * cross-axis buckets span the whole domain); Z-order pays a little on
    * both axes to be good at both — the number a table-layout decision
    * should be made from, not the folklore.
    *
    * Scale shape: all three bucket assignments are per-row bit/div math
    * riding ONE scan (the z1 argument — value-range buckets, no global
    * sort, no ntile single-partition trap); the explode is ×3; per-layout
    * envelopes are one uniform (layout, bucket) aggregate and the audit
    * reduces to 3 rows. probe_ppm = Σ bucket-extent / (buckets · domain):
    * the expected fraction of buckets a uniform point predicate cannot
    * prune — exact integers end to end.
    */
  val layoutPruningAudit = GQuery(
    "z2_layout_pruning_audit",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val x = pmod(col("user_id"), lit(65536L))
      val y = pmod(expr("unix_millis(ts) div 1000"), lit(65536L))
      val rows = e.select(x.as("x"), y.as("y"),
        graft.functions.Morton.z16(x, y).as("zval"))
      val tagged = rows.select(col("x"), col("y"), explode(array(
          struct(lit("time_major").as("layout"),
            expr("y div 2048").as("bucket")),
          struct(lit("user_major").as("layout"),
            expr("x div 2048").as("bucket")),
          struct(lit("zorder").as("layout"),
            shiftright(col("zval"), 27).as("bucket")))).as("p"))
        .select(col("x"), col("y"), col("p.layout").as("layout"),
          col("p.bucket").as("bucket"))
      tagged.groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          (max(col("x")) - min(col("x")) + 1).as("x_extent"),
          (max(col("y")) - min(col("y")) + 1).as("y_extent"))
        .groupBy(col("layout"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("n")).as("n_rows"),
          sum(col("x_extent")).as("sum_x_extent"),
          sum(col("y_extent")).as("sum_y_extent"))
        .select(col("layout"), col("n_buckets"), col("n_rows"),
          expr("sum_x_extent * 1000000L div (n_buckets * 65536L)")
            .as("x_probe_ppm"),
          expr("sum_y_extent * 1000000L div (n_buckets * 65536L)")
            .as("y_probe_ppm"))
    },
    Some {
      val terms = graft.functions.Morton.sqlZ16("x", "y")
      s"""
      WITH d AS (
        SELECT user_id % 65536 AS x,
               (epoch_ms(ts) // 1000) % 65536 AS y
        FROM events),
      z AS (SELECT x, y, $terms AS zval FROM d),
      tagged AS (
        SELECT x, y, 'time_major' AS layout, y // 2048 AS bucket FROM z
        UNION ALL
        SELECT x, y, 'user_major', x // 2048 FROM z
        UNION ALL
        SELECT x, y, 'zorder', zval >> 27 FROM z),
      env AS (
        SELECT layout, bucket, COUNT(*) AS n,
               MAX(x) - MIN(x) + 1 AS x_extent,
               MAX(y) - MIN(y) + 1 AS y_extent
        FROM tagged GROUP BY 1, 2)
      SELECT layout, COUNT(*) AS n_buckets,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(SUM(x_extent) * 1000000 // (COUNT(*) * 65536) AS BIGINT)
               AS x_probe_ppm,
             CAST(SUM(y_extent) * 1000000 // (COUNT(*) * 65536) AS BIGINT)
               AS y_probe_ppm
      FROM env GROUP BY 1"""
    })

  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pairwise Pearson correlation of the numeric measure columns in ONE
    * scan: every moment (Σx, Σx², Σxy for all column pairs) is a DECIMAL
    * sum in a single multi-expression aggregate — exact and associative, so
    * the moments are bit-identical under any partitioning — and the r
    * formula then runs in double on those exact inputs (same expression
    * sequence in both engines ⇒ deterministic). The naive per-pair
    * `df.stat.corr` loop scans the table C(n,2) times and sums doubles in
    * partition order (non-deterministic); this is one scan, deterministic,
    * and the unpivot touches a 1-row result.
    */
  val correlationMatrix = GQuery(
    "prof3_correlation_matrix",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val pairs = CorrCols.combinations(2).map(p => (p(0), p(1))).toSeq
      def d(c: String) = col(c).cast("decimal(28,6)")
      val aggs: Seq[Column] =
        count(lit(1)).cast("double").as("n") +:
        (CorrCols.flatMap(c => Seq(
          sum(d(c)).cast("double").as(s"s__$c"),
          sum((d(c) * d(c)).cast("decimal(38,6)")).cast("double").as(s"ss__$c"))) ++
         pairs.map { case (a, b) =>
           sum((d(a) * d(b)).cast("decimal(38,6)")).cast("double").as(s"sp__${a}__$b")
         })
      val one = li.agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${pairs.size}, " + pairs.map { case (a, b) =>
        s"'$a', '$b', " +
          s"(n * sp__${a}__$b - s__$a * s__$b) / " +
          s"(sqrt(n * ss__$a - s__$a * s__$a) * sqrt(n * ss__$b - s__$b * s__$b))"
      }.mkString(", ") + ") as (col_x, col_y, pearson_r)"
      one.select(expr(stackExpr))
    },
    Some {
      val pairs = CorrCols.combinations(2).map(p => (p(0), p(1))).toSeq
      def d(c: String) = s"CAST($c AS DECIMAL(28,6))"
      val moments =
        "CAST(COUNT(*) AS DOUBLE) AS n, " +
        CorrCols.map(c =>
          s"CAST(SUM(${d(c)}) AS DOUBLE) AS s__$c, " +
          s"CAST(SUM(CAST(${d(c)} * ${d(c)} AS DECIMAL(38,6))) AS DOUBLE) AS ss__$c")
          .mkString(", ") + ", " +
        pairs.map { case (a, b) =>
          s"CAST(SUM(CAST(${d(a)} * ${d(b)} AS DECIMAL(38,6))) AS DOUBLE) AS sp__${a}__$b"
        }.mkString(", ")
      val rows = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_x, '$b' AS col_y, " +
          s"(n * sp__${a}__$b - s__$a * s__$b) / " +
          s"(sqrt(n * ss__$a - s__$a * s__$a) * sqrt(n * ss__$b - s__$b * s__$b)) " +
          s"AS pearson_r FROM m"
      }.mkString(" UNION ALL ")
      s"WITH m AS (SELECT $moments FROM lineitem) $rows"
    })

  private val QuantilePs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)

  /** Melt the numeric columns to (column_name, value) and collapse to the
    * per-column VALUE HISTOGRAM with running (`cum`) and total (`tot`)
    * counts — the shared substrate of prof4/prof4b. The groupBy is
    * map-side combined (low-cardinality columns collapse before the
    * shuffle), and the window walks DISTINCT values per column, never
    * rows — so the per-column sequential piece is O(distinct), not O(n).
    */
  private def valueHistogram(li: DataFrame): DataFrame = {
    val melted = li.select(expr(
      s"stack(${NumCols.size}, " +
        NumCols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") +
        ") as (column_name, value)"))
      .filter(col("value").isNotNull)
    val wCum = Window.partitionBy(col("column_name")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("column_name"))
    melted.groupBy(col("column_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(wAll))
  }

  /** The 0-based rank a percentile interpolates at: pos = p·(n−1), the
    * definition Spark `percentile` and DuckDB `quantile_cont` share. */
  private def rankPos(p: Double, tot: Column): Column =
    lit(p) * (tot - lit(1)).cast("double")

  /** Exact interpolated quantiles (p1/p25/p50/p75/p99) for every numeric
    * column — the distribution half of the profile that prof1's min/max
    * can't see (skew, heavy tails, discretization). EXACT but scale-safe:
    * instead of `percentile` (whose partial state is the full value list,
    * so the merge task materializes every row on one executor — an OOM at
    * 100 TB, flagged in round 4), the quantile is read off the per-column
    * value histogram: v_at(rank) is a conditional MIN over cumulative
    * counts, and the p·(n−1) interpolation (Spark's own
    * `lowerValue·(higher−pos) + higherValue·(pos−lower)` double formula,
    * replicated bit-for-bit) runs on the ≤#cols×#ps result. CAVEAT FIRST:
    * the histogram's cumulative window is per-column SINGLE-TASK in
    * DISTINCT values — for continuous columns at 100 TB distinct ≈ rows,
    * so one task sorts/scans a column's whole distinct domain (it spills
    * rather than OOMs, but it is still a serial tail). The exact arm is
    * therefore a VERIFICATION tool; at scale only the sketch arm runs:
    * prof4b is the drop-in with the same output shape
    * (`approx_percentile`, rank-band-gated). Every other stage here is
    * mergeable.
    * Null semantics match `percentile` (nulls ignored) with one edge: an
    * ALL-null column yields no output rows here where SQL engines emit a
    * NULL-quantile row — irrelevant for the gated tables (no nulls) and
    * for the profile consumer (prof1 reports the null census).
    */
  val quantileProfile = GQuery(
    "prof4_exact_quantiles",
    (s, dir) => {
      val hist = valueHistogram(Tables.load(s, dir, "lineitem"))
      // v_lo/v_hi per p: the smallest value whose cumulative count covers
      // 0-based position floor(pos) / ceil(pos)
      val aggCols = QuantilePs.zipWithIndex.flatMap { case (p, i) => Seq(
        min(when(col("cum") > floor(rankPos(p, col("tot"))), col("value")))
          .as(s"vlo_$i"),
        min(when(col("cum") > ceil(rankPos(p, col("tot"))), col("value")))
          .as(s"vhi_$i"))
      }
      val perCol = hist.groupBy(col("column_name"))
        .agg(max(col("tot")).as("n"), aggCols: _*)
      perCol
        .select(col("column_name"), explode(array(
          QuantilePs.zipWithIndex.map { case (p, i) => struct(
            lit(p).as("p"), rankPos(p, col("n")).as("pos"),
            col(s"vlo_$i").as("vlo"), col(s"vhi_$i").as("vhi")) }: _*))
          .as("e"))
        .select(col("e.p").as("p"), col("column_name"),
          col("e.pos").as("pos"), col("e.vlo").as("vlo"),
          col("e.vhi").as("vhi"),
          floor(col("e.pos")).cast("double").as("lower"),
          ceil(col("e.pos")).cast("double").as("higher"))
        .select(col("column_name"), col("p"),
          when(col("lower") === col("higher"), col("vlo"))
            .otherwise(col("vlo") * (col("higher") - col("pos")) +
              col("vhi") * (col("pos") - col("lower"))).as("q"))
    },
    Some(NumCols.flatMap(c => QuantilePs.map(p => s"""
      SELECT '$c' AS column_name, CAST($p AS DOUBLE) AS p,
             quantile_cont(CAST($c AS DOUBLE), $p) AS q
      FROM lineitem""")).mkString(" UNION ALL ")))

  /** prof4b: the 100 TB quantile path with its own green row —
    * `approx_percentile` (a bounded, MERGEABLE sketch; constant-size
    * partials, no single-reducer value list) for the same (column, p)
    * grid, gated by the sketch's published rank guarantee: with accuracy
    * A the returned value's rank error is ≤ n/A, so the estimate must lie
    * within the EXACT values at ranks [floor(pos)−⌈n/A⌉, ceil(pos)+⌈n/A⌉]
    * (clamped to [0, n−1]), read off prof4's histogram machinery on its
    * own melt scan (two scans total — one for the exact band, one for the
    * sketch aggregate; PlanSpec pins the count, and at 100 TB only the
    * sketch arm runs). Output: the exact quantile (value-checked against
    * DuckDB `quantile_cont`) plus `in_band` (oracle asserts TRUE — a
    * sketch that ever violated its rank bound flips the row red).
    */
  val approxQuantileProfile = GQuery(
    "prof4b_approx_quantiles",
    (s, dir) => {
      val Accuracy = 10000
      val li = Tables.load(s, dir, "lineitem")
      val hist = valueHistogram(li)
      // band ranks: err = ceil(n / A); clamp into [0, n-1]
      def err(tot: Column): Column = ceil(tot.cast("double") / Accuracy)
      def atRank(rank: Column): Column =
        min(when(col("cum") > rank, col("value")))
      val aggCols = QuantilePs.zipWithIndex.flatMap { case (p, i) =>
        val pos = rankPos(p, col("tot"))
        Seq(
          atRank(floor(pos)).as(s"vlo_$i"),
          atRank(ceil(pos)).as(s"vhi_$i"),
          atRank(greatest(floor(pos) - err(col("tot")), lit(0L)))
            .as(s"blo_$i"),
          atRank(least(ceil(pos) + err(col("tot")), col("tot") - 1))
            .as(s"bhi_$i"))
      }
      val perCol = hist.groupBy(col("column_name"))
        .agg(max(col("tot")).as("n"), aggCols: _*)
      val exact = perCol
        .select(col("column_name"), explode(array(
          QuantilePs.zipWithIndex.map { case (p, i) => struct(
            lit(p).as("p"), rankPos(p, col("n")).as("pos"),
            col(s"vlo_$i").as("vlo"), col(s"vhi_$i").as("vhi"),
            col(s"blo_$i").as("band_lo"), col(s"bhi_$i").as("band_hi")) }: _*))
          .as("e"))
        .select(col("column_name"), col("e.p").as("p"),
          col("e.band_lo").as("band_lo"), col("e.band_hi").as("band_hi"),
          floor(col("e.pos")).cast("double").as("lower"),
          ceil(col("e.pos")).cast("double").as("higher"),
          col("e.pos").as("pos"), col("e.vlo").as("vlo"),
          col("e.vhi").as("vhi"))
        .select(col("column_name"), col("p"), col("band_lo"), col("band_hi"),
          when(col("lower") === col("higher"), col("vlo"))
            .otherwise(col("vlo") * (col("higher") - col("pos")) +
              col("vhi") * (col("pos") - col("lower"))).as("q"))
      val psSql = QuantilePs.mkString("array(", ", ", ")")
      val approx = li.agg(
        expr(s"approx_percentile(CAST(${NumCols.head} AS DOUBLE), $psSql," +
          s" $Accuracy)").as(s"a__${NumCols.head}"),
        NumCols.tail.map(c =>
          expr(s"approx_percentile(CAST($c AS DOUBLE), $psSql, $Accuracy)")
            .as(s"a__$c")): _*)
        .select(expr(s"stack(${NumCols.size}, " +
          NumCols.map(c => s"'$c', a__$c").mkString(", ") +
          ") as (column_name, qs)"))
        .select(col("column_name"),
          posexplode(col("qs")).as(Seq("pi", "approx_q")))
        .select(col("column_name"),
          element_at(array(QuantilePs.map(lit): _*), col("pi") + 1).as("p"),
          col("approx_q"))
      exact.join(broadcast(approx), Seq("column_name", "p"))
        .select(col("column_name"), col("p"), col("q"),
          (col("approx_q") >= col("band_lo") &&
            col("approx_q") <= col("band_hi")).as("in_band"))
    },
    Some(NumCols.flatMap(c => QuantilePs.map(p => s"""
      SELECT '$c' AS column_name, CAST($p AS DOUBLE) AS p,
             quantile_cont(CAST($c AS DOUBLE), $p) AS q, TRUE AS in_band
      FROM lineitem""")).mkString(" UNION ALL ")))

  /** Categorical association: Pearson chi-square and Cramér's V between two
    * categorical columns (documents.lang × documents.source) — the "are these
    * dimensions independent?" profile a mixture designer checks before
    * stratifying on one of them.
    *
    * Scale shape: ONE groupBy over the corpus builds the contingency table
    * (|lang|·|source| cells — tiny); margins come from windows over that tiny
    * table, never a second corpus scan. Each chi-square term is computed from
    * exact integer counts via the rearrangement
    * (n·N − r·c)² / (r·c·N) — products stay < 2^63 at these scales and each
    * double division is a single operation, so the only float summation is
    * over the handful of cells (6-sig-digit safe).
    */
  val categoricalAssoc = GQuery(
    "prof5_categorical_assoc",
    (s, dir) => {
      val cells = Tables.load(s, dir, "documents")
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      val withMargins = cells
        .withColumn("r", sum(col("n")).over(Window.partitionBy(col("lang"))))
        .withColumn("c", sum(col("n")).over(Window.partitionBy(col("source"))))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy()))
      val term = pow(col("n") * col("tot") - col("r") * col("c"), 2) /
        ((col("r") * col("c")).cast("double") * col("tot").cast("double"))
      withMargins
        .agg(
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          first(col("tot")).as("n_docs"),
          sum(term).as("chi2"))
        .select(
          col("n_langs"), col("n_sources"), col("n_docs"),
          ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
          col("chi2"),
          sqrt(col("chi2") / (col("n_docs") *
            least(col("n_langs") - 1, col("n_sources") - 1)).cast("double"))
            .as("cramers_v"))
    },
    Some("""
      WITH cells AS (
        SELECT lang, source, COUNT(*) AS n
        FROM documents GROUP BY 1, 2),
      m AS (
        SELECT n,
               SUM(n) OVER (PARTITION BY lang) AS r,
               SUM(n) OVER (PARTITION BY source) AS c,
               SUM(n) OVER () AS tot,
               lang, source
        FROM cells),
      agg AS (
        SELECT COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               CAST(MIN(tot) AS BIGINT) AS n_docs,
               SUM(pow(CAST(n * tot - r * c AS DOUBLE), 2) /
                   (CAST(r * c AS DOUBLE) * CAST(tot AS DOUBLE))) AS chi2
        FROM m)
      SELECT n_langs, n_sources, n_docs,
             (n_langs - 1) * (n_sources - 1) AS dof, chi2,
             sqrt(chi2 / CAST(n_docs *
               least(n_langs - 1, n_sources - 1) AS DOUBLE)) AS cramers_v
      FROM agg"""))

  /** Fixed-width histogram of order totals in exact integer cents — the
    * mergeable scale path for prof4: at 100 TB `percentile` must hold every
    * value, while a 256-bin histogram is a constant-size, map-side-combinable
    * aggregate whose cumulative counts bound every quantile to one bin width.
    *
    * Scale shape: pass 1 computes min/max cents (tiny agg, broadcast back as
    * a 1-row relation); pass 2 buckets every row with pure integer math
    * ((cents−min)·256 div (range+1)) and groupBys the 256 uniform bucket ids
    * — partial aggregation does almost all the work map-side, and the
    * cumulative window runs over 256 rows on one partition. No floats
    * anywhere, so the histogram is bit-stable at any parallelism.
    */
  val histogramQuantiles = GQuery(
    "prof6_histogram_quantiles",
    (s, dir) => {
      val cents = Tables.load(s, dir, "orders")
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      val bounds = cents.agg(
        min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
      cents.crossJoin(broadcast(bounds))
        .select(expr("((cents - minc) * 256) div (maxc - minc + 1)")
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum_cnt",
          sum(col("cnt")).over(Window.orderBy(col("bucket"))))
    },
    Some("""
      WITH c AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
        FROM orders),
      b AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc FROM c),
      h AS (SELECT ((cents - minc) * 256) // (maxc - minc + 1) AS bucket,
                   COUNT(*) AS cnt
            FROM c, b GROUP BY 1)
      SELECT bucket, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum_cnt
      FROM h"""))

  /** Distribution drift between two cohorts of the same table — the
    * "did yesterday's batch shift under us" gate every production training
    * pipeline runs before mixing new data in. Cohorts here are the two
    * halves of lineitem by order-key parity (a stand-in for
    * yesterday/today); per numeric feature we histogram both cohorts on a
    * shared 10-bin integer grid and report total-variation distance and the
    * two-sample Kolmogorov–Smirnov statistic. PSI is deliberately NOT
    * emitted: its ln(p_cur/p_ref) term needs zero-bin smoothing whose
    * epsilon choice is a policy, not math — TV and KS are
    * smoothing-free and exact.
    *
    * Exactness: values quantize to integer centi-units, the bin id is pure
    * integer division on a min/max grid (prof6's construction), and both
    * statistics are computed as INTEGER cross-products
    * (|n_ref_bin·n_cur − n_cur_bin·n_ref|) summed/maxed in decimal(38,0) —
    * the only float op is each final division, so the oracle hash-matches
    * bit-for-bit. The decimal widening matters at scale: per-bin counts at
    * 100 TB are ~1e12 and the cross-products ~1e24, past int64.
    *
    * Scale shape: one scan explodes (feature, value) pairs (prof1's
    * unpivot), a 4-row bounds aggregate broadcasts back, and everything
    * after the (feature, bin) groupBy — ≤40 rows — is free. Histogram
    * counts partial-aggregate map-side on uniform keys; no sort, no
    * all-pairs, and the per-feature windows run over ≤10 rows each.
    */
  val distributionDrift = GQuery(
    "prof7_distribution_drift",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val feats = array(Seq(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
        struct(lit(c).as("feature"),
          (col(c).cast("decimal(18,2)") * 100).cast("long").as("vi"))): _*)
      val flat = li
        .select((col("l_orderkey") % 2).cast("int").as("grp"),
          explode(feats).as("f"))
        .select(col("grp"), col("f.feature").as("feature"),
          col("f.vi").as("vi"))
      val bounds = flat.groupBy(col("feature"))
        .agg(min(col("vi")).as("mn"), max(col("vi")).as("mx"))
      val counts = flat.join(broadcast(bounds), "feature")
        .select(col("feature"), col("grp"),
          expr("((vi - mn) * 10) div (mx - mn + 1)").as("bin"))
        .groupBy(col("feature"), col("bin"))
        .agg(
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_ref_bin"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_cur_bin"))
      val wf = Window.partitionBy(col("feature"))
      val wcum = wf.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = (c: Column) => c.cast("decimal(19,0)")
      val cums = counts
        .withColumn("cum_ref", sum(col("n_ref_bin")).over(wcum))
        .withColumn("cum_cur", sum(col("n_cur_bin")).over(wcum))
        .withColumn("n_ref", sum(col("n_ref_bin")).over(wf))
        .withColumn("n_cur", sum(col("n_cur_bin")).over(wf))
      cums.groupBy(col("feature"))
        .agg(
          max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          sum(abs(dec(col("n_ref_bin")) * dec(col("n_cur")) -
            dec(col("n_cur_bin")) * dec(col("n_ref")))).as("tv_num"),
          max(abs(dec(col("cum_ref")) * dec(col("n_cur")) -
            dec(col("cum_cur")) * dec(col("n_ref")))).as("ks_num"))
        .select(col("feature"), col("n_ref"), col("n_cur"),
          (col("tv_num").cast("double") /
            (lit(2.0) * col("n_ref") * col("n_cur"))).as("tv_dist"),
          (col("ks_num").cast("double") /
            (lit(1.0) * col("n_ref") * col("n_cur"))).as("ks_stat"))
    },
    Some("""
      WITH flat AS (
        SELECT l_orderkey % 2 AS grp, 'l_quantity' AS feature,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS vi
        FROM lineitem
        UNION ALL
        SELECT l_orderkey % 2, 'l_extendedprice',
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT l_orderkey % 2, 'l_discount',
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT l_orderkey % 2, 'l_tax',
               CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM lineitem),
      bounds AS (
        SELECT feature, MIN(vi) AS mn, MAX(vi) AS mx FROM flat GROUP BY 1),
      counts AS (
        SELECT f.feature, ((vi - mn) * 10) // (mx - mn + 1) AS bin,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ref_bin,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cur_bin
        FROM flat f JOIN bounds b ON f.feature = b.feature
        GROUP BY 1, 2),
      cums AS (
        SELECT *,
               CAST(SUM(n_ref_bin) OVER (PARTITION BY feature ORDER BY bin)
                    AS BIGINT) AS cum_ref,
               CAST(SUM(n_cur_bin) OVER (PARTITION BY feature ORDER BY bin)
                    AS BIGINT) AS cum_cur,
               CAST(SUM(n_ref_bin) OVER (PARTITION BY feature) AS BIGINT)
                 AS n_ref,
               CAST(SUM(n_cur_bin) OVER (PARTITION BY feature) AS BIGINT)
                 AS n_cur
        FROM counts)
      SELECT feature, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
             CAST(SUM(abs(CAST(n_ref_bin AS HUGEINT) * n_cur -
                          CAST(n_cur_bin AS HUGEINT) * n_ref)) AS DOUBLE) /
               (2.0 * MAX(n_ref) * MAX(n_cur)) AS tv_dist,
             CAST(MAX(abs(CAST(cum_ref AS HUGEINT) * n_cur -
                          CAST(cum_cur AS HUGEINT) * n_ref)) AS DOUBLE) /
               (1.0 * MAX(n_ref) * MAX(n_cur)) AS ks_stat
      FROM cums GROUP BY 1"""))

  /** Feature-vs-label association sweep: prof5's chi-square/Cramér's V for
    * EVERY candidate feature against one label (event_type), in one scan —
    * the feature-screening pass a modeling pipeline runs to rank which
    * columns carry signal before training anything. Features are derived
    * categorical views of the event stream (hour-of-day, value band, user
    * cohort); adding one costs an expression in the unpivot array, not a
    * pass.
    *
    * Scale shape: prof1's unpivot (one scan explodes (feature, level,
    * label) triples) into ONE (feature, level, label) groupBy — uniform
    * keys, map-side combine; margins and the chi-square reduce over the
    * contingency-cell relation, whose size is Σ levels × labels —
    * data-size-independent. Value bands are exact integer cents div, so
    * cell membership never floats.
    */
  val featureLabelAssoc = GQuery(
    "prof8_feature_label_assoc",
    (s, dir) => {
      val feats = array(
        struct(lit("hour_of_day").as("feature"),
          expr("cast((unix_millis(ts) div 3600000) % 24 as string)")
            .as("level")),
        struct(lit("value_band").as("feature"),
          expr("cast(cast(cast(value as decimal(18,2)) * 100 as bigint) div 5000 as string)")
            .as("level")),
        struct(lit("user_cohort").as("feature"),
          expr("cast(user_id % 5 as string)").as("level")))
      val cells = Tables.load(s, dir, "events")
        .select(col("event_type").as("label"), explode(feats).as("f"))
        .select(col("label"), col("f.feature").as("feature"),
          col("f.level").as("level"))
        .groupBy(col("feature"), col("level"), col("label"))
        .agg(count(lit(1)).as("n"))
      val withMargins = cells
        .withColumn("r", sum(col("n")).over(
          Window.partitionBy(col("feature"), col("level"))))
        .withColumn("c", sum(col("n")).over(
          Window.partitionBy(col("feature"), col("label"))))
        .withColumn("tot", sum(col("n")).over(
          Window.partitionBy(col("feature"))))
      val term = pow(col("n") * col("tot") - col("r") * col("c"), 2) /
        ((col("r") * col("c")).cast("double") * col("tot").cast("double"))
      withMargins
        .groupBy(col("feature"))
        .agg(
          countDistinct(col("level")).as("n_levels"),
          countDistinct(col("label")).as("n_labels"),
          first(col("tot")).as("n_events"),
          sum(term).as("chi2"))
        .select(
          col("feature"), col("n_levels"), col("n_labels"), col("n_events"),
          ((col("n_levels") - 1) * (col("n_labels") - 1)).as("dof"),
          col("chi2"),
          sqrt(col("chi2") / (col("n_events") *
            least(col("n_levels") - 1, col("n_labels") - 1)).cast("double"))
            .as("cramers_v"))
    },
    Some("""
      WITH flat AS (
        SELECT event_type AS label, 'hour_of_day' AS feature,
               CAST((epoch_ms(ts) // 3600000) % 24 AS VARCHAR) AS level
        FROM events
        UNION ALL
        SELECT event_type, 'value_band',
               CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
                    AS VARCHAR)
        FROM events
        UNION ALL
        SELECT event_type, 'user_cohort', CAST(user_id % 5 AS VARCHAR)
        FROM events),
      cells AS (
        SELECT feature, level, label, COUNT(*) AS n
        FROM flat GROUP BY 1, 2, 3),
      m AS (
        SELECT feature, n,
               SUM(n) OVER (PARTITION BY feature, level) AS r,
               SUM(n) OVER (PARTITION BY feature, label) AS c,
               SUM(n) OVER (PARTITION BY feature) AS tot
        FROM cells),
      agg AS (
        SELECT feature,
               (SELECT COUNT(DISTINCT level) FROM cells c2
                WHERE c2.feature = m.feature) AS n_levels,
               (SELECT COUNT(DISTINCT label) FROM cells c2
                WHERE c2.feature = m.feature) AS n_labels,
               CAST(MIN(tot) AS BIGINT) AS n_events,
               SUM(pow(CAST(n * tot - r * c AS DOUBLE), 2) /
                   (CAST(r * c AS DOUBLE) * CAST(tot AS DOUBLE))) AS chi2
        FROM m GROUP BY feature)
      SELECT feature, n_levels, n_labels, n_events,
             (n_levels - 1) * (n_labels - 1) AS dof, chi2,
             sqrt(chi2 / CAST(n_events *
               least(n_levels - 1, n_labels - 1) AS DOUBLE)) AS cramers_v
      FROM agg"""))

  /** prof9: concentration profile — Gini coefficient and top-decile share
    * of `value` per event type, the inequality/skew audit behind "is 1% of
    * the traffic carrying 90% of the volume" dashboards and the honest
    * companion to sk7's hash-bucket forecast (sk7 predicts shuffle skew;
    * this measures VALUE concentration, the business-level skew).
    *
    * Exact by design, like prof4: the Gini needs the values RANKED, so the
    * plan is one hash shuffle on event_type plus one per-group window sort
    * — the unavoidable cost of an exact Lorenz ordering. All accumulation
    * is decimal/integer (Σ x and Σ rank·x are exact; rank·x is a
    * decimal × bigint product), so the coefficient is a single double
    * expression over exact sums — bit-stable at any parallelism. At
    * 100 TB the drop-in is the sk5 sample-quantile Lorenz curve (bucketed
    * partial sums, no global sort); this operator is the ground truth it
    * is validated against, and the per-group sort spills gracefully (it's
    * Spark's external sort, not a single-partition collapse — gated below
    * by the no-SinglePartition plan check).
    */
  val giniConcentration = GQuery(
    "prof9_gini_concentration",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val ranked = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"),
          col("value").cast("decimal(18,6)").as("x"))
        .withColumn("i", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      ranked.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("i")).as("six"),
          sum(when(col("i") > expr("(nn * 9 + 9) div 10"), col("x")))
            .as("top_decile_sum"))
        .select(col("event_type"), col("n"),
          col("sx").cast("double").as("total_value"),
          (lit(2.0) * col("six").cast("double") /
            (col("n") * col("sx")).cast("double") -
            (col("n") + 1).cast("double") / col("n").cast("double"))
            .as("gini"),
          (col("top_decile_sum").cast("double") / col("sx").cast("double"))
            .as("top_decile_share"))
    },
    Some("""
      WITH ranked AS (
        SELECT event_type, CAST(value AS DECIMAL(18,6)) AS x,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS total_value,
             2.0 * CAST(SUM(x * i) AS DOUBLE)
               / CAST(COUNT(*) * SUM(x) AS DOUBLE)
               - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini,
             CAST(SUM(CASE WHEN i > (n * 9 + 9) // 10 THEN x END) AS DOUBLE)
               / CAST(SUM(x) AS DOUBLE) AS top_decile_share
      FROM ranked GROUP BY event_type"""))

  /** prof10: robust outlier census — median/MAD per event type and the
    * count of values outside median ± 3·1.4826·MAD (the robust z-score
    * gate: 1.4826·MAD estimates σ under normality but, unlike mean/stddev,
    * neither statistic is dragged by the outliers it is hunting). This is
    * the alerting profile for long-tailed metrics where prof1's moment
    * stats lie.
    *
    * Scale shape: exact MAD is unavoidably sequential — median, THEN the
    * deviation median, THEN the census — so the plan is three passes over
    * the (pushdown-pruned two-column) scan, each reducing to a ≤ |types|
    * relation that broadcasts back; nothing ever shuffles the data rows.
    * At 100 TB the drop-in is `approx_percentile` for both medians (same
    * plan, mergeable sketches, one pass per stage still) — prof4's
    * documented trade, reused. Both engines interpolate percentile
    * identically (the prof4 gate proves it), and the census threshold is
    * a single folded-constant double product, so the row counts are
    * deterministic.
    */
  val robustOutliers = GQuery(
    "prof10_robust_outliers",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("median"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("median")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          max(col("median")).as("median"),
          max(col("mad")).as("mad"),
          sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_ppm", expr("n_outliers * 1000000L div n"))
    },
    Some("""
      WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS median
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_type, e.value, m.median,
               abs(e.value - m.median) AS dev
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_type, COUNT(*) AS n,
             MAX(d.median) AS median, MAX(a.mad) AS mad,
             CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * a.mad
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * a.mad
                      THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
               AS outlier_ppm
      FROM dev d JOIN mad a USING (event_type)
      GROUP BY 1"""))

  /** prof11: categorical entropy profile — Shannon entropy and its
    * normalized form per categorical column, across two tables in one
    * output: the "how much signal does this column carry" number feature
    * selection and drift triage read first (a near-zero normalized entropy
    * means the column is almost constant; near-one means uniform).
    *
    * Identity used: H = log2(n) − (Σ c·log2 c)/n over value counts c —
    * one aggregate over the counts relation, no per-row p=c/n division.
    * Float discipline (the tx21 rule): each c·log2(c) term quantizes to
    * decimal(28,12) BEFORE the sum, so accumulation order cannot move the
    * result; the closing algebra is the same expression tree in both
    * engines. Scale shape: per table one unpivot scan (explode ×|cols|,
    * map-side) into one uniform (column, value) groupBy; the entropy
    * reduce runs over the value-count relation, bounded by distinct
    * values, not rows.
    */
  val entropyProfile = GQuery(
    "prof11_entropy_profile",
    (s, dir) => {
      def unpivot(df: DataFrame, table: String, cols: Seq[String]) =
        df.select(explode(array(cols.map(c =>
          struct(lit(table).as("table_name"), lit(c).as("column_name"),
            col(c).cast("string").as("v"))): _*)).as("p"))
          .select(col("p.*"))
      val pairs = unpivot(Tables.load(s, dir, "events"), "events",
          Seq("event_type"))
        .unionByName(unpivot(Tables.load(s, dir, "documents"), "documents",
          Seq("lang", "source")))
      val counts = pairs
        .groupBy(col("table_name"), col("column_name"), col("v"))
        .agg(count(lit(1)).as("c"))
      counts
        .groupBy(col("table_name"), col("column_name"))
        .agg(
          sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct"),
          sum((col("c").cast("double") * log2(col("c").cast("double")))
            .cast("decimal(28,12)")).as("sclc"))
        .withColumn("entropy_bits",
          log2(col("n").cast("double")) -
            col("sclc").cast("double") / col("n").cast("double"))
        .select(col("table_name"), col("column_name"), col("n"),
          col("n_distinct"), col("entropy_bits"),
          when(col("n_distinct") > 1,
            col("entropy_bits") / log2(col("n_distinct").cast("double")))
            .otherwise(lit(0.0)).as("normalized_entropy"))
    },
    Some("""
      WITH pairs AS (
        SELECT 'events' AS table_name, 'event_type' AS column_name,
               event_type AS v FROM events
        UNION ALL SELECT 'documents', 'lang', lang FROM documents
        UNION ALL SELECT 'documents', 'source', source FROM documents),
      counts AS (
        SELECT table_name, column_name, v, COUNT(*) AS c
        FROM pairs GROUP BY 1, 2, 3),
      aggd AS (
        SELECT table_name, column_name,
               CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS n_distinct,
               SUM(CAST(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                        AS DECIMAL(28,12))) AS sclc
        FROM counts GROUP BY 1, 2)
      SELECT table_name, column_name, n, n_distinct,
             log2(CAST(n AS DOUBLE)) - CAST(sclc AS DOUBLE) / CAST(n AS DOUBLE)
               AS entropy_bits,
             CASE WHEN n_distinct > 1
                  THEN (log2(CAST(n AS DOUBLE))
                        - CAST(sclc AS DOUBLE) / CAST(n AS DOUBLE))
                       / log2(CAST(n_distinct AS DOUBLE))
                  ELSE 0.0 END AS normalized_entropy
      FROM aggd"""))

  override def queries: Seq[GQuery] =
    Seq(numericProfile, categoricalProfile, zorderLayout, correlationMatrix,
      quantileProfile, approxQuantileProfile, categoricalAssoc,
      histogramQuantiles, distributionDrift,
      featureLabelAssoc, giniConcentration, robustOutliers, entropyProfile,
      layoutPruningAudit)
}
