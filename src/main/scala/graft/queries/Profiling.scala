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
    * pass. At 100 TB the exact COUNT(DISTINCT) per column is the one
    * expensive term (Spark expands it to per-column shuffles); the swap-in is
    * `approx_count_distinct` (HLL, one pass, mergeable) — kept exact here so
    * the oracle checks values, with the HLL variant covered in ApproxAggSpec.
    */
  val numericProfile = GQuery(
    "prof1_numeric_profile",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: NumCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max")))
      val one = li.agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${NumCols.size}, " + NumCols.map(c =>
        s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max")
        .mkString(", ") +
        ") as (column_name, n_nulls, n_distinct, min_value, max_value)"
      one.select(col("n_rows"), expr(stackExpr))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
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

  /** Exact interpolated quantiles (p1/p25/p50/p75/p99) for every numeric
    * column in ONE aggregate — the distribution half of the profile that
    * prof1's min/max can't see (skew, heavy tails, discretization). Kept
    * EXACT here so the oracle checks values (DuckDB `quantile_cont` and
    * Spark `percentile` share the p·(n−1) interpolation definition); at
    * 100 TB the drop-in is `approx_percentile` — a bounded, mergeable
    * sketch with the same output shape — whose tolerance-equivalence is
    * asserted in SqlSurfaceSpec.
    */
  val quantileProfile = GQuery(
    "prof4_exact_quantiles",
    (s, dir) => {
      val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
      val psSql = ps.mkString("array(", ", ", ")")
      val li = Tables.load(s, dir, "lineitem")
      val one = li.agg(
        expr(s"percentile(CAST(${NumCols.head} AS DOUBLE), $psSql)")
          .as(s"q__${NumCols.head}"),
        NumCols.tail.map(c =>
          expr(s"percentile(CAST($c AS DOUBLE), $psSql)").as(s"q__$c")): _*)
      val stackExpr = s"stack(${NumCols.size}, " +
        NumCols.map(c => s"'$c', q__$c").mkString(", ") +
        ") as (column_name, qs)"
      one.select(expr(stackExpr))
        .select(col("column_name"), posexplode(col("qs")).as(Seq("pos", "q")))
        .select(col("column_name"),
          element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
          col("q"))
    },
    Some(NumCols.flatMap(c => Seq(0.01, 0.25, 0.5, 0.75, 0.99).map(p => s"""
      SELECT '$c' AS column_name, CAST($p AS DOUBLE) AS p,
             quantile_cont(CAST($c AS DOUBLE), $p) AS q
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

  override def queries: Seq[GQuery] =
    Seq(numericProfile, categoricalProfile, zorderLayout, correlationMatrix,
      quantileProfile, categoricalAssoc, histogramQuantiles)
}
