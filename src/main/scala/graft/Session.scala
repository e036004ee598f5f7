package graft

import org.apache.spark.sql.SparkSession

/** Single place where engine SparkSessions are configured.
  *
  * Scale notes (local[N] here, 1000-executor cluster in production):
  *   - `spark.sql.shuffle.partitions` is a FIXED default (32), decoupled
  *     from the core count (r15; it was `= cpus` through r14). Task count
  *     per stage must be a function of DATA SIZE, not of how many cores the
  *     host happens to expose: r14's driver measured the full sf0.1 sweep
  *     FASTER at 8 cores than at 32 purely because every stage's task count
  *     (and every streaming gate's state-partition count) scaled with the
  *     core count while the per-task payload stayed kilobytes. The initial
  *     value is a pre-AQE ceiling only — AQE re-sizes the reduce side by
  *     bytes (below); production raises the env to O(cluster cores) so the
  *     ceiling never binds at 100 TB.
  *   - AQE is left ON (Spark 4 default): runtime skew-join splitting and
  *     partition coalescing are exactly what we want at 100 TB.
  *   - `coalescePartitions.parallelismFirst` stays at Spark's default
  *     (true): an r15 ABAB subset A/B measured `false` (coalesce toward the
  *     64 MB advisory size) over-serializing the compute-bound small
  *     shuffles of the graph pack (g4 4.6 → 5.9 s, its ~10 s of real join
  *     work squeezed onto one post-coalesce partition), while the default's
  *     1 MB floor already coalesces the kilobyte shuffles to one task and
  *     gives the 1–20 MB ones byte-proportional parallelism. At 100 TB
  *     partitions are far above the floor either way; the env hook below
  *     lets a cluster profile re-measure the flip without a rebuild.
  *   - `canChangeCachedPlanOutputPartitioning=true`: the iterative packs
  *     (graph, dd) persist hash-partitioned relations; without this flag a
  *     cached plan keeps its pre-AQE partition count (= the shuffle ceiling,
  *     32) and every downstream stage inherits it — g1 measured 533 tasks
  *     for kilobyte iterations. With it, cached relations coalesce by bytes
  *     like everything else (results are partitioning-independent; the
  *     oracle re-verified 223/223 under the flip).
  *   - `nanosAsLong`: the synthetic `events` table carries parquet
  *     TIMESTAMP(NANOS), which Spark cannot represent natively; we read it as
  *     Long and convert to micros in [[Tables.load]].
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // band-join predicates (`abs(l - r) <= tol`) rewrite to bucketed hash
      // joins — see graft.plans.BandJoinRewrite
      .withExtensions(graft.plans.BandJoinRewrite.extension)
      // physical sort-merge as-of join — see graft.plans.AsofJoinPlan
      .withExtensions(graft.plans.AsofJoinPlan.extension)
      // thresholded levenshtein predicates run the banded O(k·n) DP
      .withExtensions(graft.plans.LevenshteinBandRewrite.extension)
      // edit-distance JOINS gain the implied length-band blocking key,
      // which BandJoinRewrite then turns into a bucketed hash join
      .withExtensions(graft.plans.LevenshteinJoinBlocking.extension)
      // the native dedup/similarity kernels as SQL functions
      // (graft_poly_hash, graft_minhash_sig, ...) — see GraftFunctions
      .withExtensions(graft.functions.GraftFunctions.extension)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // env hooks exist so a controlled A/B can flip either knob ("false"/
      // "false" restores the measured-and-rejected variants) without a rebuild
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_PLAN_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The reference is null-lenient everywhere (decode/cast failures → null
      // or a default, never a query failure) — non-ANSI mode mirrors that.
      .config("spark.sql.ansi.enabled", "false")
      // Kotlin `associate` keeps the LAST value on duplicate map keys
      // (`models/Extensions.kt:188`); match it for attribute maps.
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
