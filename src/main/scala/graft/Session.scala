package graft

import org.apache.spark.sql.SparkSession

/** Single place where engine SparkSessions are configured.
  *
  * Scale notes (local[N] here, 1000-executor cluster in production):
  *   - `spark.sql.shuffle.partitions` is sized to the local core count; on a
  *     real cluster AQE coalesces post-shuffle partitions anyway.
  *   - AQE is left ON (Spark 4 default): runtime skew-join splitting and
  *     partition coalescing are exactly what we want at 100 TB.
  *   - `nanosAsLong`: the synthetic `events` table carries parquet
  *     TIMESTAMP(NANOS), which Spark cannot represent natively; we read it as
  *     Long and convert to micros in [[Tables.load]].
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

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
      .config("spark.sql.shuffle.partitions", cpus)
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
