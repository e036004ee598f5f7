package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ab1 experiment readout as ONE aggregation that runs unchanged over a
  * batch relation or a structured stream of per-user metric rows (the shape
  * an experimentation platform actually has live: a user's metric arrives
  * when their session/attribution window closes).
  *
  * State is VARIANT-bounded — two rows of (n, Σm, Σm²) — never
  * user-bounded: count and the two moment sums are associative, so they
  * partial-aggregate map-side in batch and fold into tiny keyed state in
  * streaming (Complete/Update mode, no watermark needed). The variance and
  * mean are derived per emission from the exact sums, the same
  * moments-then-algebra discipline as the batch pack. Structurally SHARED
  * with [[graft.queries.Experiments]].variantMetrics (ab1 calls this
  * function), so dashboard and nightly batch can never drift apart.
  */
object StreamingAb {

  /** Input: rows of (variant, m) where m is the per-user metric as
    * decimal(18,6) (re-bounded — see Experiments.userMetric's width note).
    * Output: one row per variant with user count, mean, sample variance.
    */
  def moments(users: DataFrame): DataFrame =
    users.groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("m")).cast("double").as("sm"),
        sum(col("m") * col("m")).cast("double").as("smm"))
      .select(col("variant"), col("n_users"),
        (col("sm") / col("n_users")).as("mean_metric"),
        ((col("n_users") * col("smm") - col("sm") * col("sm")) /
          (col("n_users").cast("double") * (col("n_users") - 1)))
          .as("var_metric"))
}
