package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles.
  *
  * AQE's runtime skew-join splitting (on by default, see [[graft.Session]])
  * handles most skew transparently; explicit salting remains the tool for
  * the cases AQE cannot fix — a hot key inside a hash aggregation, or a
  * skewed build side that must stay a shuffle join. Both helpers are pure
  * plan rewrites: deterministic, no RDDs, no sampling pass.
  */
object Salt {

  /** Salted equi-join: left rows get a deterministic pseudo-random salt in
    * `[0, n)`; the right side is replicated n-fold (one copy per salt) so
    * every (key, salt) pair still meets its match. A hot left key spreads
    * over n shuffle partitions at the cost of an n× blow-up of the right
    * side — use when the right side is small-ish but too big (or too skewed)
    * to broadcast outright.
    *
    * `saltBy` must be a left-side expression that varies within a key group
    * (a row id, an event id) — salting by a constant would keep the hot key
    * on one partition.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int,
                 saltBy: Column): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(saltBy), lit(n)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: partial-aggregate by (key, salt), then
    * final-aggregate by key. Spark's map-side partial aggregation already
    * combines within a task; the explicit salt additionally splits a hot
    * key's REDUCE work across n reducers. Aggregates must be algebraic
    * (expressible as partial + merge), e.g. counts/sums.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column, n: Int,
                     saltBy: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltBy), lit(n)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
}
