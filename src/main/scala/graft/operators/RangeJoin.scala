package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed proximity (interval/range) join — pairs of rows whose event
  * times fall within `tolerance` of each other, optionally sharing equi-join
  * keys. Spark has no native band-join strategy: a plain
  * `ON keys AND abs(lt - rt) <= tol` plan degenerates to a (broadcast)
  * nested-loop join over the key groups — quadratic work and, with big
  * sides, an un-runnable cross product at 100 TB.
  *
  * == Plan: bucketed band join ==
  * Quantize both sides' times into buckets of width `tolerance`; any
  * qualifying pair (|lt - rt| <= tol) lands in the same or an adjacent
  * bucket, so:
  *
  *   1. the PROBE (left) side replicates each row to its bucket and both
  *      neighbors (3x explode of the slim join columns);
  *   2. the BUILD (right) side keeps its single exact bucket;
  *   3. shuffle-equi-join on (keys..., bucket) — a plain hash join Catalyst
  *      and AQE treat like any other (broadcastable small side, skew split);
  *   4. re-filter on the exact predicate |lt - rt| <= tol.
  *
  * Each qualifying pair appears EXACTLY once (the right row's bucket matches
  * exactly one of the left row's three expanded buckets), so no distinct
  * pass is needed. Cost: 3x|L| + |R| shuffled rows instead of the
  * sum-of-squares of the key-group sizes.
  *
  * The reference engine has no joins at all (SURVEY.md §2.5 — ABSENT); this
  * is part of the beyond-reference relational surface.
  */
object RangeJoin {

  private val BucketCol = "__range_bucket"

  /** Inner proximity join: all (left row, right row) pairs with equal `keys`
    * and `abs(leftTime - rightTime) <= tolerance`.
    *
    * Column names (other than `keys`) must be disjoint between the sides;
    * both time columns are kept in the output. Left-outer shapes are a
    * per-query aggregation away (count pairs, left-join counts back).
    *
    * @param toleranceMicros band half-width in microseconds; both time
    *                        columns must be TIMESTAMP (micros precision)
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, "tolerance must be positive")
    val collisions = left.columns.toSet
      .intersect(right.columns.toSet)
      .diff(keys.toSet)
    require(collisions.isEmpty,
      s"non-key columns collide between sides: ${collisions.mkString(", ")}")

    def bucketOf(t: String): Column =
      floor(unix_micros(col(t)) / toleranceMicros)

    // floor() handles pre-epoch negatives correctly (floor, not truncation)
    val probe = left.withColumn(BucketCol,
      explode(array(bucketOf(leftTime) - 1, bucketOf(leftTime), bucketOf(leftTime) + 1)))
    val build = right.withColumn(BucketCol, bucketOf(rightTime))

    probe
      .join(build, keys :+ BucketCol)
      .filter(abs(unix_micros(col(leftTime)) - unix_micros(col(rightTime)))
        <= toleranceMicros)
      .drop(BucketCol)
  }
}
