package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join — an operator Spark lacks natively.
  *
  * For each left row, attach the payload of the right row with the greatest
  * `rightTime <= leftTime` (strict `<` when `inclusive = false`) within the
  * same key group; left rows with no qualifying right row keep NULL payload
  * (left-outer semantics). This is the "most recent fact at or before this
  * instant" join: trade attribution, slowly-changing-dimension lookup,
  * sensor alignment.
  *
  * The reference engine has no join operators at all (SURVEY.md §2.5 —
  * ABSENT); this is part of the beyond-reference relational surface.
  *
  * == Why not a range join ==
  * The naive formulation — `l JOIN r ON keys AND r.t <= l.t`, then keep the
  * max `r.t` per left row — materializes O(|L| x matches) candidate pairs
  * before pruning; against an unbounded history side that is quadratic and
  * un-runnable at 100 TB.
  *
  * == Plan ==
  * Instead we run the classic distributed merge-join formulation in one
  * shuffle with zero join:
  *
  *   1. union-tag both sides on a common schema (left columns + a single
  *      right-payload STRUCT, NULL on left rows);
  *   2. one shuffle: `Window.partitionBy(keys).orderBy(time, side)`;
  *   3. `last(payload, ignoreNulls = true)` over rows
  *      `(unboundedPreceding, currentRow)` propagates the most recent right
  *      payload to every left row;
  *   4. keep left rows, expand the struct.
  *
  * Cost: shuffle of |L| + |R| rows on the keys, a per-partition sort, no
  * candidate blow-up — the same data movement a co-partitioned sort-merge
  * join would do. The payload travels as ONE struct so all its fields come
  * from the SAME right row even when individual fields are NULL.
  *
  * Ties: at equal timestamps the right row sorts before the left row when
  * `inclusive` (so it is visible to it) and after it when not.
  *
  * Skew note: a single hot key serializes into one task like any
  * key-partitioned window; if one key dominates, pre-split by coarse time
  * chunk (carrying the last payload of chunk N-1 into chunk N) — not needed
  * for the synthetic key distributions here.
  */
object AsofJoin {

  private val SideCol = "__asof_side"
  private val TimeCol = "__asof_t"
  private val PayloadCol = "__asof_payload"

  /** @param keys       equi-join key columns, present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right` (kept in the output);
    *                   must not collide with a left column name
    * @param inclusive  whether a right row at exactly `leftTime` matches
    * @param tolerance  max lookback: right rows older than
    *                   `leftTime - tolerance` are discarded (payload NULLed)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      inclusive: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTime, rightTime, inclusive, tolerance,
      forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` (strict `>` when `inclusive = false`) in the
    * key group — "next fact at or after this instant" (next fill after an
    * order, next error after a deploy). Same single-shuffle union+window
    * plan as [[backward]], traversed in reverse time order; `tolerance`
    * bounds the look-AHEAD instead of the look-back.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      inclusive: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTime, rightTime, inclusive, tolerance,
      forward = true)

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): for each
    * left row, the right row minimizing `|rightTime − leftTime|` within the
    * key group, bounded by `tolerance` on BOTH sides when given. Ties
    * (equal distance) resolve to the BACKWARD candidate; among right rows
    * sharing the winning timestamp the lexicographically smallest payload
    * wins (so an oracle ordering by `(|Δ|, rt, id…)` matches exactly).
    * Inclusive semantics only: a right row at exactly `leftTime` is the
    * backward candidate at distance zero.
    *
    * Plan: the SAME single union+shuffle as backward/forward, but both
    * brackets come out of one partitioning — `last(payload) ignore nulls`
    * over the preceding frame and `first(payload) ignore nulls` over the
    * following frame (the tsr2 bracketing idiom), then a per-row distance
    * comparison picks the side. Two in-partition sort orders (the forward
    * bracket needs ascending payload ties), still one exchange, zero Join
    * nodes, no candidate blow-up.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None): DataFrame = {
    val payloadCols = right.columns.toSeq.filterNot(keys.contains)
    require(payloadCols.contains(rightTime),
      s"right side must carry its time column $rightTime")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")
    val (leftSide, rightSide) = (1, 0) // inclusive: right visible at equal t
    val leftTagged = left
      .withColumn(TimeCol, col(leftTime))
      .withColumn(SideCol, lit(leftSide))
      .withColumn(PayloadCol, lit(null).cast(
        org.apache.spark.sql.types.StructType(payloadCols.map(right.schema(_)))))
    val rightTagged = right
      .withColumn(TimeCol, col(rightTime))
      .withColumn(SideCol, lit(rightSide))
      .withColumn(PayloadCol, struct(payloadCols.map(col): _*))
      .select(leftTagged.columns.map(c =>
        if (rightTagged0Has(left, keys, c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TimeCol).asc, col(SideCol).asc, col(PayloadCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TimeCol).asc, col(SideCol).asc, col(PayloadCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bCol = "__asof_b"
    val fCol = "__asof_f"
    def dist(p: String, fwd: Boolean): Column =
      if (fwd) col(s"$p.$rightTime").cast("double") - col(TimeCol).cast("double")
      else col(TimeCol).cast("double") - col(s"$p.$rightTime").cast("double")
    val bracketed = leftTagged.unionByName(rightTagged)
      .withColumn(bCol, last(col(PayloadCol), ignoreNulls = true).over(wB))
      .withColumn(fCol, first(col(PayloadCol), ignoreNulls = true).over(wF))
      .filter(col(SideCol) === leftSide)
    val tolled = tolerance match {
      case Some(tol) => bracketed
        .withColumn(bCol,
          when(dist(bCol, fwd = false) <= tol.cast("double"), col(bCol)))
        .withColumn(fCol,
          when(dist(fCol, fwd = true) <= tol.cast("double"), col(fCol)))
      case None => bracketed
    }
    val chosen = tolled.withColumn(PayloadCol,
      when(col(bCol).isNull, col(fCol))
        .when(col(fCol).isNull, col(bCol))
        .when(dist(fCol, fwd = true) < dist(bCol, fwd = false), col(fCol))
        .otherwise(col(bCol)))
    val expanded = payloadCols.foldLeft(chosen) { (df, c) =>
      df.withColumn(c, col(s"$PayloadCol.$c"))
    }
    expanded.drop(TimeCol, SideCol, PayloadCol, bCol, fCol)
  }

  private def run(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      inclusive: Boolean,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val payloadCols = right.columns.toSeq.filterNot(keys.contains)
    require(payloadCols.contains(rightTime),
      s"right side must carry its time column $rightTime")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")

    // Right rows sort before left rows at equal time iff inclusive.
    val (leftSide, rightSide) = if (inclusive) (1, 0) else (0, 1)

    val leftTagged = left
      .withColumn(TimeCol, col(leftTime))
      .withColumn(SideCol, lit(leftSide))
      .withColumn(PayloadCol, lit(null).cast(
        org.apache.spark.sql.types.StructType(payloadCols.map(right.schema(_)))))
    val rightTagged = right
      .withColumn(TimeCol, col(rightTime))
      .withColumn(SideCol, lit(rightSide))
      .withColumn(PayloadCol, struct(payloadCols.map(col): _*))
      .select(keys.map(col) ++ Seq(col(TimeCol), col(SideCol), col(PayloadCol)): _*)
      // align to the left schema: left's own columns are NULL on right rows
      .select(leftTagged.columns.map(c =>
        if (rightTagged0Has(left, keys, c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Forward = the same most-recent-seen-payload pass over reversed time:
    // "earliest at-or-after" is "latest at-or-before" under time reversal.
    // The tie rule is direction-independent (right visible at equal time
    // iff inclusive), so SideCol always sorts ascending. The payload struct
    // is the FINAL sort key so equal-timestamp right rows have a total,
    // partitioning-independent order — `last` then deterministically picks
    // the LEXICOGRAPHICALLY SMALLEST payload (descending sort ⇒ it lands
    // last), matching an oracle that breaks ties by `ORDER BY rt, id…`.
    val timeOrder = if (forward) col(TimeCol).desc else col(TimeCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col(SideCol).asc, col(PayloadCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = leftTagged.unionByName(rightTagged)
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === leftSide)

    val bounded = tolerance match {
      case Some(tol) =>
        val staleness =
          if (forward)
            col(s"$PayloadCol.$rightTime").cast("double") - col(TimeCol).cast("double")
          else
            col(TimeCol).cast("double") - col(s"$PayloadCol.$rightTime").cast("double")
        joined.withColumn(PayloadCol,
          when(staleness <= tol.cast("double"), col(PayloadCol)))
      case None => joined
    }

    val expanded = payloadCols.foldLeft(bounded) { (df, c) =>
      df.withColumn(c, col(s"$PayloadCol.$c"))
    }
    expanded.drop(TimeCol, SideCol, PayloadCol)
  }

  /** Does tagged column `c` exist on right rows (a key or one of the
    * synthetic columns), as opposed to a left-only data column?
    */
  private def rightTagged0Has(left: DataFrame, keys: Seq[String], c: String): Boolean =
    keys.contains(c) || c == TimeCol || c == SideCol || c == PayloadCol

  /** Backward as-of join on the dedicated physical operator
    * ([[graft.plans.AsofJoinExec]]): same semantics as [[backward]] (minus
    * `tolerance`), executed as a co-partitioned sort-merge pass instead of
    * the union+window plan — one shuffle per SIDE, O(1) merge state, no
    * unioned window buffer. Requires [[graft.plans.AsofJoinPlan.extension]]
    * on the session (graft.Session registers it).
    */
  def merge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{GraftColumn, GraftPlans}
    val collisions = right.columns.toSeq.filterNot(keys.contains).toSet
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")
    // fresh exprIds on the right side so self-as-of (both sides derived from
    // the same source) cannot alias the same attributes
    val r2 = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lp = GraftPlans.logical(left)
    val rp = GraftPlans.logical(r2)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n)
      .getOrElse(sys.error(s"no column $n in ${p.output.map(_.name)}"))
    val lt = attr(lp, leftTime)
    val rt = attr(rp, rightTime)
    require(lt.dataType == rt.dataType,
      s"time columns must share a type: ${lt.dataType} vs ${rt.dataType}")
    keys.foreach { k =>
      require(attr(lp, k).dataType == attr(rp, k).dataType,
        s"key $k type mismatch")
    }
    val node = graft.plans.AsofJoinNode(lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)), lt, rt, inclusive)
    val df = GraftPlans.ofRows(left.sparkSession, node)
    // the right side's key copies are redundant in the output
    keys.map(attr(rp, _)).foldLeft(df)((d, a) => d.drop(GraftColumn.of(a)))
  }
}
