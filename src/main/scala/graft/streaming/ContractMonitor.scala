package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract monitoring as ONE aggregation that runs unchanged over a
  * batch table or a structured stream — the "is this feed drifting out of
  * contract" dashboard behind every ingest. Value/null rules are
  * expressions (the dq1 discipline), so the per-rule violation counters
  * partial-aggregate map-side in batch and fold into tiny keyed state
  * (one row per rule) in streaming — state is rule-bounded, never
  * data-bounded, and no watermark is needed because counts are
  * associative.
  */
object ContractMonitor {

  /** Cumulative (rule, n_checked, n_violations, violation_ppm) for each
    * rule, where a rule is (name, violation predicate). Streaming: emit in
    * Complete/Update mode; the counters are running totals over everything
    * seen.
    */
  def summary(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.select(explode(array(rules.map { case (name, viol) =>
        struct(lit(name).as("rule"),
          when(viol, 1L).otherwise(0L).as("v"))
      }: _*)).as("r"))
      .groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_checked"),
        sum(col("r.v")).as("n_violations"))
      .withColumn("violation_ppm",
        expr("n_violations * 1000000L div n_checked"))

  /** The lineitem value rules dq1 gates on — shared so the streaming
    * monitor and the batch contract suite can never drift apart.
    */
  def lineitemRules: Seq[(String, Column)] = Seq(
    "lineitem.quantity_in_1_50" -> !col("l_quantity").between(1, 50),
    "lineitem.discount_le_5pct" -> (col("l_discount") > 0.05),
    "lineitem.quantity_le_45" -> (col("l_quantity") > 45),
    "lineitem.shipdate_not_null" -> col("l_shipdate").isNull,
    "lineitem.extendedprice_positive" -> (col("l_extendedprice") <= 0))
}
