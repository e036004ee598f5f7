package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) a DuckDB oracle equivalent.
  *
  * Oracle-comparison ground rules (the driver hash-compares values after
  * sorting columns by name):
  *   - column names must match exactly between the Spark result and the SQL;
  *   - no order-dependent floating point: sums/averages go through
  *     `decimal` casts (exact, associative) and only then to double;
  *   - result row-sets must be deterministic (unique keys or total ordering).
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[GQuery]
}
