package graft.sinks

import graft.functions.Morton
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ordered parquet writer: the write-path half of the z1 layout operator.
  * Rows are laid out along the Morton curve of two dimensions so every
  * output file is tight in BOTH dimensions — parquet min/max footer stats
  * then prune most files for a predicate on EITHER dimension (the
  * multi-dimensional generalization of partitioning by one column).
  *
  * Plan shape at scale: one range exchange on the curve position (Spark
  * samples the zval distribution to build balanced range bounds — no
  * driver-side histogram pass), a per-partition sort, and a parallel write.
  * Nothing else: the curve position itself is per-row bit math on the scan.
  */
object LayoutWriter {

  /** Write `df` into `nFiles` z-ordered parquet files at `path`. The two
    * dimension columns must be non-negative longs; they are masked into the
    * curve's 16-bit domain here (callers with wider domains pre-scale —
    * quantile-bucketing each dim to 2^16 ranks keeps the curve dense).
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column,
                    nFiles: Int, path: String): Unit = {
    val z = Morton.z16(pmod(x, lit(65536L)), pmod(y, lit(65536L)))
    df.withColumn("__zval", z)
      .repartitionByRange(nFiles, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
      .write.mode("overwrite").parquet(path)
  }
}
