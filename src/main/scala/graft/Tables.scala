package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and resolve tables through here so
  * the same code runs at any scale factor. Parquet scans get predicate
  * pushdown + column pruning from Catalyst automatically; at cluster scale the
  * same loader works on object-store paths because nothing below assumes
  * local files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): read as Long (nanosAsLong=true,
    // set in Session) and truncate to micros. `div` is integral division —
    // a double division would lose precision above 2^53 ns (~1970+104 days).
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register all tables as temp views named after themselves, so queries can
    * be written in SQL when that is clearer than the DataFrame API.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
