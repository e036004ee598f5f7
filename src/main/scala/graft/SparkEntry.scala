package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator packs, each a set of (Spark impl, DuckDB oracle) pairs. */
  def packs: Seq[QueryPack] = Seq(
    graft.queries.Relational,
    graft.queries.Blocks,
    graft.queries.Windows,
    graft.queries.Sinks,
    graft.queries.Text,
    graft.queries.Dedup,
    graft.queries.Multimodal,
    graft.queries.Similarity,
    graft.queries.Profiling,
    graft.queries.Sampling,
    graft.queries.Graph,
    graft.queries.Cdc,
    graft.queries.Quality,
    graft.queries.Sketches,
    graft.queries.EntityResolution,
    graft.queries.TimeSeries,
    graft.queries.Experiments,
    graft.queries.StreamGate)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Pricing.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.queries).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
