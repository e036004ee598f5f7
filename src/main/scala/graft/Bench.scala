package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get("graft-bench")
    // optional args = subset of query names to run (iteration aid)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // warm the JVM/codegen/catalog paths once so first-query timings measure
    // the query, not process startup: a trivial agg (codegen), the parquet
    // catalog, the per-session fixture raw-relation caches (the staged
    // source table every block query starts from), and the cached
    // StreamBlock schema derivation
    try {
      spark.range(16).selectExpr("sum(id)").count()
      Tables.load(spark, sfDir, "documents").limit(1).count()
      val t = graft.blocks.FixtureSource.DefaultTemplates
      graft.blocks.FixtureSource.blocksRaw(spark, t, 2270370L, 2270469L).count()
      graft.blocks.FixtureSource.combinedRaw(spark, t, 2270370L).count()
      graft.sinks.BlockSinks.streamBlockSchema(spark)
    } catch { case _: Throwable => () }
    // baseline cache set = the shared fixture relations warmed above; any
    // persist() created INSIDE a query (dd2/dd4/dd10/pipe1/sim7 build sides)
    // is freed after that query so storage memory doesn't accumulate dead
    // cache across the ~85-query sweep (matters most on contended hosts)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // streaming envelope vs BASELINE.md: backfill blocks/s (reference
    // implies tens/s at concurrency 16) and per-block processing latency
    // (must sit far under the 6 s/block live rate). Measured through the
    // real micro-batch connector + noop sink, full-schema rows.
    val streaming = if (args.nonEmpty) "" else {
      try {
        import org.apache.spark.sql.streaming.Trigger
        val t = graft.blocks.FixtureSource.DefaultTemplates
        def drain(maxPerTrigger: Int): (Double, Int) = {
          val t0 = System.nanoTime()
          val q = spark.readStream.format("blockfeed")
            .option("path", t)
            .option("from", "2270370").option("to", "2270469")
            .option("maxHeightsPerTrigger", maxPerTrigger.toString).load()
            .writeStream.format("noop")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination(300000)
          ((System.nanoTime() - t0) / 1e9, q.recentProgress.length)
        }
        val (backfillSecs, _) = drain(40) // 100 blocks, multi-batch backfill
        // live shape: 10 single-block triggers over the last 10 heights
        val t0 = System.nanoTime()
        val live = spark.readStream.format("blockfeed")
          .option("path", t)
          .option("from", "2270460").option("to", "2270469")
          .option("maxHeightsPerTrigger", "1").load()
          .writeStream.format("noop")
          .trigger(Trigger.AvailableNow()).start()
        live.awaitTermination(300000)
        val liveSecs = (System.nanoTime() - t0) / 1e9
        val backfillRate = 100.0 / backfillSecs
        val perBlock = liveSecs / 10.0
        s""","streaming":{"backfill_blocks_per_sec":$backfillRate,""" +
          s""""per_block_latency_sec":$perBlock,""" +
          s""""baseline_backfill_blocks_per_sec":30,"baseline_block_interval_sec":6}"""
      } catch { case _: Throwable => "" }
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$streaming}""")
    spark.stop()
  }
}
