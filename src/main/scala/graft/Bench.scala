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
    // Host-calibration probe (SCALE.md "bench book"): the sf0.1 sweep is
    // STRONGLY load-sensitive (identical code has measured 173 s idle vs
    // 2602 s inside a co-tenant slow phase) — a fixed, pinned micro-workload
    // run before, mid-sweep and after turns any loaded run into readable
    // evidence: dilation = probe_time / pinned_idle_time, normalized_total
    // = total / dilation. The three axes, their rationale and the pinned
    // idle costs live in [[Probes]] — ONE definition shared with the
    // standalone HostProbe quiet-check so the two stay comparable.
    // Probe failures emit -1 and never fail the bench.
    import graft.{Probes => P}
    def loadAvg: Double = P.loadAvg
    def probe(): (Double, Double, Double) = P.all(spark)
    // full sweeps only: a subset run is the documented ITERATION aid, and
    // ~10 s of fixed probe cost per cycle would triple a 3-s query's loop
    // for a dilation number a 1-query subset rarely needs (run the full
    // bench when calibration matters); probeOn also gates the mid/after
    // pairs and the emitted dilation below
    val probeOn = args.isEmpty
    if (probeOn) P.warm(spark)
    val load1mStart = loadAvg
    val (spinBefore, shufBefore, latBefore) =
      if (probeOn) probe() else (-1.0, -1.0, -1.0)
    // any persist() created INSIDE a query (dd2/dd4/dd10/pipe1/sim7 build
    // sides) is freed after that query so storage memory doesn't accumulate
    // across the sweep; the shared per-session fixture relations are kept.
    // r14: the sweep moved from rdd.unpersist() (which left the
    // CacheManager REGISTRATION behind, silently turning every later
    // same-canonical-plan persist into a dead no-op — er3/er4 after er2,
    // dd8/dd16 after dd7 recomputed their CC edge cache through a dead
    // InMemoryRelation every round) to GraftCaches.sweepExcept, which
    // removes registration + blocks together so re-persists work.
    // per-query START offsets (sec since sweep start) ride along in the full
    // JSON: the first probed run showed a phase can begin MID-sweep
    // (probe-before 1.7 s vs probe-after 8.6 s), and offsets let a reader
    // localize exactly which queries ran inside it instead of discarding
    // the whole run
    val sweepT0 = System.nanoTime()
    val starts = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // one mid-sweep probe pair triples the phase-detection resolution; -1
    // until the midpoint passes (subset runs may be a single query)
    var spinMid = -1.0
    var shufMid = -1.0
    var latMid = -1.0
    val mid = if (probeOn) selected.size / 2 else 0
    var qIndex = 0
    val results = selected.map { case (name, fn) =>
      if (qIndex == mid && mid > 0) {
        val (s, h, l) = probe(); spinMid = s; shufMid = h; latMid = l
      }
      qIndex += 1
      starts(name) = (System.nanoTime() - sweepT0) / 1e9
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftCaches.sweepExcept(spark,
        graft.blocks.FixtureSource.cachedFrames)
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
        // a drain that does not finish must DROP the whole streaming
        // envelope (the outer catch), not record 100/300s as a throughput —
        // and must not leave a query running when a stub is stopped
        def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
                        what: String): Unit =
          if (!q.awaitTermination(300000)) {
            q.stop(); sys.error(s"$what drain did not finish in 300s")
          }
        def drain(maxPerTrigger: Int): (Double, Int) = {
          val t0 = System.nanoTime()
          val q = spark.readStream.format("blockfeed")
            .option("path", t)
            .option("from", "2270370").option("to", "2270469")
            .option("maxHeightsPerTrigger", maxPerTrigger.toString).load()
            .writeStream.format("noop")
            .trigger(Trigger.AvailableNow()).start()
          awaitOrFail(q, "file backfill")
          ((System.nanoTime() - t0) / 1e9, q.recentProgress.length)
        }
        def drainLive(path: String): Double = {
          // live shape: 10 single-block triggers over the last 10 heights
          val t0 = System.nanoTime()
          val live = spark.readStream.format("blockfeed")
            .option("path", path)
            .option("from", "2270460").option("to", "2270469")
            .option("maxHeightsPerTrigger", "1").load()
            .writeStream.format("noop")
            .trigger(Trigger.AvailableNow()).start()
          awaitOrFail(live, "live latency")
          (System.nanoTime() - t0) / 1e9 / 10.0
        }
        val (backfillSecs, _) = drain(40) // 100 blocks, multi-batch backfill
        val perBlock = drainLive(t)
        // the same backfill through the gRPC transport (loopback HTTP/2
        // stub node serving hand-encoded proto): per-height GetBlockByHeight
        // fetches through the pooled connection, stream-per-RPC
        val grpcBackfill = {
          val stub = new StubGrpcServer(t)
          try {
            val t0 = System.nanoTime()
            val q = spark.readStream.format("blockfeed")
              .option("path", stub.base)
              .option("from", "2270370").option("to", "2270469")
              .option("maxHeightsPerTrigger", "40")
              .option("heightsPerPartition", "5").load()
              .writeStream.format("noop")
              .trigger(Trigger.AvailableNow()).start()
            awaitOrFail(q, "gRPC backfill")
            100.0 / ((System.nanoTime() - t0) / 1e9)
          } finally stub.stop()
        }
        // the same live shape through the JSON-RPC HTTP transport (local
        // stub node replaying the golden templates), so the latency number
        // carries real per-height RPC fetches — connection setup, JSON
        // bodies over the wire, template resolution — not just file reads
        val (httpBackfill, httpPerBlock) = {
          val stub = new StubRpcServer(t)
          try {
            val t0 = System.nanoTime()
            val q = spark.readStream.format("blockfeed")
              .option("path", stub.base)
              .option("from", "2270370").option("to", "2270469")
              .option("maxHeightsPerTrigger", "40")
              // RPC fetches are I/O-bound: split each 40-height batch into
              // parallel reader tasks (the reference backfills at
              // concurrency 16 for the same reason) instead of one task
              // walking 80 sequential GETs
              .option("heightsPerPartition", "5").load()
              .writeStream.format("noop")
              .trigger(Trigger.AvailableNow()).start()
            awaitOrFail(q, "HTTP backfill")
            val secs = (System.nanoTime() - t0) / 1e9
            (100.0 / secs, drainLive(stub.base))
          } finally stub.stop()
        }
        val backfillRate = 100.0 / backfillSecs
        s""","streaming":{"backfill_blocks_per_sec":$backfillRate,""" +
          s""""per_block_latency_sec":$perBlock,""" +
          s""""http_backfill_blocks_per_sec":$httpBackfill,""" +
          s""""http_per_block_latency_sec":$httpPerBlock,""" +
          s""""grpc_backfill_blocks_per_sec":$grpcBackfill,""" +
          s""""baseline_backfill_blocks_per_sec":30,"baseline_block_interval_sec":6}"""
      } catch { case _: Throwable => "" }
    }
    val (spinAfter, shufAfter, latAfter) =
      if (probeOn) probe() else (-1.0, -1.0, -1.0)
    val load1mEnd = loadAvg
    // dilation = geomean of the per-probe before/after means vs the pinned
    // idle costs; ~1.0 on an idle host, ~matching the query-median ratio
    // inside a slow phase. Emitted alongside the raw times so a reader can
    // re-derive it (or spot a phase that started mid-sweep via before≠after).
    def meanPos(xs: Double*): Double = {
      val ok = xs.filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.sum / ok.size
    }
    val spinMean = meanPos(spinBefore, spinMid, spinAfter)
    val shufMean = meanPos(shufBefore, shufMid, shufAfter)
    val latMean = meanPos(latBefore, latMid, latAfter)
    val throughputDilation =
      if (spinMean > 0 && shufMean > 0 && P.IdleSpinSec > 0 && P.IdleShufSec > 0)
        math.sqrt((spinMean / P.IdleSpinSec) * (shufMean / P.IdleShufSec))
      else -1.0
    val latencyRatio =
      if (latMean > 0 && P.IdleLatMs > 0) latMean / P.IdleLatMs else -1.0
    // host_dilation = the BINDING axis among whichever measured: sub-second
    // queries bind on round-trip latency, shuffle-heavy ones on bandwidth —
    // a run is only as healthy as its worst axis (attempt 1 bound on
    // bandwidth at throughput 2.0×; attempt 2 bound on latency with
    // throughput 1.1×). max over the POSITIVE axes, so a transient probe
    // failure on one axis never discards a valid reading on the other.
    val axes = Seq(throughputDilation, latencyRatio).filter(_ > 0)
    val dilation = if (axes.nonEmpty) axes.max else -1.0
    val normalizedTotal = if (dilation > 0) total / dilation else -1.0
    // provenance (r13 ADVICE): the commit under measurement, if the runner
    // exports it — `SPARK_GRAFT_COMMIT=$(git rev-parse --short HEAD)` — so a
    // snapshot file can never be mistaken for a measurement of another tree.
    // Sanitized to a bare hex id (+ optional "-dirty"/"+suffix" markers in
    // [-+._a-zA-Z0-9]): an env value carrying a quote or control char would
    // otherwise corrupt the JSON line and null the driver's tail parse.
    val commit = sys.env.get("SPARK_GRAFT_COMMIT")
      .filter(_.matches("[-+._a-zA-Z0-9]{1,64}")).getOrElse("unset")
    val probeJson =
      s""","commit":"$commit","load_1m_start":$load1mStart,""" +
        s""""load_1m_end":$load1mEnd,"probe":{"spin_before_sec":$spinBefore,""" +
        s""""spin_mid_sec":$spinMid,"spin_after_sec":$spinAfter,""" +
        s""""shuffle_before_sec":$shufBefore,"shuffle_mid_sec":$shufMid,""" +
        s""""shuffle_after_sec":$shufAfter,""" +
        s""""latency_before_ms":$latBefore,"latency_mid_ms":$latMid,""" +
        s""""latency_after_ms":$latAfter,"idle_spin_sec":${P.IdleSpinSec},""" +
        s""""idle_shuffle_sec":${P.IdleShufSec},"idle_latency_ms":${P.IdleLatMs},""" +
        s""""throughput_dilation":$throughputDilation,""" +
        s""""latency_ratio":$latencyRatio,"host_dilation":$dilation,""" +
        s""""normalized_total_sec":$normalizedTotal}"""
    val startsJson = starts.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""query_starts":$startsJson,"sf":"$sfDir"$streaming$probeJson}"""
    println(full)
    // The driver snapshots only the TAIL of stdout and json-parses it; the
    // full per-query line above overflows that buffer at 200+ queries
    // (BENCH_r03/r04 recorded "parsed": null). So: persist the full JSON to
    // a fixed path, then end stdout with a compact line — headline totals,
    // streaming envelope, the 10 slowest queries, and a pointer to the full
    // map — that always fits the driver's window.
    // Subset runs (query-name args, the documented iteration aid) must not
    // clobber the committed full-sweep snapshot with a partial total that
    // still claims metric=total -- they go to BENCH_local_subset.json.
    val snapPath =
      if (args.isEmpty) "BENCH_local.json" else "BENCH_local_subset.json"
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(snapPath),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val top = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""n_queries":${results.size},"queries":$top,""" +
      s""""full_queries_file":"$snapPath"$streaming$probeJson}""")
    spark.stop()
  }
}
