package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** A bounded LIVE-TAIL SOAK: every streaming gate drains in seconds, but a
  * real deployment tails a node for weeks — thousands of micro-batch
  * triggers against the same connector, offset log, state store, and wire
  * pool. This spec runs the machinery long enough (≥200 committed
  * micro-batches, the chain tip advancing as batches commit, each batch
  * fetching real blocks over real loopback HTTP) to catch anything that
  * grows PER TRIGGER instead of per vocabulary:
  *
  *   - the offset/commit logs must be PURGED, not accumulated (Spark retains
  *     `minBatchesToRetain` = 100 entries PER log; ~210 batches must leave
  *     ~100 files in each of offsets/ and commits/ — ~200 combined, which is
  *     what the probe counts — never one per batch);
  *   - state-operator footprint (rows AND serialized bytes) must be flat
  *     between mid-run and end — the StateSizeSpec budgets, re-measured
  *     under endless replay instead of a one-shot drain;
  *   - the JVM thread population must be flat between mid-run and end — a
  *     thread leaked per trigger/connection would show up ~100× here.
  *
  * The node side is [[StubRpcServer]] in `wrapAboveWindow` soak mode: chain
  * slots above the golden window replay the historical templates (content
  * repeats, slots never do), so the tip can advance indefinitely while every
  * fetch still serves a real payload.
  *
  * The second test is the gRPC twin: the 4-connection pool
  * ([[graft.sources.grpc.GrpcWire.PoolSize]]) is immortal BY DESIGN — this
  * proves those loops AND their sockets are the ONLY immortals by draining
  * the same bounded range twice, one height per trigger, with two censuses:
  * `graft-grpc-client` threads ≤ PoolSize (loop immortality), and
  * ESTABLISHED client sockets to the stub ≤ PoolSize via `/proc/net/tcp`
  * (connection immortality — a leaked parent channel keeps a socket open
  * that the thread census cannot see, since netty registers leaked channels
  * on the existing loops). Leaked HTTP/2 STREAM channels carry neither a
  * thread nor a socket; those are pinned functionally by GrpcWireSpec's
  * abort/evict regressions.
  */
class SoakSpec extends AnyFunSuite {

  private val T = graft.blocks.FixtureSource.DefaultTemplates

  // HDFS-backed provider pinned on an own session (the StateSizeSpec
  // rationale: only it reports stateOnCurrentVersionSizeBytes, and another
  // suite in the shared JVM may have selected RocksDB)
  private lazy val spark: SparkSession = {
    val s = Session.builder("soak-test").getOrCreate().newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider")
    s
  }

  private def liveThreads: Seq[Thread] = {
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.keySet.asScala.toSeq.filter(_.isAlive)
  }

  /** Thread census with settle-tolerance: Spark spawns short-lived
    * machinery threads (broadcast, IO, per-query teardown after stop) that
    * die asynchronously — a point-in-time census can catch them mid-flight
    * (measured: +10 transients once in five runs of a ~541-thread shared
    * test JVM). Poll until the population drops under `bound`; a REAL
    * per-trigger leak (~100 threads per 100 triggers) never settles and
    * still fails loudly after the wait.
    */
  private def settledThreads(bound: Int): Int = settled(bound)(liveThreads.size)

  /** The settle-tolerant poll generalized over any census (thread counts,
    * socket counts): wait for `count` to drop under `bound`; a real
    * per-cycle leak never settles and still fails loudly after the wait.
    *
    * r15: deadline widened 20 s → 120 s after the r14 DRIVER test run
    * failed this suite (365/366) on a host its own probes placed inside a
    * latency-steal phase (66–127 ms trivial-job medians vs the healthy
    * 10–40 ms band) while the builder's idle run passed 366/366 — Spark's
    * asynchronous teardown (broadcast/IO/maintenance pools, post-stop
    * query machinery) dies on timers and GC that such a phase stretches
    * well past 20 s. Pure margin: the loop exits the moment the census
    * drops under `bound`, so an idle run pays nothing, and a REAL
    * per-cycle leak (~100 threads/sockets across ~100 cycles) never
    * settles no matter how long the wait.
    */
  private def settled(bound: Int)(count: => Int): Int = {
    val deadline = System.nanoTime() + 120L * 1000000000L
    var c = count
    while (c > bound && System.nanoTime() < deadline) {
      Thread.sleep(200); c = count
    }
    c
  }

  test("210-trigger live tail: offset log purged, state flat, threads flat") {
    val stub = new StubRpcServer(T, wrapAboveWindow = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft-soak-")
    val ckpt = s"$tmp/ckpt"
    try {
      stub.latest = stub.histFrom // tip starts at the floor, advances below
      val df = spark.readStream.format("blockfeed")
        .option("path", stub.base)
        .option("from", stub.histFrom.toString) // no `to`: endless tail
        .option("maxHeightsPerTrigger", "1")
        .option("retryBaseWaitMs", "25").load()
        // payload-derived num_txs forces full mode: every trigger really
        // fetches its block over the wire (the st7/st9 rationale)
        .select(col("height"), col("time"),
          size(coalesce(col("block.data.txs"), array())).as("num_txs"))
        .withWatermark("time", "10 seconds")
        .groupBy(window(col("time"), "1 hour"))
        .agg(count(lit(1)).as("n"), sum(col("num_txs")).as("txs"))
      val q = df.writeStream.format("memory").queryName("soak_tail")
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0L)).start()

      def committed: Long = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      // the local CheckpointFileManager writes a .crc sidecar per entry —
      // count the entries themselves, in BOTH metadata logs (Spark purges
      // offsetLog and commitLog separately; a purge regression in either is
      // the per-trigger file-growth leak this soak exists to catch)
      def logFiles(sub: String): Int =
        Option(new java.io.File(s"$ckpt/$sub").list())
          .map(_.count(!_.endsWith(".crc"))).getOrElse(0)
      def offsetFiles: Int = logFiles("offsets") + logFiles("commits")
      def stateProbe: (Long, Long) = {
        val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
        assert(withState.nonEmpty, "no state-operator progress recorded")
        val op = withState.last.stateOperators.head
        (op.numRowsTotal,
          op.customMetrics.get("stateOnCurrentVersionSizeBytes").longValue())
      }

      val target = 210L // ≥200 committed triggers; headroom under host load
      // failure deadline only — the loop exits the moment `target` commits.
      // r12 flake-margin runs (3× under 16 busy-loop threads, 1-min load
      // 19-30 ≈ 2× the load the r11 driver run passed at) measured 139-225 s.
      // 480 s then proved NOT enough against the kernel-shared host's bad
      // phases: on 2026-08-16 two runs of code whose tail path had just
      // passed (and whose diff could not touch it) read 200/210 and 144/210
      // at 480 s while the same day's bench measured a uniform 1.4-1.7×
      // co-tenant slowdown at loadavg < 2 (SCALE.md's bench book). 900 s
      // keeps 4× headroom over the measured busy-loop worst case — an idle
      // run still exits at ~190 s; only a REAL per-trigger stall (or a
      // pathological host, which the margin record says to re-run) pays it
      val budgetSecs = 900L
      var mid: Option[(Long, Long, Int, Int)] = None // state rows/bytes, offset files, threads
      val deadline = System.nanoTime() + budgetSecs * 1000000000L
      try {
        while (committed < target && System.nanoTime() < deadline) {
          // the tip advances as batches commit — the live-tail shape: the
          // node is always a couple of blocks ahead, never a deep backlog
          stub.latest = math.min(stub.histFrom + committed + 2, stub.histFrom + target + 4)
          if (committed >= 110 && mid.isEmpty) {
            val (r, b) = stateProbe
            mid = Some((r, b, offsetFiles, liveThreads.size))
          }
          Thread.sleep(2)
        }
        assert(committed >= target,
          s"soak committed only $committed micro-batches in $budgetSecs s (target $target)")
        val (midRows, midBytes, midOffsets, midThreads) = mid.getOrElse(
          fail(s"mid-run probe never captured: the monitor loop skipped the " +
            s"[110, $target) window (only saw committed=$committed)"))
        val (endRows, endBytes) = stateProbe
        val endOffsets = offsetFiles
        // +16 slack (was +8): the mid census is a point-in-time read that
        // can catch a transient dip, and Spark pools (state-store
        // maintenance, shuffle cleanup) warm up lazily — a loaded-host
        // census needs headroom. Detection power intact: a per-trigger
        // thread leak adds ~100 between the probes.
        val endThreads = settledThreads(midThreads + 16)

        // the chain replays the same 100 templates: vocabulary (the 1 h
        // windows of the golden corpus) is fixed, so state must be EXACTLY
        // flat from mid-run to end — any per-trigger growth is a leak
        assert(endRows == midRows,
          s"state rows grew under endless replay: $midRows → $endRows")
        assert(endBytes == midBytes,
          s"state bytes grew under endless replay: $midBytes → $endBytes")
        // purge, not accumulation: ~100 retained PER log + slack, never
        // ~1/batch (the count spans offsets + commits)
        assert(endOffsets <= 240 && endOffsets <= midOffsets + 20,
          s"offset/commit logs grew with the trigger count: $midOffsets → $endOffsets files")
        // 100 triggers between the probes: a per-trigger thread leak would
        // add ~100 here; allow a little slack for lazy Spark pool warm-up
        assert(endThreads <= midThreads + 16,
          s"thread population grew across 100 triggers and never settled: " +
            s"$midThreads → $endThreads")
        // and the soak really flowed data end-to-end the whole way:
        //   - the replay phase (roughly the last 100 triggers): recentProgress
        //     must show rows still ARRIVING one per trigger — the watermark
        //     then drops the stale-timestamped replays as late, which is
        //     exactly WHY state stays flat above;
        //   - the aggregate itself: the update-mode memory sink appends one
        //     row per window per update, so each window's all-time accepted
        //     count is its LAST (= max) n — together the golden window's
        //     ~106 blocks must have landed before the watermark froze
        val recentInput = q.recentProgress.map(_.numInputRows).sum
        assert(recentInput >= 50,
          s"late-phase triggers stopped flowing rows: $recentInput over the " +
            s"last ${q.recentProgress.length} batches")
        val drained = spark.table("soak_tail")
          .groupBy(col("window")).agg(max(col("n")).as("n_final"))
          .agg(sum(col("n_final"))).head().getLong(0)
        assert(drained >= 100, s"only $drained rows were accepted into the aggregate")
      } finally q.stop()
    } finally {
      stub.stop()
      // the state-store maintenance thread can still be writing snapshot
      // files for a beat after q.stop() — retry, and never throw from here
      // (a cleanup error in a finally would REPLACE the real test failure)
      TestDirs.deleteRecursively(tmp, retries = 5)
    }
  }

  /** Client-side ESTABLISHED TCP connections to `port` (Linux `/proc/net`
    * census — the rem_address side, so the stub's own listening/accepted
    * sockets don't double-count). A leaked parent channel keeps its socket
    * open, so this catches CONNECTION leaks the thread census cannot (netty
    * registers leaked channels on the EXISTING loop threads); leaked HTTP/2
    * STREAM channels carry no socket and are pinned functionally by
    * GrpcWireSpec's abort/evict regressions instead (a leaked stream budget
    * wedges the low-max-concurrent-streams peer test).
    */
  private def establishedTo(port: Int): Int = {
    val hex = f"$port%04X"
    // scope to LOOPBACK remote addresses (the stub binds 127.0.0.1): an
    // unrelated outbound connection elsewhere in the namespace whose remote
    // port happens to collide with the stub's ephemeral port must not count
    val remotes = Set(
      s"0100007F:$hex", // 127.0.0.1 in /proc/net/tcp
      s"00000000000000000000000001000000:$hex", // ::1 in tcp6
      s"0000000000000000FFFF00000100007F:$hex") // ::ffff:127.0.0.1 in tcp6
    Seq("/proc/net/tcp", "/proc/net/tcp6").map { f =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(f))) 0
      else {
        val src = scala.io.Source.fromFile(f)
        try src.getLines().drop(1).count { l =>
          val cols = l.trim.split("\\s+")
          cols.length > 3 && remotes.contains(cols(2)) && cols(3) == "01"
        } finally src.close()
      }
    }.sum
  }

  test("ws soak: nothing accretes per subscription cycle — supervisors and sockets all die") {
    // the third transport's census twin (st16 proves ws CHAOS recovery;
    // this proves REPETITION cleanliness): each ws-mode query start spawns
    // one subscription — a supervisor thread, a websocket connection, and
    // (pre-fix) a PRIVATE JDK HttpClient whose selector thread lived until
    // GC. Four start/stop cycles must leave zero supervisors, zero client
    // sockets to the ws stub, a selector census no larger than after cycle
    // one (the shared-HttpClient pin), and a flat overall thread census.
    val ws = new StubWsServer
    val wsPort = ws.url.stripPrefix("ws://127.0.0.1:").takeWhile(_.isDigit).toInt
    def wsSupervisors: Int =
      liveThreads.count(_.getName.startsWith("ws-subscription-"))
    def selectorThreads: Int =
      liveThreads.count(_.getName.endsWith("-SelectorManager"))
    def drain(i: Int): Unit = {
      val q = spark.readStream.format("blockfeed")
        .option("path", T) // file-mode data: this soak is about the ws side
        .option("ws", ws.url)
        .option("from", "2270370")
        .load()
        .select(col("height"))
        .writeStream.format("memory").queryName(s"soak_ws_$i")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(240000), s"ws drain $i did not finish in 240 s")
      finally q.stop()
      assert(spark.table(s"soak_ws_$i").count() == 100L)
    }
    try {
      drain(1)
      val sel1 = selectorThreads
      val t1 = liveThreads.size
      (2 to 4).foreach(drain)
      assert(settled(0)(wsSupervisors) == 0,
        "a subscription supervisor outlived its query's stop()")
      assert(settled(0)(establishedTo(wsPort)) == 0,
        "a websocket client connection outlived its subscription")
      assert(selectorThreads <= sel1,
        s"HttpClient selector threads accreted across subscription cycles: " +
          s"$sel1 → $selectorThreads (the shared-client pin)")
      val t2 = settledThreads(t1 + 16)
      assert(t2 <= t1 + 16,
        s"thread population grew across 3 ws subscription cycles and never " +
          s"settled: $t1 → $t2")
    } finally ws.stop()
  }

  test("gRPC soak: the 4 pool loops and their sockets are the ONLY immortals") {
    val stub = new StubGrpcServer(T)
    def grpcThreads: Int =
      liveThreads.count(_.getName.startsWith("graft-grpc-client"))
    def drain(name: String): Unit = {
      val q = spark.readStream.format("blockfeed")
        .option("path", stub.base)
        .option("from", stub.histFrom.toString)
        .option("to", stub.histTo.toString)
        .option("maxHeightsPerTrigger", "1") // one gRPC fetch per trigger
        .option("retryBaseWaitMs", "25").load()
        .select(col("height"), col("chain_id"),
          size(coalesce(col("block.data.txs"), array())).as("num_txs"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try {
        assert(q.awaitTermination(240000), s"$name did not drain in 240 s")
      } finally q.stop()
      assert(spark.table(name).count() == 100L)
    }
    try {
      drain("soak_grpc_1")
      val (g1, t1, s1) = (grpcThreads, liveThreads.size, establishedTo(stub.port))
      drain("soak_grpc_2")
      val (g2, s2) = (grpcThreads, establishedTo(stub.port))
      val t2 = settledThreads(t1 + 16)
      // the loop threads start LAZILY (a pool connection dials only when a
      // task thread's affinity picks it), so the census may still climb
      // between drains — but it must NEVER exceed the fixed pool size
      assert(g1 <= graft.sources.grpc.GrpcWire.PoolSize &&
          g2 <= graft.sources.grpc.GrpcWire.PoolSize,
        s"gRPC loop census $g1 → $g2 exceeds the fixed pool size " +
          s"${graft.sources.grpc.GrpcWire.PoolSize}")
      // CONNECTION census: ~100 fetches + ~100 tip polls per drain must
      // ride the ≤4 pooled sockets — a parent-channel leak (one orphan per
      // reconnect/evict round) would pile up ESTABLISHED sockets here
      assert(s1 <= graft.sources.grpc.GrpcWire.PoolSize &&
          s2 <= graft.sources.grpc.GrpcWire.PoolSize,
        s"client sockets to the stub grew past the pool: $s1 → $s2")
      assert(t2 <= t1 + 16,
        s"thread population grew across a 100-trigger gRPC drain and never " +
          s"settled: $t1 → $t2")
    } finally stub.stop()
  }
}
