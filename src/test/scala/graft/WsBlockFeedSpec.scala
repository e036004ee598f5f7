package graft

import graft.sources.WsSubscription
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** S7–S9: the websocket subscribe transport against a local RFC 6455 stub
  * (zero egress). The subscription must track pushed NewBlock tips, apply
  * the reference decode policy (noise drops, panic fails, malformed
  * restarts), survive connection drops, and — wired into the connector —
  * drive a live tail with ZERO tip-polling RPCs while reproducing the same
  * golden-fixture ground truth as the polling transports.
  */
class WsBlockFeedSpec extends AnyFunSuite {

  private val T = graft.blocks.FixtureSource.DefaultTemplates
  private lazy val spark: SparkSession = Session.builder("graft-ws-test").getOrCreate()

  private def eventually(timeoutMillis: Long = 10000)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMillis * 1000000L
    while (System.nanoTime() < deadline && !cond) Thread.sleep(20)
    assert(cond)
  }

  private def withWs[A](f: StubWsServer => A): A = {
    val ws = new StubWsServer
    try f(ws) finally ws.stop()
  }

  test("subscribe handshake + pushed tips, including fragmented frames") {
    withWs { ws =>
      val sub = new WsSubscription(ws.url)
      try {
        eventually()(ws.subscriptions == 1)
        assert(sub.pushedTip.isEmpty)
        ws.push(100L)
        assert(sub.awaitTip(100L, 5000))
        // out-of-order push never regresses the tip
        ws.push(50L)
        ws.push(101L)
        assert(sub.awaitTip(101L, 5000))
        assert(sub.pushedTip.contains(101L))
        // fragmented text frame is reassembled before decode
        ws.pushFragmented(ws.newBlockJson(102L))
        assert(sub.awaitTip(102L, 5000))
      } finally sub.close()
    }
  }

  test("decode policy: noise drops with counters, panic poisons the stream") {
    withWs { ws =>
      val sub = new WsSubscription(ws.url)
      try {
        eventually()(ws.subscriptions == 1)
        ws.pushRaw("""{"jsonrpc":"2.0","id":1,"result":{"foo":1}}""") // Unknown
        ws.pushRaw("""{"jsonrpc":"2.0","id":1,"result":{}}""")        // Empty
        eventually()(sub.dropped == 2)
        ws.push(7L)
        assert(sub.awaitTip(7L, 5000)) // noise did not kill the stream
        // Panic → recorded failure → next tip read throws (query-fail path)
        ws.pushRaw("""{"jsonrpc":"2.0","id":1,"result":{"response":{"code":1,"log":"panic: boom"}}}""")
        eventually()(
          try { sub.pushedTip; false }
          catch { case _: graft.sources.DecodeCascade.PanicException => true })
      } finally sub.close()
    }
  }

  test("malformed frame tears down for resubscribe; drops reconnect") {
    withWs { ws =>
      val sub = new WsSubscription(ws.url, reconnectBaseMillis = 20L)
      try {
        eventually()(ws.subscriptions == 1)
        ws.push(5L)
        assert(sub.awaitTip(5L, 5000))
        // reference: DecoderEncodingException restarts the flow
        ws.pushRaw("{not json")
        eventually()(ws.subscriptions == 2 && sub.malformed == 1)
        // hard connection drop → reconnect + resubscribe
        ws.dropAll()
        eventually()(ws.subscriptions == 3)
        ws.push(9L)
        assert(sub.awaitTip(9L, 5000))
        assert(sub.reconnects >= 2)
      } finally sub.close()
    }
  }

  test("close() during an in-flight reconnect still aborts the freshly built socket") {
    // r12 review: CompletableFuture.join() is uninterruptible (it re-asserts
    // the interrupt flag on completion), so close() landing while the
    // supervisor rebuilds the websocket assigns the NEW socket after close()
    // aborted the STALE one — and the pending interrupt throws out of
    // drops.take() before the in-loop abort runs. With the JVM-shared
    // HttpClient a socket missed there is pinned forever (pre-fix: one
    // ESTABLISHED connection leaked per query restart against a flapping
    // node). The supervisor now owns a final abort on loop exit; this test
    // forces the exact interleaving via the stub's handshake gate.
    withWs { ws =>
      val sub = new WsSubscription(ws.url, reconnectBaseMillis = 25L)
      // close() is idempotent; the finally covers an assertion failing
      // BEFORE the mid-test close below — without it a timed-out eventually
      // would leave the subscription reconnecting (8-attempt backoff against
      // the stopped stub) under the rest of the suite's thread censuses
      try {
        eventually()(ws.subscriptions == 1)
        ws.holdNextHandshake()
        ws.dropAll() // supervisor wakes and reconnects; the gate parks join()
        eventually()(ws.heldCount == 1)
        sub.close() // the interrupt pends while join() is uninterruptible
        ws.releaseHandshake() // join() completes and assigns the NEW socket
        // first pin that the reconnect connection fully ESTABLISHED — the
        // monotone handshake counter, incremented after `conns` registration,
        // cannot be missed the way the connectionCount census can flicker;
        // without this the ==0 below could sample before the stub registered
        // the released connection and pass vacuously even with the leak
        eventually()(ws.handshakes == 2)
        // the supervisor's exit abort must kill it: the stub sees the
        // connection die (pre-fix it stayed ESTABLISHED, subscribed, forever)
        eventually()(ws.connectionCount == 0)
        eventually() {
          import scala.jdk.CollectionConverters._
          !Thread.getAllStackTraces.keySet.asScala.exists(t =>
            t.isAlive && t.getName == s"ws-subscription-${ws.url}")
        }
      } finally sub.close()
    }
  }

  test("unreachable node: backoff exhausts and the recorded failure surfaces") {
    // the give-up arm of the reconnect ladder (reference Backoff.kt caps
    // attempts): a node that is GONE — not flapping — must eventually turn
    // every pushedTip read into a thrown IOException so the streaming query
    // fails with restart semantics instead of tailing silence forever
    val dead = new StubWsServer
    val url = dead.url
    dead.stop() // port now refuses connections
    val sub = new WsSubscription(url,
      reconnectBaseMillis = 5L, maxReconnectAttempts = 2)
    try {
      eventually(30000)(
        try { sub.pushedTip; false }
        catch {
          case e: java.io.IOException => e.getMessage.contains("unreachable")
        })
    } finally sub.close()
  }

  test("S9 live tail over ws: pushed events drive the stream, zero polling") {
    val rpc = new StubRpcServer(T)
    try withWs { ws =>
      val q = spark.readStream.format("blockfeed")
        .option("path", rpc.base)
        .option("from", "latest")
        .option("ws", ws.url)
        .load()
        .writeStream.format("memory").queryName("bf_ws_live")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        eventually(30000)(ws.subscriptions == 1)
        val liveHeights = rpc.liveFrom until (rpc.liveFrom + 6)
        liveHeights.foreach(ws.push)
        eventually(60000)(spark.table("bf_ws_live").count() == 6L)
        val got = spark.table("bf_ws_live").cache()
        assert(got.filter(col("historical")).count() === 0L)
        assert(got.select("height").distinct().count() === 6L)
        // zero tip-polling: once fetches are done, an idle second of
        // triggers must not touch the RPC node at all
        val settled = rpc.requestCount
        Thread.sleep(1000)
        assert(rpc.requestCount === settled)
        // and the whole run was 1 abci_info + 6 block + 6 block_results
        // (allow one extra stream re-initialization under load)
        assert(settled >= 13 && settled <= 15, s"request count $settled")
      } finally q.stop()
    } finally rpc.stop()
  }

  test("S13 backfill in ws mode: dense arithmetic ranges, no /status calls") {
    val rpc = new StubRpcServer(T)
    try withWs { ws =>
      val q = spark.readStream.format("blockfeed")
        .option("path", rpc.base)
        .option("from", "2270370")
        .option("maxHeightsPerTrigger", "40")
        .option("ws", ws.url)
        .load()
        .writeStream.format("memory").queryName("bf_ws_backfill")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // before any push the start-tip stands in: exactly the 100 historical
      val got = spark.table("bf_ws_backfill")
      assert(got.count() === 100L)
      assert(got.filter(col("historical")).count() === 100L)
    } finally rpc.stop()
  }
}
