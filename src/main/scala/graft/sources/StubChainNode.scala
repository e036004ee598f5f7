package graft

import java.util.concurrent.atomic.AtomicInteger

/** The chain model + chaos/counter surface SHARED by the transport stubs
  * ([[StubRpcServer]] HTTP, [[StubGrpcServer]] gRPC): one definition of the
  * 100/29/6/106 chain (historical heights serve their own golden templates,
  * the live slots directly above the tip serve the live payloads), one
  * definition of the chaos contract (`failNext` = next n requests answer
  * transient; `failOnceAtHeights` = the first BLOCK fetch per listed height
  * answers transient, then heals — results fetches are never
  * height-faulted), and one definition of the proof-hook counters the gate
  * queries assert on (`blockServesIn`, `pendingHeightFaults`,
  * `requestCount`). The `require`s in st7/st9/st10/st11/st14 assume
  * IDENTICAL counting and fault semantics across transports — hoisting
  * them here (and funnelling both stubs' block RPCs through ONE
  * [[blockFetchFaulted]] call) keeps the stubs in provable lockstep; only
  * the wire layer (JDK HttpServer vs netty HTTP/2 + proto codec) is
  * per-stub.
  *
  * Counting order is part of the contract: a block fetch is COUNTED before
  * the fault check, so a faulted-then-retried height shows ≥2 serves — st10
  * relies on "zero NEW serves below the midpoint", st14 on faults draining
  * to zero, and both stay comparable across transports only if the order
  * matches everywhere.
  */
trait StubChainNode {
  def histFrom: Long
  def histTo: Long
  def liveCount: Int
  def liveSrcFrom: Long

  /** First chain slot above the historical window. */
  final lazy val liveFrom: Long = histTo + 1

  /** The node's advanced live tip, slot-valued (mutable so a test can move
    * it; starts with every live slot already available).
    */
  @volatile var latest: Long = histTo + liveCount

  /** Soak mode: chain slots above the live window REPLAY the historical
    * templates (modulo the window size) instead of 404ing — an endlessly
    * advancing chain for long-running drills (SoakSpec). Content heights and
    * payloads repeat; chain slots never do, so the offset log still advances
    * monotonically the way a real weeks-long tail would.
    */
  protected def wrapAboveWindow: Boolean = false

  /** Chain height → template file height: live slots serve the live
    * payloads (content heights `liveSrcFrom`+), everything else serves its
    * own file — a real node is DENSE, unlike a fixture dir listing.
    */
  protected final def srcHeight(h: Long): Long =
    if (h >= liveFrom && h < liveFrom + liveCount) liveSrcFrom + (h - liveFrom)
    else if (wrapAboveWindow && h > histTo)
      histFrom + ((h - histFrom) % (histTo - histFrom + 1))
    else h

  // ---- failNext: the next n requests (any RPC) answer transient ---------

  private val failures = new AtomicInteger(0)
  def failNext(n: Int): Unit = failures.set(n)
  /** Decrement-and-test the failNext budget; true = answer transient. */
  protected final def transientDue(): Boolean =
    failures.getAndUpdate(n => math.max(0, n - 1)) > 0

  // ---- failOnceAtHeights: one-shot per-height block-fetch faults --------

  private val heightFaults =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
  def failOnceAtHeights(hs: Seq[Long]): Unit = {
    heightFaults.clear(); hs.foreach(h => heightFaults.add(h)); ()
  }
  /** Injected height faults not yet served — 0 proves the chaos engaged. */
  def pendingHeightFaults: Int = heightFaults.size()

  /** Per-height chaos budget: `arm(h, times)` makes the next `times`
    * consume(h) calls answer true, then the height heals
    * (times = Int.MaxValue pins a never-heals arm). One definition for
    * every per-height fault kind, so their decrement semantics can never
    * drift apart.
    */
  private final class HeightBudget {
    private val budget =
      new java.util.concurrent.ConcurrentHashMap[Long, AtomicInteger]()
    def arm(h: Long, times: Int): Unit = {
      budget.put(h, new AtomicInteger(times)); ()
    }
    def consume(h: Long): Boolean = {
      val c = budget.get(h)
      c != null && c.getAndUpdate(n => math.max(0, n - 1)) > 0
    }
    /** Heights whose budget is still positive — lets a page-serving stub
      * find its armed targets in a body without consuming anything.
      */
    def armed: Set[Long] = {
      val out = Set.newBuilder[Long]
      budget.forEach { (h, c) => if (c.get() > 0) out += h }
      out.result()
    }
  }

  // ---- hideBlocks: advertised-but-unserved heights (lagging replica) ----

  /** A node that ADVERTISES a height (status/tip) but answers its /block
    * fetch not-available models a lagging read replica behind the RPC
    * endpoint — exactly the gap the reader's planned-height presence
    * contract must absorb (retry, then task failure; never a dropped row).
    */
  private val hiddenBudget = new HeightBudget
  def hideBlocks(h: Long, times: Int): Unit = hiddenBudget.arm(h, times)
  /** Decrement-and-test `h`'s hide budget; true = answer not-available. */
  protected final def blockHiddenNow(h: Long): Boolean =
    hiddenBudget.consume(h)

  // ---- corruptBlocks: present-but-unreadable payloads (broken replica) ---

  /** A node that answers a height's /block with 200 + a payload that is not
    * a readable block models a replica serving truncated/corrupt bodies —
    * the presence contract's second arm: the reader must treat an
    * unreadable PLANNED block like absence (retry on the ladder, then fail
    * the task), never as a silently dropped row. HTTP-stub only by design:
    * on the gRPC wire a corrupt payload fails in the client's proto decode,
    * a transport-layer failure shape the codec-level contract under test
    * sits above.
    */
  private val corruptBudget = new HeightBudget
  def corruptBlocks(h: Long, times: Int): Unit = corruptBudget.arm(h, times)
  /** Decrement-and-test `h`'s corrupt budget; true = serve garbage. */
  protected final def blockCorruptNow(h: Long): Boolean =
    corruptBudget.consume(h)

  // ---- corruptMetaEntries: page entries missing their num_txs ------------

  /** A `/blockchain` page whose entry for height `h` lacks a readable
    * `num_txs` models a replica serving a corrupt page — the meta-path twin
    * of [[corruptBlocks]]: the codec must SKIP the entry (never trust a
    * missing count as an authoritative 0, which under a num_txs pushdown
    * records the height as covered-and-filtered — a silent drop), and the
    * reader's coverage backstop must then re-cover the height via `/block`.
    * HTTP-stub only: the gRPC wire has no paged meta RPC.
    */
  private val corruptMetaBudget = new HeightBudget
  def corruptMetaEntry(h: Long, times: Int): Unit =
    corruptMetaBudget.arm(h, times)
  /** Armed corrupt-meta heights (budget still positive), for page surgery. */
  protected final def corruptMetaArmed: Set[Long] = corruptMetaBudget.armed
  /** Decrement-and-test `h`'s corrupt-meta budget; true = corrupt it. */
  protected final def metaEntryCorruptNow(h: Long): Boolean =
    corruptMetaBudget.consume(h)

  // ---- proof-hook counters ----------------------------------------------

  private val requests = new AtomicInteger(0)
  def requestCount: Int = requests.get()
  protected final def countRequest(): Unit = { requests.incrementAndGet(); () }

  // Block-results proof hooks, per endpoint (instead of diffing total
  // request counts, which couples a spec to the exact planning-RPC
  // sequence of both runs — AQE re-plans have already broken one such
  // exact-delta). TWO counters because specs assert two different claims
  // (r13 ADVICE made the distinction load-bearing: the golden fixture set
  // itself mixes present and absent results — 2270417/2270420 have a
  // block template but NO block_results — so "asked" and "answered"
  // genuinely differ by 2 over the full window):
  //   resultsRequested = the reader ISSUED the RPC and the stub routed it
  //     (counted at receipt, 404/NOT_FOUND included — but NOT requests
  //     absorbed by a failNext 503/UNAVAILABLE, which return before the
  //     count on both wires) — what the st12/st13 full-mode gates
  //     need: proof the results-elision did NOT engage;
  //   resultsServes = the RPC was answered WITH a payload (counted
  //     beside the 200/OK send) — what the elision/batch-authority specs
  //     need: proof the wire really paid (or really skipped) the data.
  private val resultsRequests = new AtomicInteger(0)
  private val resultsServed = new AtomicInteger(0)
  def resultsRequested: Int = resultsRequests.get()
  def resultsServes: Int = resultsServed.get()
  protected final def countResultsRequest(): Unit = {
    resultsRequests.incrementAndGet(); ()
  }
  protected final def countResultsServe(): Unit = {
    resultsServed.incrementAndGet(); ()
  }

  // Per-chain-height block serve counts: lets gate queries PROVE which
  // heights a run actually fetched — st10's "resumed, didn't replay" and
  // st9's "the live slots really came over the wire" both hang off this.
  private val blockServes =
    new java.util.concurrent.ConcurrentHashMap[Long, AtomicInteger]()

  /** THE block-fetch chaos point, shared verbatim: count the serve for `h`,
    * then consume its one-shot fault if any (true = answer transient). Both
    * stubs call this from their block RPC and ONLY there — so "the first
    * BLOCK fetch per listed height answers transient, then heals" and "a
    * faulted height shows ≥2 block serves" hold identically on every wire.
    * Results fetches are never height-faulted (use `failNext` for
    * RPC-kind-agnostic chaos); letting them consume a fault would break the
    * count invariant on whichever transport's results request lands first.
    */
  protected final def blockFetchFaulted(h: Long): Boolean = {
    blockServes.computeIfAbsent(h, _ => new AtomicInteger).incrementAndGet()
    heightFaults.remove(h)
  }
  /** Total block fetches served for chain heights in [lo, hi]. */
  def blockServesIn(lo: Long, hi: Long): Int = {
    var n = 0
    blockServes.forEach { (h, c) => if (h >= lo && h <= hi) n += c.get() }
    n
  }
}
