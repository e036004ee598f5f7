package graft

/** Diagnostic main (test scope): times raw HttpBlockClient RPCs against the
  * stub node to separate client/transport cost from micro-batch overhead in
  * the Bench streaming latency numbers.
  */
object HttpLatencyProbe {
  def main(args: Array[String]): Unit = {
    val t = blocks.FixtureSource.DefaultTemplates
    val stub = new StubRpcServer(t)
    try {
      val c = new sources.HttpBlockClient(stub.base)
      // warm: connection pool + stub template cache
      c.currentHeight(); c.block(2270370L); c.blockResults(2270370L)
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
      time("50x /status (availableHeights)") {
        (1 to 50).foreach(_ => c.availableHeights(2270370L, 2270469L))
      }
      time("50x /block") {
        (0 until 50).foreach(i => c.block(2270370L + i % 100))
      }
      time("50x /block_results") {
        (0 until 50).foreach(i => c.blockResults(2270370L + i % 100))
      }
      time("10x full per-height fetch (block+results)") {
        (0 until 10).foreach { i =>
          c.block(2270460L + i); c.blockResults(2270460L + i)
        }
      }
    } finally stub.stop()
  }
}
