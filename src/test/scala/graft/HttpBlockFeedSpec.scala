package graft

import graft.blocks.{EventTables, FixtureSource}
import graft.sources.{BlockClient, HttpBlockClient, RetryingBlockClient}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP JSON-RPC transport against a local stub node replaying the
  * golden templates (zero egress): the S1/S13 connector scenarios must
  * produce the SAME 100/29/6/106 ground truth as the file transport, plus
  * the transport-only behaviors (retry on transient HTTP failures, absent
  * heights as None, scheme-based selection).
  */
class HttpBlockFeedSpec extends AnyFunSuite {

  private val T = FixtureSource.DefaultTemplates
  private lazy val spark: SparkSession = Session.builder("graft-http-test").getOrCreate()

  private def withStub[A](f: StubRpcServer => A): A = {
    val stub = new StubRpcServer(T)
    try f(stub) finally stub.stop()
  }

  test("scheme selection: http:// opens the network transport") {
    assert(BlockClient.open("http://127.0.0.1:1").isInstanceOf[HttpBlockClient])
    assert(BlockClient.open(T).isInstanceOf[graft.sources.FileBlockClient])
  }

  test("client RPCs: height, dense availability, block fetch, absent = None") {
    withStub { stub =>
      val c = new HttpBlockClient(stub.base)
      assert(c.currentHeight() === 2270469L)
      // dense across the node's retained window, clamped by /status
      assert(c.availableHeights(2270360L, 2270374L) === (2270370L to 2270374L))
      assert(c.availableHeights(2270470L, 9999999L) === (2270470L to 2270475L))
      assert(c.availableHeights(1L, 100L) === Seq.empty)
      assert(c.block(2270370L).exists(_.contains("\"block\"")))
      assert(c.blockResults(2270370L).exists(_.contains("txs_results")))
      // far outside the chain: a JSON-RPC error response, not an exception
      assert(c.block(9999999L).isEmpty)
      // 20-height pages aligned to from
      val pages = c.metaPages(2270370L, 2270409L)
      assert(pages.size === 2)
      assert(pages.head.contains("block_metas"))
    }
  }

  test("T4 over the wire: transient 503s are retried, then succeed") {
    withStub { stub =>
      val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
      val c = new RetryingBlockClient(new HttpBlockClient(stub.base),
        maxAttempts = 5, baseWaitMillis = 10L, sleeper = waits += _)
      stub.failNext(3)
      assert(c.currentHeight() === 2270469L)
      assert(waits.size === 3) // exactly one backoff per transient failure
      // non-transient absence is NOT retried
      stub.failNext(0)
      val before = stub.requestCount
      assert(c.block(9999999L).isEmpty)
      assert(stub.requestCount === before + 1)
    }
  }

  test("S1 batch scan over http: 100 rows, same event totals as file transport") {
    withStub { stub =>
      val df = spark.read.format("blockfeed")
        .option("path", stub.base)
        .option("from", "2270370").option("to", "2270469").load()
      assert(df.count() === 100L)
      assert(df.filter(col("historical")).count() === 100L)
      assert(EventTables.txEvents(df).count() === 9838L)
      assert(EventTables.blockEvents(df).count() === 2211L)
      assert(df.filter(col("num_txs") > 0).count() === 29L)
    }
  }

  test("S3 over http: header-only projection takes the meta-page path") {
    withStub { stub =>
      val df = spark.read.format("blockfeed")
        .option("path", stub.base)
        .option("from", "2270370").option("to", "2270469").load()
        .select("height", "time", "chain_id", "num_txs", "historical")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("mode=meta"), s"expected meta mode:\n$plan")
      assert(df.count() === 100L)
    }
  }

  test("S13 combined stream over http: 106 rows, 100 historical + 6 live") {
    withStub { stub =>
      val q = spark.readStream.format("blockfeed")
        .option("path", stub.base)
        .option("from", "2270370")
        .option("maxHeightsPerTrigger", "40")
        .load()
        .writeStream.format("memory").queryName("bf_http_all")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("bf_http_all").cache()
      assert(got.count() === 106L)
      assert(got.select("height").distinct().count() === 106L)
      assert(got.filter(col("historical")).count() === 100L)
      assert(got.filter(!col("historical")).count() === 6L)
      assert(q.recentProgress.length >= 2)
    }
  }

  test("S14 over http: from=latest starts at the live tip") {
    withStub { stub =>
      val q = spark.readStream.format("blockfeed")
        .option("path", stub.base)
        .option("from", "latest")
        .load()
        .writeStream.format("memory").queryName("bf_http_latest")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("bf_http_latest")
      assert(got.count() === 6L)
      assert(got.filter(col("historical")).count() === 0L)
    }
  }
}
