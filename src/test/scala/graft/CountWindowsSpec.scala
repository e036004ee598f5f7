package graft

import graft.blocks.FixtureSource
import graft.streaming.CountWindows
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exact count-window streaming state (W1/W2 via flatMapGroupsWithState):
  * tumbling batches of 25 over the 106-block combined feed must be exactly
  * the globally-sorted chunks, across micro-batch boundaries and regardless
  * of shuffle order inside a batch.
  */
class CountWindowsSpec extends AnyFunSuite {

  private val T = FixtureSource.DefaultTemplates
  private lazy val spark: SparkSession = Session.builder("cw-test").getOrCreate()

  test("streaming tumbling count batches = sorted chunks; partial stays buffered") {
    val raw = spark.readStream.format("blockfeed")
      .option("path", T).option("from", "2270370")
      .option("maxHeightsPerTrigger", "40") // forces several micro-batches
      .load()
    val q = CountWindows.blockCountBatches(spark, raw, size = 25)
      .writeStream.format("memory").queryName("cw_batches")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("cw_batches")
      .selectExpr("key", "batchIndex", "n", "minHeight", "maxHeight")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)

    // 106 blocks / size 25 → 4 full batches emitted, 6 trailing buffered
    assert(got.length === 4)
    // expected chunks: the globally-sorted heights of the combined stream
    val heights = (2270370L to 2270469L) ++ (3126935L to 3126940L)
    val expected = heights.sorted.grouped(25).take(4).zipWithIndex.map {
      case (chunk, i) => ("pio-testnet-1", i.toLong, chunk.length, chunk.head, chunk.last)
    }.toSeq
    assert(got.toSeq === expected)
  }
}
