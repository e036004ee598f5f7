package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** T2 at stream scale: `dropDuplicatesWithinWatermark` is the
  * bounded-state twin of the batch first-event dedup
  * (`t2_dedup_first_event`). The spec pins the two properties the 100 TB
  * argument rests on:
  *
  *  1. CORRECTNESS inside the horizon — duplicates arriving within the
  *     watermark delay of the first sighting are dropped, whatever the
  *     batch chunking;
  *  2. BOUNDED STATE — once the watermark passes a key's expiry the state
  *     row is EVICTED (observed via the state-operator metrics), which is
  *     exactly the trade documented for the streaming path: a re-arrival
  *     after eviction is re-emitted, so the operator guarantees
  *     at-most-once *within the horizon*, not global exactness — the
  *     batch T2 gate stays the exact-dedup oracle.
  */
class WatermarkDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("wmdedup-test").getOrCreate()

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("duplicates within the watermark horizon are dropped; state evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[(String, Timestamp)]
    val deduped = feed.toDF.toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("wm_dedup").outputMode("append").start()
    try {
      // batch 1: a, its immediate duplicate, b — one row each survives
      feed.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(2)))
      q.processAllAvailable()
      // batch 2: a again inside the horizon (watermark is still behind
      // its expiry) — still a duplicate, dropped across batches
      feed.addData(("a", ts(3)))
      q.processAllAvailable()
      val afterNear = spark.table("wm_dedup")
        .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(afterNear === Map("a" -> 1L, "b" -> 1L))
      val stateBefore = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateBefore >= 2L) // a and b are both live state

      // advance event time far past every horizon: watermark moves to
      // ~t+50, expiring a (t0+10) and b (t2+10) from the store
      feed.addData(("c", ts(59)))
      q.processAllAvailable()
      feed.addData(("d", ts(59))) // extra batch so eviction metrics land
      q.processAllAvailable()
      val stateAfter = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateAfter < stateBefore + 2,
        s"expected eviction: state grew $stateBefore -> $stateAfter")

      // a re-arrival AFTER eviction re-emits — the documented horizon
      // trade (bounded state, at-most-once within the watermark only)
      feed.addData(("a", ts(58)))
      q.processAllAvailable()
      val reEmitted = spark.table("wm_dedup")
        .filter(col("event_id") === "a").count()
      assert(reEmitted === 2L,
        "expected the post-eviction re-arrival of 'a' to be re-emitted")
    } finally q.stop()
  }
}
