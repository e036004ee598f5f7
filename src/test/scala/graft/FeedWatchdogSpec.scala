package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FeedStall, FeedWatchdog}

/** The transformWithState watchdog fires exactly when event time proves a
  * source silent past its deadline — alerts on ABSENCE of input, re-armed
  * by every arrival, deterministic under replay because the timers are
  * event-time. (RocksDB state store: transformWithState requires it; the
  * conf is scoped to this spec's session.)
  */
class FeedWatchdogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = Session.builder("watchdog-test").getOrCreate().newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s")

  test("silent source alerts once; active source's timer re-arms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[(String, Timestamp)]
    val alerts = feed.toDS().toDF("source", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new FeedWatchdog(silenceMillis = 30000L),
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[FeedStall])
    val q = alerts.toDF().writeStream.format("memory")
      .queryName("wd_alerts").outputMode("append").start()
    try {
      def collected(): Set[(String, Timestamp, Long)] =
        spark.table("wd_alerts")
          .select(col("source"), col("last_seen"), col("silence_ms"))
          .as[(String, Timestamp, Long)].collect().toSet

      // both feeds alive at 10:00:00 — timers armed at +30s each
      feed.addData(("a", ts("10:00:00")), ("b", ts("10:00:00")))
      q.processAllAvailable()
      assert(collected() === Set.empty)

      // a heartbeats at 10:01:00 → its timer re-arms to 10:01:30; the
      // advanced watermark proves b silent past 10:00:30 → ONE b alert
      feed.addData(("a", ts("10:01:00")))
      q.processAllAvailable()
      assert(collected() === Set(("b", ts("10:00:00"), 30000L)))

      // b recovers at 10:02:00 (re-arms to 10:02:30); the watermark now
      // proves a silent past 10:01:30 → the a alert, and b does NOT
      // re-alert for its already-reported silence
      feed.addData(("b", ts("10:02:00")))
      q.processAllAvailable()
      assert(collected() === Set(
        ("b", ts("10:00:00"), 30000L),
        ("a", ts("10:01:00"), 30000L)))

      // a dense burst keeps a's deadline moving — watermark to 10:02:20
      // passes NO deadline (a: 10:02:50, b: 10:02:30) → no new alerts
      feed.addData(("a", ts("10:02:10")), ("a", ts("10:02:20")))
      q.processAllAvailable()
      assert(collected().size === 2)
    } finally q.stop()
  }

  /** Pins the expiry-vs-watermark boundary the st5 oracle depends on.
    * Empirically (this test): an event-time timer fires when the watermark
    * reaches its expiry INCLUSIVELY — expiry == watermark fires, expiry one
    * millisecond above does not. So the declarative twin of the alarm is
    * `last_seen + silence <= max_ts` (the st5 oracle), NOT the strict `<`
    * it originally used — the gated data's ~63 s boundary clearance had
    * masked the difference. This test is what makes the boundary a pinned
    * semantic rather than a data accident; if a Spark upgrade flips the
    * comparison, this fails before the gate does.
    */
  test("timer at expiry == watermark fires; expiry above watermark does not (st5 boundary)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[(String, Timestamp)]
    val alerts = feed.toDS().toDF("source", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new FeedWatchdog(silenceMillis = 30000L),
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[FeedStall])
    val q = alerts.toDF().writeStream.format("memory")
      .queryName("wd_boundary").outputMode("append").start()
    try {
      def collected(): Set[(String, Timestamp, Long)] =
        spark.table("wd_boundary")
          .select(col("source"), col("last_seen"), col("silence_ms"))
          .as[(String, Timestamp, Long)].collect().toSet

      // x's deadline = 10:00:30.000; z's = 10:00:30.001
      feed.addData(("x", ts("10:00:00")), ("y", ts("10:00:00")),
        ("z", Timestamp.valueOf("2024-01-01 10:00:00.001")))
      q.processAllAvailable()
      assert(collected() === Set.empty)

      // y lands the watermark EXACTLY on x's deadline: inclusive compare →
      // x fires; z, whose expiry sits 1 ms ABOVE the watermark, does not.
      // The timer-firing no-data batch can commit after
      // processAllAvailable returns (see StreamGateSpec's st5b test), so
      // poll for the positive half; the negative half (no z) is stable
      // once x's alert has landed, because the watermark cannot move
      // again without data.
      feed.addData(("y", ts("10:00:30")))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 60000
      while (collected().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(collected() === Set(("x", ts("10:00:00"), 30000L)))
    } finally q.stop()
  }
}
