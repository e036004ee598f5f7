package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T8 on the live path: `session_window` as a STREAMING aggregation.
  * Sessions stay open (stateful) while events can still merge, and are
  * emitted exactly once when the watermark passes the session close — the
  * unbounded-feed counterpart of the batch `t8_session_windows` query
  * (same 30-minute gap semantics, state bounded by the watermark).
  */
class StreamingSessionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("ssession-test").getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming session windows merge in-gap events, close on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val sessions = events.toDF.toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))
    val q = sessions.writeStream.format("memory")
      .queryName("ssess").outputMode("append").start()
    try {
      events.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0),
        (2L, ts("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      // sessions still open: watermark (10:00) is behind every close
      assert(spark.table("ssess").count() === 0)

      // merges into user 1's open session (gap < 30 min from 10:10)
      events.addData((1L, ts("2024-01-01 10:20:00"), 3.0))
      q.processAllAvailable()
      assert(spark.table("ssess").count() === 0)

      // watermark jumps to 11:50 — both sessions (closing 10:50 / 10:35)
      // are final: emitted exactly once, merged counts intact
      events.addData((9L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssess")
        .select($"user_id", $"session_start", $"n_events", $"sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === Set(
        (1L, ts("2024-01-01 10:00:00"), 3L, 6.0),
        (2L, ts("2024-01-01 10:05:00"), 1L, 5.0)))
    } finally q.stop()
  }

  test("an exact-gap event MERGES into the open session (tie rule)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val sessions = events.toDF.toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("ssess_tie").outputMode("append").start()
    try {
      // second event exactly 30:00 after the first MERGES: Spark extends the
      // session window whenever ts <= prev + gap (verified for batch and
      // streaming alike — the batch oracle encodes the same rule with a
      // strict `> INTERVAL 30 minutes` new-session predicate)
      events.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:30:00"), 2.0))
      q.processAllAvailable()
      events.addData((9L, ts("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssess_tie")
        .select($"user_id", $"session_start", $"n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(got === Set((1L, ts("2024-01-01 10:00:00"), 2L)))
    } finally q.stop()
  }
}
