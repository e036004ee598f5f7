package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOhlc

/** Streaming OHLC bars: the incremental (user, day) candlesticks must
  * converge to the batch tsr3 result regardless of chunking or arrival
  * order — every bar component is associative over the (ts, event_id)
  * total order, which this spec stresses with an adversarial reversed
  * feed where each bar's CLOSE arrives before its OPEN.
  */
class StreamingOhlcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("sohlc-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  private type Obs = (Long, java.sql.Timestamp, Long, Double)

  private def observations(): Seq[Obs] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Obs].collect().toSeq
  }

  private def runChunks(name: String, chunks: Seq[Seq[Obs]])
      : Set[(Long, Long, Double, Double, Double, Double, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[Obs]
    val df = feed.toDF.toDF("user_id", "ts", "event_id", "value")
      .withColumn("day", date_trunc("DAY", col("ts")))
    val q = StreamingOhlc.bars(df).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      chunks.foreach { c => feed.addData(c: _*); q.processAllAvailable() }
      spark.table(name)
        .select(col("user_id"), unix_millis(col("day")).as("day_ms"),
          col("open"), col("high"), col("low"), col("close"),
          col("n_events"), col("turnover"))
        .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
        .collect().toSet
    } finally q.stop()
  }

  test("streamed bars equal batch tsr3 under any chunking and order") {
    import spark.implicits._
    val expected = queries.TimeSeries.ohlcBars.run(spark, dir)
      .select(col("user_id"), unix_millis(col("day")).as("day_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("turnover"))
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSet

    val obs = observations()
    val inOrder = runChunks("sohlc_a", obs.grouped(300).toSeq)
    assert(inOrder == expected, "in-order streamed bars diverged from batch")

    // adversarial: full reverse in uneven chunks — the close of every bar
    // arrives before its open, highs/lows interleave across chunks
    val reversed = runChunks("sohlc_b",
      Seq(obs.reverse.take(13), obs.reverse.slice(13, 450), obs.reverse.drop(450)))
    assert(reversed == expected, "arrival order changed the bars")
  }

  test("a late observation reopens and corrects an already-emitted bar") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val feed = MemoryStream[Obs]
    val df = feed.toDF.toDF("user_id", "ts", "event_id", "value")
      .withColumn("day", date_trunc("DAY", col("ts")))
    val q = StreamingOhlc.bars(df).writeStream
      .format("memory").queryName("sohlc_late").outputMode("complete").start()
    try {
      feed.addData((1L, t("2024-01-05 10:00:00"), 20L, 5.0),
                   (1L, t("2024-01-05 18:00:00"), 21L, 9.0))
      q.processAllAvailable()
      // late row is EARLIER than both: must become the open and the low
      feed.addData((1L, t("2024-01-05 01:00:00"), 19L, 2.0))
      q.processAllAvailable()
      val bar = spark.table("sohlc_late")
        .select(col("open"), col("high"), col("low"), col("close"),
          col("n_events"))
        .as[(Double, Double, Double, Double, Long)].collect().toSeq
      assert(bar == Seq((2.0, 9.0, 2.0, 9.0, 3L)), bar.toString)
    } finally q.stop()
  }
}
