package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCdc

/** Streaming CDC snapshot: the incremental latest-wins materialization must
  * converge to the batch MERGE result regardless of how the changelog is
  * batched or ordered (max_by over a total order is associative), and
  * tombstones must beat older upserts that arrive later.
  */
class StreamingCdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("scdc-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  private def changelog() = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        col("value"))
      .as[(Long, Long, java.sql.Timestamp, String, Double)]
      .collect().toSeq
  }

  private def runChunks(
      name: String,
      chunks: Seq[Seq[(Long, Long, java.sql.Timestamp, String, Double)]])
      : Set[(Long, Long, Double, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val df = feed.toDF.toDF("user_id", "event_id", "ts", "op", "value")
    val q = StreamingCdc.snapshot(df).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      chunks.foreach { c => feed.addData(c: _*); q.processAllAvailable() }
      spark.table(name)
        .select($"user_id", $"as_of_ms", $"current_value", $"n_changes")
        .as[(Long, Long, Double, Long)].collect().toSet
    } finally q.stop()
  }

  test("streaming snapshot equals the batch MERGE under any chunking/order") {
    import spark.implicits._
    val log = changelog()
    // batch expectation from the oracled cdc1 operator (shared columns)
    val expected = graft.queries.Cdc.latestSnapshot.run(spark, dir)
      .select($"user_id", $"as_of_ms", $"current_value", $"n_changes")
      .as[(Long, Long, Double, Long)].collect().toSet

    val inOrder = runChunks("scdc_a", log.grouped(400).toSeq)
    assert(inOrder == expected,
      s"in-order streaming snapshot diverged: ${inOrder.size} vs ${expected.size}")

    // adversarial chunking: reversed log in uneven chunks — every entity's
    // newest change arrives FIRST, older changes trickle in later and must
    // all lose to it
    val reversed = runChunks("scdc_b",
      Seq(log.reverse.take(7), log.reverse.slice(7, 500), log.reverse.drop(500)))
    assert(reversed == expected, "arrival order changed the snapshot")
  }

  test("a tombstone beats an older upsert that arrives after it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val feed = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val df = feed.toDF.toDF("user_id", "event_id", "ts", "op", "value")
    val q = StreamingCdc.snapshot(df).writeStream
      .format("memory").queryName("scdc_tomb").outputMode("complete").start()
    try {
      // newest change for user 1 is a delete; the older upsert arrives late
      feed.addData((1L, 10L, t("2024-01-01 12:00:00"), "delete", 0.0),
                   (2L, 11L, t("2024-01-01 12:00:00"), "upsert", 5.0))
      q.processAllAvailable()
      feed.addData((1L, 9L, t("2024-01-01 11:00:00"), "upsert", 3.0))
      q.processAllAvailable()
      val snap = spark.table("scdc_tomb")
        .select($"user_id", $"current_value").as[(Long, Double)].collect().toSet
      assert(snap == Set((2L, 5.0)),
        s"late old upsert resurrected a deleted entity: $snap")
    } finally q.stop()
  }
}
