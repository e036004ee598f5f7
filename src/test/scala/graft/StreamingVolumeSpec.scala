package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingVolume

/** Streaming feed-volume monitor: the incremental (event_type, day) counts
  * must converge to the batch aggregation regardless of chunking or
  * arrival order (counts are CRDT-additive), and the shared
  * `Quality.volumeReadout` applied to the streamed state snapshot must
  * reproduce the batch dq7 gate row for row.
  */
class StreamingVolumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("svol-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  private type Ev = (String, java.sql.Timestamp)

  private def events(): Seq[Ev] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts")).as[Ev].collect().toSeq
  }

  private def streamedReadout(name: String, chunks: Seq[Seq[Ev]])
      : Set[(String, String, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[Ev]
    val df = feed.toDF.toDF("event_type", "ts")
    val q = StreamingVolume.dailyCounts(df).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      chunks.foreach { c => feed.addData(c: _*); q.processAllAvailable() }
      queries.Quality.volumeReadout(spark, spark.table(name))
        .as[(String, String, Long, Long, Long, Boolean)].collect().toSet
    } finally q.stop()
  }

  test("streamed snapshot + shared readout ≡ batch dq7, chunked or reversed") {
    import spark.implicits._
    val batch = queries.Quality.volumeAnomaly.run(spark, dir)
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    val evs = events()
    val inOrder = streamedReadout("svol_a", evs.grouped(700).toSeq)
    assert(inOrder === batch)
    // adversarial: reversed arrival order, different chunk boundaries —
    // additive counts make the state arrival-order-invariant
    val reversed = streamedReadout("svol_b", evs.reverse.grouped(333).toSeq)
    assert(reversed === batch)
  }
}
