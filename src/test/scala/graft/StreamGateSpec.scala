package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The st-family gate queries run single-file tables (one micro-batch);
  * this spec drives the SAME operators through the real file source under
  * the conditions the gate can't produce: MULTI-batch arrival
  * (maxFilesPerTrigger=1 over a chunked copy of the table) and a
  * KILL/RESUME mid-stream from the checkpoint. Exactly-once through
  * restart: the final drained state must equal the batch aggregation —
  * no lost chunk, no double-counted chunk.
  */
class StreamGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("streamgate-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  /** The events table rewritten as a 3-file directory, so the file source
    * has real multi-batch work.
    */
  private lazy val chunkedDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("stream_chunks").toString
    Tables.load(spark, dir, "events")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  private def streamedCounts(maxFiles: Option[Int],
                             ckpt: Option[String],
                             name: String,
                             stopAfterFirstBatch: Boolean = false): DataFrame = {
    val schema = spark.read.parquet(s"$chunkedDir/events.parquet").schema
    var reader = spark.readStream.schema(schema)
    maxFiles.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val ev = reader.parquet(s"$chunkedDir/events.parquet")
      .select(col("event_type"), col("ts"))
    var writer = graft.streaming.StreamingVolume.dailyCounts(ev)
      .writeStream.format("memory").queryName(name).outputMode("complete")
    ckpt.foreach(c => writer = writer.option("checkpointLocation", c))
    val q = writer.trigger(Trigger.AvailableNow()).start()
    if (stopAfterFirstBatch) {
      // wait for the first committed batch, then kill mid-stream
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q.recentProgress.length < 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      q.stop()
    } else {
      assert(q.awaitTermination(120000), "drain timed out")
      q.stop()
    }
    spark.table(name)
  }

  private def asSet(df: DataFrame): Set[(String, String, Long)] = {
    import spark.implicits._
    df.select(col("event_type"), date_format(col("day"), "yyyy-MM-dd"),
      col("cnt")).as[(String, String, Long)].collect().toSet
  }

  test("multi-batch arrival accumulates to the batch aggregation") {
    val batch = asSet(graft.streaming.StreamingVolume.dailyCounts(
      Tables.load(spark, dir, "events")))
    val streamed = asSet(streamedCounts(Some(1), None, "sg_chunked"))
    assert(streamed === batch)
  }

  test("kill mid-stream, resume from checkpoint: exactly-once totals") {
    val ckpt = java.nio.file.Files.createTempDirectory("sg_ckpt").toString
    // run 1: one file per trigger, killed after the first committed batch
    streamedCounts(Some(1), Some(ckpt), "sg_resume_a",
      stopAfterFirstBatch = true)
    // run 2: resume from the same checkpoint to exhaustion
    val resumed = asSet(
      streamedCounts(Some(1), Some(ckpt), "sg_resume_b"))
    val batch = asSet(graft.streaming.StreamingVolume.dailyCounts(
      Tables.load(spark, dir, "events")))
    assert(resumed === batch,
      "restart from checkpoint must neither lose nor double-count chunks")
  }
}
