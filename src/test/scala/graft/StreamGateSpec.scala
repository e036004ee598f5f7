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

  private def streamedCounts(srcDir: String,
                             maxFiles: Option[Int],
                             ckpt: Option[String],
                             name: String): DataFrame = {
    val schema = spark.read.parquet(s"$chunkedDir/events.parquet").schema
    var reader = spark.readStream.schema(schema)
    maxFiles.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val ev = reader.parquet(s"$srcDir/events.parquet")
      .select(col("event_type"), col("ts"))
    var writer = graft.streaming.StreamingVolume.dailyCounts(ev)
      .writeStream.format("memory").queryName(name).outputMode("complete")
    ckpt.foreach(c => writer = writer.option("checkpointLocation", c))
    val q = writer.trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "drain timed out")
    q.stop()
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
    val streamed = asSet(streamedCounts(chunkedDir, Some(1), None,
      "sg_chunked"))
    assert(streamed === batch)
  }

  test("stop between arrivals, resume from checkpoint: exactly-once totals") {
    // DETERMINISTIC two-phase arrival (a mid-flight kill races batch
    // completion on a fast host): run 1 sees only the first chunk file and
    // drains to natural termination; the remaining chunks then land and
    // run 2 resumes from the same checkpoint. Exactly-once means the
    // resumed complete-mode state equals the batch aggregation — chunk 1
    // neither lost (offsets carry it) nor double-counted (state carries
    // its contribution).
    val stage = java.nio.file.Files.createTempDirectory("sg_stage").toString
    val tbl = java.nio.file.Paths.get(s"$stage/events.parquet")
    java.nio.file.Files.createDirectories(tbl)
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files
      .list(java.nio.file.Paths.get(s"$chunkedDir/events.parquet"))
      .iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    assert(parts.size === 3)
    def land(p: java.nio.file.Path): Unit =
      java.nio.file.Files.copy(p, tbl.resolve(p.getFileName.toString))
    val ckpt = java.nio.file.Files.createTempDirectory("sg_ckpt").toString
    land(parts.head)
    streamedCounts(stage, Some(1), Some(ckpt), "sg_resume_a")
    parts.tail.foreach(land)
    val resumed = asSet(
      streamedCounts(stage, Some(1), Some(ckpt), "sg_resume_b"))
    val batch = asSet(graft.streaming.StreamingVolume.dailyCounts(
      Tables.load(spark, dir, "events")))
    assert(resumed === batch,
      "restart from checkpoint must neither lose nor double-count chunks")
  }
}
