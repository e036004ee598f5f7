package graft

import graft.streaming.StreamingLsh
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online LSH near-dup detection ≡ the batch dd4 band join: streaming the
  * corpus through the per-band signature store yields exactly the batch
  * candidate set with exactly the batch agreement scores, independent of
  * how the stream is chunked into micro-batches.
  */
class StreamingLshSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("slsh-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("streamed candidate pairs match batch dd4 across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val (first, second) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[(Long, String)]
    val pairs = StreamingLsh.candidatePairs(
      StreamingLsh.bandRows(stream.toDF.toDF("doc_id", "text")),
      minAgreement = 0.0)
    val q = pairs.writeStream.format("memory").queryName("slsh_pairs")
      .outputMode("append").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // a pair sharing multiple bands emits once per band — dedupe, then the
    // set must equal batch dd4 (doc_a, doc_b, agreement) exactly
    val streamed = spark.table("slsh_pairs")
      .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
        col("agreement").as("sig_agreement"))
      .distinct()
    val batch = queries.Dedup.lshCandidates.run(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0L,
      "streaming emitted pairs absent from batch dd4")
    assert(batch.exceptAll(streamed).count() === 0L,
      "batch dd4 pairs missing from the streamed candidates")
    assert(streamed.count() > 0)
  }

  test("event-time eviction: out-of-horizon residents stop producing pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again"
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val feed = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = feed.toDF.toDF("doc_id", "text", "arrival_ts")
    val q = graft.streaming.StreamingLsh.candidatePairsEvicting(
      graft.streaming.StreamingLsh.bandRowsTimed(docs)
        .withWatermark("eventTime", "10 minutes"), 0.5)
      .writeStream.format("memory").queryName("slsh_evict")
      .outputMode("append").start()
    try {
      feed.addData((1L, text, t("2024-01-01 10:00:00")))          // A
      q.processAllAvailable()
      // unrelated doc advances the watermark past A + 10 minutes
      feed.addData((2L, "completely different words entirely here now",
        t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // B = same content as A, but A is now outside the horizon: no pair
      feed.addData((3L, text, t("2024-01-01 11:01:00")))          // B
      q.processAllAvailable()
      // C = same content, inside B's horizon: pair (B, C) fires
      feed.addData((4L, text, t("2024-01-01 11:02:00")))          // C
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("slsh_evict").select("docA", "docB")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 4L)),
      s"expected only the in-horizon pair, got $pairs")
  }

  test("chunking invariance: 1 batch vs many batches, same pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.take(200)

    def run(name: String, chunks: Seq[Seq[(Long, String)]]): Set[(Long, Long)] = {
      val stream = MemoryStream[(Long, String)]
      val q = StreamingLsh.candidatePairs(
        StreamingLsh.bandRows(stream.toDF.toDF("doc_id", "text")), 0.5)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).select("docA", "docB").distinct()
        .as[(Long, Long)].collect().toSet
    }

    val oneShot = run("slsh_one", Seq(docs))
    val perDoc = run("slsh_many", docs.grouped(37).toSeq)
    assert(oneShot === perDoc)
  }
}
