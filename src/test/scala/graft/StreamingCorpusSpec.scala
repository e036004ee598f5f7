package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The training-data operators on the LIVE path: a documents feed processed
  * as a stream. Stateless per-row ops (quality scoring, token counting) run
  * unchanged as streaming projections; exact dedup becomes the stateful
  * `dropDuplicatesWithinWatermark` on the content hash — state is evicted
  * once the watermark passes, so the query runs forever on an unbounded
  * corpus feed (the same bounded-state argument as the block-height dedup
  * in BlockFeedSpec, applied to corpus ingestion).
  */
class StreamingCorpusSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("scorpus-test").getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stateless quality scoring is batch/stream identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa x"),
      (2L, "short"))
    def score(df: org.apache.spark.sql.DataFrame) = {
      import graft.functions.TextHash.tokens
      val nTok = size(tokens(col("text")))
      df.select(col("doc_id"), nTok.as("n_tokens"),
        (length(col("text")).cast("double") / nTok.cast("double")).as("mean_tok_len"))
    }
    val stream = MemoryStream[(Long, String)]
    val q = score(stream.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sc_quality").start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sc_quality").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val batch = score(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("tx17 rulebook is batch/stream identical on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again today"),
      (1L, "supercalifragilisticexpialidocious antidisestablishmentarianism"),
      (2L, "a a a a a a a a a a a a a a a a a a a a"),
      (3L, "too short"),
      (4L, ""))
    def asRows(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val stream = MemoryStream[(Long, String)]
    val q = graft.queries.Text.qualityRuleCols(stream.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sc_rules").start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val streamed = asRows(spark.table("sc_rules").collect())
      val batch = asRows(
        graft.queries.Text.qualityRuleCols(docs.toDF("doc_id", "text")).collect())
      assert(streamed === batch)
      // the rulebook fires as designed on the crafted rows
      val byId = batch.map(t => t._1 -> t).toMap
      assert(byId(0L)._6, "clean doc must keep")
      assert(byId(1L)._3 && !byId(1L)._6, "long-words rule must fire")
      assert(byId(2L)._5 && !byId(2L)._6, "repetition rule must fire")
      assert(byId(3L)._2 && !byId(3L)._6, "too-short rule must fire")
      assert(byId(4L)._2 && byId(4L)._3 && !byId(4L)._6, "empty doc drops")
    } finally q.stop()
  }

  test("file-source replay: parquet drops stream in as micro-batches") {
    import spark.implicits._
    // the replay path for a K2-style file sink: a directory of parquet
    // files IS a streaming source — drops are picked up per trigger, so an
    // archived corpus replays through the same streaming plan as a live feed
    val dir = java.nio.file.Files.createTempDirectory("corpus_feed").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val total = docs.count()
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$dir/chunk=0")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING"))
      .option("maxFilesPerTrigger", 1) // admission control, T6-style
      .parquet(s"$dir/*")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory")
      .queryName("sc_files").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("sc_files").agg(sum($"n")).collect()(0).getLong(0)
      // second drop arrives later; the running aggregate catches up
      docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/chunk=1")
      q.processAllAvailable()
      val afterSecond = spark.table("sc_files").agg(sum($"n")).collect()(0).getLong(0)
      assert(afterFirst < total && afterSecond === total)
    } finally q.stop()
  }

  test("stream-static join: live feed enriched from a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the stateless enrichment shape: no watermark, no state store — the
    // static side is planned as a broadcast per micro-batch, so a 100 TB/day
    // feed joins a dimension table without shuffling the stream
    val dim = Seq(("en", "english"), ("es", "spanish")).toDF("lang", "lang_name")
    val feed = MemoryStream[(Long, String)]
    val enriched = feed.toDF.toDF("doc_id", "lang")
      .join(broadcast(dim), Seq("lang"), "left")
    val q = enriched.writeStream.format("memory")
      .queryName("sc_enrich").outputMode("append").start()
    try {
      feed.addData((0L, "en"), (1L, "zh"), (2L, "es"))
      q.processAllAvailable()
      val got = spark.table("sc_enrich")
        .select($"doc_id", $"lang_name").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got === Set(
        (0L, Some("english")), (1L, None), (2L, Some("spanish"))))
    } finally q.stop()
  }

  test("streaming exact dedup drops replayed content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = MemoryStream[(Long, Timestamp, String)]
    val deduped = feed.toDF.toDF("doc_id", "arrival_ts", "text")
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark("arrival_ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_hash")
    val q = deduped.writeStream.format("memory")
      .queryName("sc_dedup").outputMode("append").start()
    try {
      feed.addData(
        (0L, ts("2024-01-01 10:00:00"), "alpha"),
        (1L, ts("2024-01-01 10:01:00"), "beta"))
      q.processAllAvailable()
      // same content replayed inside the watermark horizon -> dropped,
      // regardless of a different doc_id
      feed.addData(
        (2L, ts("2024-01-01 10:05:00"), "alpha"),
        (3L, ts("2024-01-01 10:06:00"), "gamma"))
      q.processAllAvailable()
      val kept = spark.table("sc_dedup").select($"doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept === Set(0L, 1L, 3L))
    } finally q.stop()
  }

  test("stateful dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production state backend (Main's stateStore=rocksdb flag): state
    // off-heap on local disk, changelog to the checkpoint — verify the
    // bundled provider actually loads and produces identical results
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val feed = MemoryStream[(Long, Timestamp, String)]
      val q = feed.toDF.toDF("doc_id", "arrival_ts", "text")
        .withColumn("text_hash", sha2(col("text"), 256))
        .withWatermark("arrival_ts", "1 hour")
        .dropDuplicatesWithinWatermark("text_hash")
        .writeStream.format("memory").queryName("sc_rocks").outputMode("append")
        .start()
      try {
        feed.addData(
          (0L, ts("2024-01-01 10:00:00"), "alpha"),
          (1L, ts("2024-01-01 10:01:00"), "beta"),
          (2L, ts("2024-01-01 10:02:00"), "alpha"))
        q.processAllAvailable()
        val kept = spark.table("sc_rocks").select($"doc_id").collect()
          .map(_.getLong(0)).toSet
        assert(kept === Set(0L, 1L))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("composed corpus pipeline: quality gate → watermark dedup → LSH relay") {
    import spark.implicits._
    import graft.functions.TextHash.tokens
    implicit val sqlCtx = spark.sqlContext
    // the pipe1 stages on the LIVE path. Stage boundary between the dedup
    // query and the LSH query is a relay (a Kafka topic / delta table in
    // production) — chaining two arbitrary stateful operators in one query
    // is not the deployment shape anyway.
    val raw = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // inject exact duplicates (re-crawls) with new ids
    val withDupes = raw ++ raw.take(30).map { case (id, t) => (id + 100000L, t) }

    val feed = MemoryStream[(Long, String)]
    val stage1 = feed.toDF.toDF("doc_id", "text")
      // stage 1: structural quality gate (stateless, rides the scan)
      .filter(size(tokens($"text")) >= 5)
      // stage 2: exact dedup on content hash, state bounded by watermark
      .withColumn("arrival_ts", lit(ts("2024-01-01 10:00:00")))
      .withColumn("text_hash", sha2($"text", 256))
      .withWatermark("arrival_ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_hash")
    val q1 = stage1.writeStream.format("memory")
      .queryName("pipe_stage12").outputMode("append").start()
    try {
      feed.addData(withDupes.take(300))
      q1.processAllAvailable()
      feed.addData(withDupes.drop(300))
      q1.processAllAvailable()
    } finally q1.stop()

    val survivors = spark.table("pipe_stage12").select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    // dedup dropped every injected re-crawl (first arrival wins)
    val batchExpected = withDupes
      .filter(_._2.split("\\s+").count(_.nonEmpty) >= 5)
      .groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSet
    assert(survivors.toSet === batchExpected)

    // stage 3: online LSH near-dup candidates over the deduped stream
    val relay = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingLsh.candidatePairs(
      graft.streaming.StreamingLsh.bandRows(relay.toDF.toDF("doc_id", "text")), 0.5)
      .writeStream.format("memory").queryName("pipe_stage3")
      .outputMode("append").start()
    try {
      relay.addData(survivors)
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.table("pipe_stage3")
      .select($"docA", $"docB").as[(Long, Long)].collect().toSet
    val ids = survivors.map(_._1).toSet
    // candidates only among survivors, and none between exact duplicates
    // (those were removed upstream)
    assert(pairs.forall { case (a, b) => ids(a) && ids(b) })
    // matches the batch dd4 candidate set restricted to >= 0.5 agreement
    val batchPairs = queries.Dedup.lshCandidates
      .run(spark, "/root/testdata/sf0.001")
      .filter($"sig_agreement" >= 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === batchPairs)
  }

  test("pipe2 tail on the live path: decontaminate + sample, batch-identical") {
    import spark.implicits._
    import graft.functions.TextHash.{shinglesK, tokens}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the probe set is benchmark-sized and corpus-independent: built once
    // batch-side and shipped as a broadcast membership structure.
    // Contamination is a PER-ROW property (does this doc share a probe
    // 4-gram?), so the streaming shape is a stateless membership check —
    // no anti-join against a stream-derived relation (which Structured
    // Streaming rightly refuses: the right side would be unbounded state)
    val probes = Tables.load(spark, dir, "documents")
      .filter($"doc_id" < 5)
      .select(explode(shinglesK(tokens($"text"), 4)).as("shingle"))
      .distinct()
    val probeShingles: Seq[String] = probes.as[String].collect().toSeq
    def tail(df: org.apache.spark.sql.DataFrame) = df
      .filter(size(array_intersect(shinglesK(tokens($"text"), 4),
        typedLit(probeShingles))) === 0)
      .withColumn("sample_key", ($"doc_id" * 2654435761L) % 4294967296L)
      .filter($"sample_key" < 2147483648L)
      .select($"doc_id")
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val feed = MemoryStream[(Long, String)]
    val q = tail(feed.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pipe2_live").start()
    try {
      feed.addData(docs.take(200)); q.processAllAvailable()
      feed.addData(docs.drop(200)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("pipe2_live").as[Long].collect().toSet
    // semantic equivalence vs the RELATIONAL batch formulation (pipe2's
    // broadcast join + anti join): the per-row membership check must select
    // exactly the same documents
    val batchDocs = docs.toDF("doc_id", "text")
    val contaminated = batchDocs
      .select($"doc_id", explode(shinglesK(tokens($"text"), 4)).as("shingle"))
      .join(broadcast(probes), "shingle")
      .select("doc_id").distinct()
    val batch = batchDocs.join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("sample_key", ($"doc_id" * 2654435761L) % 4294967296L)
      .filter($"sample_key" < 2147483648L)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    // the probe documents contaminate themselves out of the stream too
    assert(streamed.intersect((0L until 5L).toSet).isEmpty)
  }

  test("online embedding outlier scoring against a broadcast model") {
    import spark.implicits._
    import graft.functions.TextHash.quantize
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // model-apply in streaming: the per-label centroid/stat table is model
    // state (domain-bounded, built batch-side like sim10), broadcast into
    // the stream; scoring fresh embeddings is then a stateless projection —
    // the shape an embedding-QA monitor runs on a live ingest feed
    val q0 = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", quantize($"embedding").as("qv"))
    val ex = q0.select($"vec_id", $"label", posexplode($"qv").as(Seq("pos", "v")))
    val cent = ex.groupBy($"label", $"pos")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    // score = exact integer distance numerator vs the broadcast centroids
    def score(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"label", posexplode($"qv").as(Seq("pos", "v")))
      .join(broadcast(cent), Seq("label", "pos"))
      .withColumn("diff", $"v" * $"n" - $"sv")
      .groupBy($"vec_id", $"label")
      .agg(sum($"diff" * $"diff").as("num_sum"))
    val vecs = q0.as[(Long, Int, Seq[Long])].collect().toSeq
    val feed = MemoryStream[(Long, Int, Seq[Long])]
    val q = score(feed.toDF.toDF("vec_id", "label", "qv"))
      .writeStream.format("memory").queryName("outlier_live")
      .outputMode("update").start()
    try {
      feed.addData(vecs); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("outlier_live")
      .select($"vec_id", $"num_sum").as[(Long, Long)].collect().toMap
    val batch = score(q0).select($"vec_id", $"num_sum")
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch && batch.nonEmpty)
  }
}
