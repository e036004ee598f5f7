package graft.multimodal

import graft.functions.TextHash
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages over them.
  *
  * Container constraints (no image/audio codecs available) mean the decode
  * kernel is a STUB — a deterministic fake that hashes fixed-size byte frames
  * into a feature vector. Everything around the stub is real and is what
  * matters at 100 TB:
  *   - schema: `content binary` + a typed `meta` struct, so Parquet stores
  *     payloads as raw byte arrays (no base64 inflation) and metadata columns
  *     prune/push down independently of the blobs;
  *   - the batched kernel boundary: [[decodeFeatures]] runs per *partition*
  *     over typed case classes ([[MediaRow]] → [[MediaFeatures]]), the Scala
  *     analogue of a batched Python `mapInPandas` kernel — swap the stub body
  *     for a real codec without touching the plan;
  *   - a Column-expression twin ([[featureExprs]]) of the same math, kept in
  *     whole-stage codegen, which the DuckDB oracle recomputes — the spec
  *     asserts kernel ≡ expression, transitively oracle-checking the kernel;
  *   - frame sampling / resizing as pure array ops (no kernel needed at all).
  *
  * Media rows derive deterministically from the `documents` table (the
  * driver's corpus): content = UTF-8 bytes of `text`, kind = doc_id mod 3.
  */
object Media {

  final case class MediaMeta(byteLen: Long, width: Int, height: Int,
                             sampleRate: Int, nFrames: Int)
  final case class MediaRow(mediaId: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(mediaId: Long, features: Seq[Long])

  val Kinds = Seq("image", "audio", "video")
  val FrameChars = 32   // chars per fake "frame"
  val NFeatures = 4     // fake decoded feature dims
  val FeatureSpan = 64  // chars hashed per feature dim

  /** documents → media: opaque binary payload + typed metadata struct. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Kinds.toArray), (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        (col("doc_id") % 1024 + 16).cast("int").as("width"),
        (col("doc_id") % 768 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        ceil(length(col("text")).cast("double") / FrameChars).cast("int").as("n_frames"))
        .as("meta"))

  /** The stub decode kernel body: feature d = rolling hash of the d-th
    * [[FeatureSpan]]-char slice. Deterministic, codec-shaped (bytes in,
    * fixed-length vector out).
    */
  private[multimodal] def decodeStub(content: Array[Byte]): Seq[Long] = {
    val s = new String(content, "UTF-8")
    (0 until NFeatures).map { d =>
      val from = d * FeatureSpan
      val slice =
        if (from >= s.length) "" else s.substring(from, math.min(from + FeatureSpan, s.length))
      graft.functions.PolyHash.hash(slice)
    }
  }

  /** Batched decode boundary: one kernel invocation per partition, streaming
    * typed rows through it (mapInPandas shape). Partitioning is preserved —
    * no shuffle enters the plan.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as("mediaId"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions(rows => rows.map(r => MediaFeatures(r.mediaId, decodeStub(r.content))))
  }

  /** Column-expression twin of [[decodeStub]] — stays in codegen, and is
    * reproducible in DuckDB SQL ([[sqlFeature]]) for the oracle.
    *
    * PERF: an explicit `array(...)` of literal-offset slices, not
    * `transform(sequence(0, n-1), d => ...)` — the dimension count is a
    * compile-time constant, and keeping `text` out of a lambda body avoids
    * per-element re-evaluation of whatever expression feeds it (HOF lambdas
    * are interpreted with no CSE).
    */
  def featureExprs(text: Column): Column =
    array((0 until NFeatures).map(d =>
      TextHash.polyHash(
        substring(text, lit(d * FeatureSpan + 1), lit(FeatureSpan)))): _*)

  def sqlFeature(e: String, d: Int): String =
    TextHash.sqlPolyHash(s"substr($e, ${d * FeatureSpan + 1}, $FeatureSpan)")

  /** Frame sampling (video-style): split into [[FrameChars]]-char frames,
    * keep every `step`-th up to `maxFrames`, hash each — pure array ops.
    * Literal frame offsets for the same reason as [[featureExprs]].
    */
  def sampleFrames(text: Column, step: Int, maxFrames: Int): Column =
    filter(
      array((0 until maxFrames).map { i =>
        val slice = substring(text, lit(i * step * FrameChars + 1), lit(FrameChars))
        struct(
          lit(i * step).as("frame_index"),
          TextHash.polyHash(slice).as("frame_hash"),
          length(slice).as("frame_len"))
      }: _*),
      f => f("frame_len") > 0)

  /** "Resize": truncate-or-pad a feature vector to `k` dims (pad value 0) —
    * the array-shape half of a real resize, no kernel required.
    */
  def resizeFeatures(features: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(element_at(features, i + 1), lit(0L)))

  /** Audio-style OVERLAPPING chunking: `chunkLen`-char windows every `step`
    * chars (step < chunkLen ⇒ overlap, the streaming-ASR shape), hashed.
    * Chunk count varies with payload length, so offsets come from
    * `sequence(0, (len-1) div step)` — `text` must be a bound attribute
    * (plain column) at the call site: the lambda body runs per element and
    * re-evaluates any non-attribute input subtree (HOF re-evaluation trap).
    * Caller must ensure non-empty text (`sequence` would run DESCENDING for
    * an empty payload).
    */
  def audioChunks(text: Column, chunkLen: Int, step: Int): Column =
    transform(
      sequence(lit(0L), floor((length(text) - 1) / step).cast("long")),
      i => {
        val slice = text.substr((i * step + 1).cast("int"), lit(chunkLen))
        struct(
          i.cast("int").as("chunk_index"),
          (i * step).cast("int").as("start_off"),
          length(slice).as("chunk_len"),
          TextHash.polyHash(slice).as("chunk_hash"))
      })
}
