package graft.queries

import graft.{GQuery, QueryPack, Tables}
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal pipeline operators over the `documents` corpus: binary media
  * manifest, stubbed feature decode (Column-expression twin of the kernel),
  * video-style frame sampling, and per-kind corpus stats. Every query is
  * DuckDB-oracle-checked; the batched kernel itself is asserted equal to the
  * expression twin in MultimodalSpec, so its math is transitively checked too.
  */
object Multimodal extends QueryPack {

  private def media(s: SparkSession, dir: String): DataFrame =
    Media.fromDocuments(Tables.load(s, dir, "documents"))

  private val sqlKind =
    "(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1]"

  /** Binary manifest: payload sizes, typed metadata, content digest. */
  val manifest = GQuery(
    "mm1_media_manifest",
    (s, dir) => media(s, dir).select(
      col("media_id"), col("kind"),
      col("meta.byte_len").as("byte_len"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"),
      sha2(col("content"), 256).as("content_sha")),
    Some(s"""
      SELECT doc_id AS media_id, $sqlKind AS kind,
             octet_length(encode(text)) AS byte_len,
             CAST(doc_id % 1024 + 16 AS INT) AS width,
             CAST(doc_id % 768 + 16 AS INT) AS height,
             CAST(ceil(length(text) / ${Media.FrameChars}.0) AS INT) AS n_frames,
             sha256(text) AS content_sha
      FROM documents"""))

  /** Stub decode features, exploded to scalars for the hash compare. */
  val features = GQuery(
    "mm2_media_features",
    (s, dir) => media(s, dir)
      .select(col("media_id"), col("content").cast("string").as("t"))
      .select(
        col("media_id"),
        posexplode(Media.featureExprs(col("t")))
          .as(Seq("feat_idx", "feat_val"))),
    Some(s"""
      SELECT doc_id AS media_id,
             CAST(unnest(range(0, ${Media.NFeatures})) AS INT) AS feat_idx,
             unnest([${(0 until Media.NFeatures)
               .map(d => Media.sqlFeature("text", d)).mkString(", ")}]) AS feat_val
      FROM documents"""))

  /** Frame sampling: every 2nd 32-char frame, first 8 candidates. */
  val frames = GQuery(
    "mm3_frame_sample",
    (s, dir) => media(s, dir)
      .select(col("media_id"), col("content").cast("string").as("t"))
      .select(
        col("media_id"),
        explode(Media.sampleFrames(col("t"), 2, 8)).as("f"))
      .select(col("media_id"), col("f.frame_index"), col("f.frame_hash")),
    Some(s"""
      WITH f AS (
        SELECT doc_id AS media_id, unnest(range(0, 8)) AS i, text
        FROM documents)
      SELECT media_id,
             CAST(i * 2 AS INT) AS frame_index,
             ${graft.functions.TextHash.sqlPolyHash(
               s"substr(text, CAST(i * 2 * ${Media.FrameChars} + 1 AS INT), ${Media.FrameChars})")}
               AS frame_hash
      FROM f
      WHERE length(substr(text, CAST(i * 2 * ${Media.FrameChars} + 1 AS INT),
                          ${Media.FrameChars})) > 0"""))

  /** Per-kind corpus stats over the typed metadata (blob columns untouched —
    * metadata pruning is the point of the split schema).
    */
  val kindStats = GQuery(
    "mm4_kind_stats",
    (s, dir) => media(s, dir)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.byte_len")).as("total_bytes"),
        sum(col("meta.n_frames").cast("long")).as("total_frames")),
    Some(s"""
      SELECT $sqlKind AS kind, COUNT(*) AS n_media,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             CAST(SUM(CAST(ceil(length(text) / ${Media.FrameChars}.0) AS BIGINT))
               AS BIGINT) AS total_frames
      FROM documents GROUP BY 1"""))

  /** Resize: truncate-or-pad the decoded feature vector to a fixed target
    * width (6 = pad the 4 stub dims with zeros; the shape-normalization
    * step before batching vectors into a model). Pure array math, no kernel.
    */
  val resized = GQuery(
    "mm5_resized_features",
    (s, dir) => media(s, dir)
      .select(col("media_id"), col("content").cast("string").as("t"))
      // stage the decoded vector: resizeFeatures references its input inside
      // a HOF lambda, so it must be a plain column, not the decode tree
      // (HOF re-evaluation trap)
      .select(col("media_id"), Media.featureExprs(col("t")).as("fv"))
      .select(
        col("media_id"),
        posexplode(Media.resizeFeatures(col("fv"), 6))
          .as(Seq("feat_idx", "feat_val"))),
    Some(s"""
      SELECT doc_id AS media_id,
             CAST(unnest(range(0, 6)) AS INT) AS feat_idx,
             unnest([${(0 until 6).map(d =>
               if (d < Media.NFeatures) Media.sqlFeature("text", d)
               else "CAST(0 AS BIGINT)").mkString(", ")}]) AS feat_val
      FROM documents"""))

  /** Audio chunking: overlapping 64-char windows every 48 chars over the
    * audio-kind payloads (the streaming-ASR segmentation shape) — variable
    * chunk count per payload, pure array math, no shuffle.
    */
  val audioChunks = GQuery(
    "mm6_audio_chunks",
    (s, dir) => media(s, dir)
      .filter(col("kind") === "audio")
      .select(col("media_id"), col("content").cast("string").as("t"))
      .filter(length(col("t")) > 0)
      .select(col("media_id"), explode(Media.audioChunks(col("t"), 64, 48)).as("c"))
      .select(col("media_id"), col("c.chunk_index"), col("c.start_off"),
        col("c.chunk_len"), col("c.chunk_hash")),
    Some(s"""
      WITH a AS (
        SELECT doc_id AS media_id, text AS t, length(text) AS n
        FROM documents
        WHERE doc_id % 3 = 1 AND length(text) > 0),
      c AS (
        SELECT media_id, t, unnest(range(0, (n - 1) // 48 + 1)) AS i
        FROM a)
      SELECT media_id,
             CAST(i AS INT) AS chunk_index,
             CAST(i * 48 AS INT) AS start_off,
             CAST(length(substr(t, CAST(i * 48 + 1 AS INT), 64)) AS INT)
               AS chunk_len,
             ${graft.functions.TextHash.sqlPolyHash(
               "substr(t, CAST(i * 48 + 1 AS INT), 64)")} AS chunk_hash
      FROM c"""))

  /** Per-kind feature standardization (z-scores): the normalize-before-
    * training step. Two passes — a tiny (kind, feat_idx) moment aggregate
    * (12 rows: exact integer sums + sums of squares through DECIMAL(38)),
    * broadcast-joined back onto the feature rows for the scalar z map.
    * The big side is scanned twice and shuffled never (the stats side is
    * KB-sized at any corpus scale). Double math (mean/std/z) is the same
    * expression sequence in both engines, so results agree bit-for-bit from
    * identical exact-integer inputs; zero-variance groups emit NULL.
    */
  val featureZscores = GQuery(
    "mm7_feature_zscores",
    (s, dir) => {
      val f = media(s, dir)
        .select(col("media_id"), col("kind"), col("content").cast("string").as("t"))
        .select(col("media_id"), col("kind"),
          posexplode(Media.featureExprs(col("t"))).as(Seq("feat_idx", "v")))
      val stats = f.groupBy(col("kind"), col("feat_idx"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("s"),
          sum((col("v") * col("v")).cast("decimal(38,0)")).as("s2"))
        .select(col("kind"), col("feat_idx"),
          (col("s").cast("double") / col("n")).as("mean"),
          sqrt(col("s2").cast("double") / col("n") -
            (col("s").cast("double") / col("n")) *
              (col("s").cast("double") / col("n"))).as("std"))
      f.join(broadcast(stats), Seq("kind", "feat_idx"))
        .select(col("media_id"), col("kind"), col("feat_idx"),
          when(col("std") > 0,
            (col("v").cast("double") - col("mean")) / col("std")).as("z"))
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id AS media_id, $sqlKind AS kind,
               CAST(unnest(range(0, ${Media.NFeatures})) AS INT) AS feat_idx,
               unnest([${(0 until Media.NFeatures)
                 .map(d => Media.sqlFeature("text", d)).mkString(", ")}]) AS v
        FROM documents),
      stats AS (
        SELECT kind, feat_idx, COUNT(*) AS n,
               SUM(v) AS s, SUM(v * v) AS s2
        FROM f GROUP BY 1, 2),
      m AS (
        SELECT kind, feat_idx,
               CAST(s AS DOUBLE) / n AS mean,
               sqrt(CAST(s2 AS DOUBLE) / n -
                 (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
        FROM stats)
      SELECT media_id, f.kind, f.feat_idx,
             CASE WHEN std > 0 THEN (CAST(v AS DOUBLE) - mean) / std END AS z
      FROM f JOIN m ON f.kind = m.kind AND f.feat_idx = m.feat_idx"""))

  /** Media near-duplicate pairs: perceptual-hash-style dedup over the
    * payloads — every media's frame hashes collapse into a 32-bit SimHash
    * "perceptual fingerprint", and pairs within Hamming distance 3 are
    * surfaced by the dd10 pigeonhole band join (4 exact 8-bit bands ⇒ ≤3
    * differing bits always share a band — PERFECT recall, no cross join).
    * With a real codec the frame hashes become decoded-frame features; the
    * fingerprint/banding plan is unchanged.
    *
    * The oracle brute-forces the O(n²) Hamming space (fine at oracle
    * scale); the engine plan is the banded hash join that survives 100 TB.
    */
  val mediaNearDup = GQuery(
    "mm8_media_near_dup",
    (s, dir) => {
      import graft.functions.TextHash.simhash32
      val fp = media(s, dir)
        .select(col("media_id"), col("content").cast("string").as("t"))
        .select(col("media_id"),
          transform(Media.sampleFrames(col("t"), 1, 20), f => f("frame_hash"))
            .as("hs"))
        .select(col("media_id"), simhash32(col("hs")).as("fp"))
        .persist() // feeds both sides of the band self-join
      val bands = fp.select(col("media_id"), col("fp"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("fp"), 8 * b).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "band_val")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.media_id") < col("b.media_id"))
        .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 3)
        .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("int").as("hamming"))
        .distinct()
    },
    Some {
      val sub = "substr(text, CAST(i*32+1 AS INT), 32)"
      s"""
      WITH fh AS (
        SELECT doc_id AS media_id,
               list_transform(
                 list_filter(range(0, 20), i -> length($sub) > 0),
                 i -> ${graft.functions.TextHash.sqlPolyHash(sub)}) AS hs
        FROM documents),
      s AS (SELECT media_id, ${graft.functions.TextHash.sqlSimhash32("hs")} AS fp
            FROM fh)
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM s a JOIN s b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3"""
    })

  /** Scene-cut detection: segment each payload's frame sequence where the
    * per-frame signal jumps — the shot-boundary pass a video pipeline runs
    * before sampling one representative frame per scene (uniform sampling
    * oversamples long static shots and misses short ones; mm3's stride
    * sampler composed with these boundaries fixes that). The stub
    * per-frame signal is ink density (non-blank chars per 32-char frame
    * window — the deterministic stand-in for a luminance histogram); a cut
    * fires when consecutive densities differ by ≥ 6.
    *
    * Scale shape: frames explode per payload (bounded: ≤ 20), the
    * cut/scene windows run per media_id (uniform key, one shuffle), and
    * the output is one summary row per payload. The real-codec swap
    * changes only the per-frame signal expression.
    */
  val sceneCuts = GQuery(
    "mm9_scene_cuts",
    (s, dir) => {
      val fr = media(s, dir)
        .select(col("media_id"), col("content").cast("string").as("t"))
        .select(col("media_id"), posexplode(filter(
          array((0 until 20).map { i =>
            val slice = substring(col("t"), i * 32 + 1, 32)
            struct(
              length(regexp_replace(slice, "\\s", "")).cast("long")
                .as("density"),
              length(slice).as("flen"))
          }: _*),
          f => f("flen") > 0)).as(Seq("pos", "f")))
        .select(col("media_id"), col("pos"), col("f.density").as("density"))
      val byMedia = Window.partitionBy(col("media_id")).orderBy(col("pos"))
      val scenes = fr
        .withColumn("cut",
          when(abs(col("density") -
            lag(col("density"), 1).over(byMedia)) >= 6, 1L).otherwise(0L))
        .withColumn("scene_id", sum(col("cut")).over(
          byMedia.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      scenes
        .groupBy(col("media_id"), col("scene_id"))
        .agg(count(lit(1)).as("scene_len"), sum(col("cut")).as("cuts"))
        .groupBy(col("media_id"))
        .agg(
          sum(col("scene_len")).as("n_frames"),
          sum(col("cuts")).as("n_cuts"),
          count(lit(1)).as("n_scenes"),
          max(col("scene_len")).as("max_scene_len"))
    },
    Some("""
      WITH fr0 AS (
        SELECT doc_id AS media_id, i AS pos,
               substr(text, CAST(i*32+1 AS INT), 32) AS slice
        FROM documents, (SELECT UNNEST(range(0, 20)) AS i)),
      fr AS (
        SELECT media_id, pos,
               CAST(length(regexp_replace(slice, '\s', '', 'g')) AS BIGINT)
                 AS density
        FROM fr0 WHERE length(slice) > 0),
      marked AS (
        SELECT media_id, pos, density,
               CASE WHEN abs(density - lag(density)
                              OVER (PARTITION BY media_id ORDER BY pos)) >= 6
                    THEN 1 ELSE 0 END AS cut
        FROM fr),
      scened AS (
        SELECT *, CAST(SUM(cut) OVER (PARTITION BY media_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
        FROM marked),
      per_scene AS (
        SELECT media_id, scene_id, COUNT(*) AS scene_len,
               CAST(SUM(cut) AS BIGINT) AS cuts
        FROM scened GROUP BY 1, 2)
      SELECT media_id, CAST(SUM(scene_len) AS BIGINT) AS n_frames,
             CAST(SUM(cuts) AS BIGINT) AS n_cuts,
             COUNT(*) AS n_scenes,
             MAX(scene_len) AS max_scene_len
      FROM per_scene GROUP BY 1"""))

  override def queries: Seq[GQuery] =
    Seq(manifest, features, frames, kindStats, resized, audioChunks,
      featureZscores, mediaNearDup, sceneCuts)
}
