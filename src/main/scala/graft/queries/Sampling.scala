package graft.queries

import graft.{GQuery, QueryPack, Tables}
import graft.functions.TextHash.{polyHash, shinglesK, sqlPolyHash, sqlShinglesK, tokens}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data composition — the stage between
  * cleaning and tokenization where a pipeline decides WHICH cleaned
  * documents make the mix. Everything is deterministic-by-construction:
  * sampling decisions come from a Knuth multiplicative hash of the stable
  * document id (pure BIGINT arithmetic, identical in any engine — never
  * `rand()`, which would be irreproducible across retries/engines), so a
  * re-run of the pipeline at 100 TB selects byte-identical corpora.
  *
  * 100 TB shapes: samp1 is a map-only filter (no shuffle at all); samp2 is
  * one hash-shuffle on the stratum key with a bounded per-group window;
  * samp3's rate table is a per-language aggregate (≤ #langs rows —
  * broadcast-safe by construction, unlike a per-user aggregate) joined back
  * as a true dimension.
  */
object Sampling extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** `u(doc_id)` ∈ [0, 2^32): Knuth multiplicative hash — uniform enough
    * for rate sampling, exact in BIGINT math on both engines.
    */
  private def u(id: Column): Column = (id * 2654435761L) % 4294967296L
  private val SqlU = "(doc_id * 2654435761) % 4294967296"

  /** Stratified Bernoulli sampling: per-language keep rates applied via the
    * hash threshold `u < rate·2^32`. Thresholds are exact integer constants
    * so membership is a pure integer comparison.
    */
  val stratifiedSample = GQuery(
    "samp1_stratified_sample",
    (s, dir) => docs(s, dir)
      .withColumn("sample_key", u(col("doc_id")))
      .withColumn("threshold",
        when(col("lang") === "en", 2147483648L)   // 0.5
          .when(col("lang") === "fr", 2147483648L) // 0.5
          .when(col("lang") === "de", 1073741824L) // 0.25
          .when(col("lang") === "es", 1073741824L) // 0.25
          .otherwise(536870912L))                  // zh 0.125
      .filter(col("sample_key") < col("threshold"))
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key")),
    Some(s"""
      SELECT doc_id, lang, source, $SqlU AS sample_key
      FROM documents
      WHERE $SqlU < CASE lang
        WHEN 'en' THEN 2147483648 WHEN 'fr' THEN 2147483648
        WHEN 'de' THEN 1073741824 WHEN 'es' THEN 1073741824
        ELSE 536870912 END"""))

  /** Deterministic "reservoir" of k=20 per source stratum: rank by the hash
    * (uniform ⇒ a uniform k-sample) with doc_id as total tie-break. The
    * reference point is reservoir sampling; hash-rank is its deterministic,
    * rerun-stable, merge-friendly equivalent — and the plan IS the
    * mergeable two-phase shape: a salted local top-k first (32-way
    * parallel inside every stratum), then the final top-k over ≤ 32·k
    * survivors per stratum. A single window per source would serialize
    * each stratum through one partition — the classic top-k-per-group
    * scale trap; phase one caps what the final window ever sees.
    */
  val reservoirPerStratum = GQuery(
    "samp2_reservoir_per_source",
    (s, dir) => {
      val local = row_number().over(
        Window.partitionBy(col("source"), pmod(col("doc_id"), lit(32L)))
          .orderBy(col("sample_key"), col("doc_id")))
      val rk = row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("sample_key"), col("doc_id")))
      docs(s, dir)
        .withColumn("sample_key", u(col("doc_id")))
        .withColumn("lrk", local)
        .filter(col("lrk") <= 20) // a global top-20 row is top-20 in its salt
        .withColumn("rk", rk)
        .filter(col("rk") <= 20)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("sample_key"))
    },
    Some(s"""
      SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, sample_key FROM (
        SELECT source, doc_id, $SqlU AS sample_key,
               row_number() OVER (PARTITION BY source
                 ORDER BY $SqlU, doc_id) AS rk
        FROM documents)
      WHERE rk <= 20"""))

  /** Domain/language mixture resampling: given a char budget (20% of the
    * corpus) split EQUALLY across languages, derive each language's keep
    * rate `min(1, target/lang_chars)` from a per-language aggregate and
    * sample by hash threshold. This is the "data mixing" step that rebalances
    * a web-skewed corpus toward a target composition. The rate table is
    * ≤ #langs rows — an aggregate that stays a broadcastable dimension at
    * any corpus size (contrast w16's per-user aggregate).
    */
  val mixtureResample = GQuery(
    "samp3_mixture_resample",
    (s, dir) => {
      val langChars = docs(s, dir).groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("lang_chars"))
        .withColumn("total_chars",
          sum(col("lang_chars")).over(Window.partitionBy()))
        .withColumn("n_langs",
          count(lit(1)).over(Window.partitionBy()))
        // equal share of a 20% budget; exact integer inputs → one double
        // division each, deterministic across engines
        .withColumn("rate", least(lit(1.0),
          col("total_chars").cast("double") * 0.2 /
            col("n_langs").cast("double") / col("lang_chars").cast("double")))
        .select(col("lang"), col("lang_chars"), col("rate"))
      docs(s, dir)
        .join(broadcast(langChars), "lang")
        .withColumn("sample_key", u(col("doc_id")))
        .filter(col("sample_key").cast("double") < col("rate") * 4294967296.0)
        .select(col("doc_id"), col("lang"), col("rate"), col("sample_key"))
    },
    Some(s"""
      WITH lc AS (
        SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS lang_chars
        FROM documents GROUP BY 1),
      rates AS (
        SELECT lang, lang_chars,
               least(1.0,
                 CAST(SUM(lang_chars) OVER () AS DOUBLE) * 0.2
                   / CAST(COUNT(*) OVER () AS DOUBLE)
                   / CAST(lang_chars AS DOUBLE)) AS rate
        FROM lc)
      SELECT d.doc_id, d.lang, r.rate, $SqlU AS sample_key
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE CAST($SqlU AS DOUBLE) < r.rate * 4294967296.0"""))

  /** The end-to-end training-mix pipeline, stages composed the way a real
    * corpus build runs them: language filter → structural quality gate →
    * exact dedup (keep min doc_id per sha256) → decontamination against a
    * benchmark probe set (any shared 4-gram disqualifies — the standard
    * n-gram-overlap test-set scrub) → stratified hash sampling. The output
    * is the shippable sample manifest.
    *
    * Scale shapes are the proven per-stage ones: per-row predicates ride
    * the scan; the dedup keeper election is one uniform hash-shuffle; the
    * probe set is corpus-independent (benchmark-sized) and broadcasts; the
    * sample decision is the samp1 integer threshold. Near-dup removal at
    * this spot is pipe1/dd15's LSH stage — elided here to keep the oracle
    * tractable, not because it wouldn't compose.
    */
  val trainingMix = GQuery(
    "pipe2_training_mix",
    (s, dir) => {
      val d = docs(s, dir)
      val nTok = size(tokens(col("text")))
      val base = d.filter(col("lang").isin("en", "de", "es", "fr"))
        .withColumn("n_tokens", nTok.cast("long"))
        .filter(col("n_tokens") >= 5 &&
          length(col("text")).cast("double") / col("n_tokens").cast("double") <= 15.0)
      // r14 (guide §2.4, the dd8/pipe1 rewrite): keeper = min(doc_id) over
      // the hash partition (the oracle's own window form) — one hash(h)
      // exchange instead of aggregate + join-back, and `base` (scan +
      // tokenize gate) runs once instead of twice. `uniq` then feeds BOTH
      // the decontamination explode and the final anti-join — persist it so
      // the gated scan + window run once per query, not twice (same
      // reasoning as pipe4/dd13; disk-spillable, freed by the bench after
      // each query).
      val uniq = base.withColumn("h", sha2(col("text"), 256))
        .withColumn("keeper_id",
          min(col("doc_id")).over(Window.partitionBy(col("h"))))
        .filter(col("doc_id") === col("keeper_id"))
        .persist()
      val probes = d.filter(col("doc_id") < 5)
        .select(explode(shinglesK(tokens(col("text")), 4)).as("shingle"))
        .distinct()
      val contaminated = uniq
        .select(col("doc_id"), explode(shinglesK(tokens(col("text")), 4)).as("shingle"))
        .join(broadcast(probes), "shingle")
        .select("doc_id").distinct()
      uniq.join(contaminated, Seq("doc_id"), "left_anti")
        .withColumn("sample_key", u(col("doc_id")))
        .withColumn("threshold",
          when(col("lang") === "en" || col("lang") === "fr", 2147483648L)
            .otherwise(1073741824L))
        .filter(col("sample_key") < col("threshold"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("sample_key"))
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, text, lang, source,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE lang IN ('en','de','es','fr')
          AND len(regexp_extract_all(text, '\\S+')) >= 5
          AND CAST(length(text) AS DOUBLE)
              / len(regexp_extract_all(text, '\\S+')) <= 15.0),
      uniq AS (
        SELECT * FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper_id
          FROM base)
        WHERE doc_id = keeper_id),
      probe AS (
        SELECT DISTINCT
          unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)}) AS shingle
        FROM documents WHERE doc_id < 5),
      contam AS (
        SELECT DISTINCT u.doc_id
        FROM (SELECT doc_id,
                unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
                  AS shingle
              FROM uniq) u
        JOIN probe USING (shingle))
      SELECT doc_id, lang, source, n_tokens, $SqlU AS sample_key
      FROM uniq LEFT JOIN contam USING (doc_id)
      WHERE contam.doc_id IS NULL
        AND $SqlU < CASE WHEN lang IN ('en','fr')
                         THEN 2147483648 ELSE 1073741824 END"""))

  /** Sequence packing: assign the tx15-style chunks to fixed 1024-token
    * training packs by greedy sequential fill — the batch-prep step that
    * turns a cleaned corpus into dense training sequences (pack fill rate
    * is the efficiency metric). A chunk joins the pack its cumulative
    * START falls in (the standard streaming-packing approximation — packs
    * are closed in order, never revisited). Chunk sizes are pure
    * arithmetic (`min(64, n−start)`) — no token materialization at all.
    *
    * Packing is deliberately SHARD-local — the window partitions by
    * (lang, source), never globally — so at 100 TB each window partition
    * is one shard's chunks (packs never cross shards, matching how packed
    * examples are written file-by-file) and no single ordering bottleneck
    * exists.
    */
  val sequencePacking = GQuery(
    "samp4_sequence_packing",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("doc_id"), col("start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          size(tokens(col("text"))).cast("long").as("n"))
        .select(col("doc_id"), col("lang"), col("source"), col("n"),
          explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)),
            lit(48L))).as("start"))
        .filter(col("start") < col("n"))
        .withColumn("chunk_tokens", least(lit(64L), col("n") - col("start")))
        .withColumn("cum", sum(col("chunk_tokens")).over(w))
        .withColumn("pack_id", expr("(cum - chunk_tokens) div 1024"))
        .groupBy(col("lang"), col("source"), col("pack_id"))
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens")).as("pack_tokens"))
        .withColumn("fill_rate", col("pack_tokens").cast("double") / 1024.0)
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, source,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
        FROM documents),
      st AS (
        SELECT doc_id, lang, source, n,
               unnest(range(0, greatest(n, 1), 48)) AS start
        FROM t),
      ch AS (
        SELECT doc_id, lang, source, start,
               least(64, n - start) AS chunk_tokens
        FROM st WHERE start < n),
      cm AS (
        SELECT *, SUM(chunk_tokens) OVER (PARTITION BY lang, source
                    ORDER BY doc_id, start
                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM ch)
      SELECT lang, source, CAST((cum - chunk_tokens) // 1024 AS BIGINT) AS pack_id,
             COUNT(*) AS n_chunks,
             CAST(SUM(chunk_tokens) AS BIGINT) AS pack_tokens,
             CAST(SUM(chunk_tokens) AS DOUBLE) / 1024.0 AS fill_rate
      FROM cm GROUP BY 1, 2, 3"""))

  /** Leakage-safe GROUPED train/val split: the split key is a hash of the
    * GROUP (source), not the document, so every document from one source
    * lands in the same fold — the GroupShuffleSplit discipline that prevents
    * near-duplicates within a source from straddling train and validation
    * (tx10's doc-level split cannot guarantee that). Output audits the
    * split: per (split, lang) doc/source/token totals, where
    * n_sources_in_both = 0 is the leakage-freedom invariant made visible.
    *
    * 100 TB shape: map-only split assignment (hash of a column already on
    * the row — no join against a group directory), one groupBy for the
    * audit. The membership invariant is checked with a window over the
    * per-(lang, source, split) aggregate — corpus-sized work never reaches
    * the invariant check.
    */
  val groupedSplit = GQuery(
    "samp5_grouped_split",
    (s, dir) => {
      val srcU = pmod(polyHash(concat(lit("gsplit:"), col("source"))), lit(100))
      val tagged = docs(s, dir)
        .select(col("lang"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_toks"),
          when(srcU < 80, lit("train")).otherwise(lit("val")).as("split"))
        .groupBy(col("split"), col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      // (split, lang, source) is the aggregate key and split is a pure
      // function of source, so "rows per (lang, source)" IS "splits this
      // source appears in" — no DISTINCT-over-window needed (DuckDB lacks
      // it, and the plain COUNT window is cheaper in Spark too).
      tagged
        .withColumn("splits_of_source",
          count(lit(1))
            .over(Window.partitionBy(col("lang"), col("source"))))
        .groupBy(col("split"), col("lang"))
        .agg(
          sum(col("n_docs")).as("n_docs"),
          count(lit(1)).as("n_sources"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("splits_of_source") > 1L, 1L).otherwise(0L))
            .as("n_sources_in_both"))
    },
    Some(s"""
      WITH t AS (
        SELECT lang, source,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_toks,
               CASE WHEN ${sqlPolyHash("'gsplit:' || source")} % 100 < 80
                    THEN 'train' ELSE 'val' END AS split
        FROM documents),
      persrc AS (
        SELECT split, lang, source,
               COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        FROM t GROUP BY 1, 2, 3),
      flagged AS (
        SELECT *,
               COUNT(*) OVER (PARTITION BY lang, source) AS splits_of_source
        FROM persrc)
      SELECT split, lang,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             COUNT(*) AS n_sources,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN splits_of_source > 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sources_in_both
      FROM flagged GROUP BY 1, 2"""))

  /** The composed shard-manifest pipeline: exact dedup → leakage-safe
    * grouped split (samp5's source-hash rule) → stride chunking → shard-
    * local sequence packing (samp4's windows, now keyed by split as well)
    * → the per-(split, lang) manifest a training launcher consumes: pack
    * counts, fill rates, token totals. pipe2 ends at "which documents
    * ship"; pipe3 ends at "what the trainer reads".
    *
    * Scale shapes are the proven per-stage ones: one uniform hash-shuffle
    * for the keeper election, map-only split tagging, and packing windows
    * partitioned by (split, lang, source) so packs never cross shards and
    * no stage sees a global ordering.
    */
  val shardManifest = GQuery(
    "pipe3_shard_manifest",
    (s, dir) => {
      val d = docs(s, dir)
      val keepers = d.groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("keeper_id"))
      // keeper map = one row per unique text — corpus-scaled, so pin the
      // shuffle hash join (the w16 rule: only domain-bounded relations may
      // broadcast; at oracle SFs Catalyst would otherwise broadcast this)
      val uniq = d.withColumn("h", sha2(col("text"), 256))
        .join(keepers.hint("shuffle_hash"), "h")
        .filter(col("doc_id") === col("keeper_id"))
      val srcU = pmod(polyHash(concat(lit("gsplit:"), col("source"))), lit(100))
      val chunks = uniq
        .select(col("doc_id"), col("lang"), col("source"),
          when(srcU < 80, lit("train")).otherwise(lit("val")).as("split"),
          size(tokens(col("text"))).cast("long").as("n"))
        .select(col("doc_id"), col("lang"), col("source"), col("split"), col("n"),
          explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)),
            lit(48L))).as("start"))
        .filter(col("start") < col("n"))
        .withColumn("chunk_tokens", least(lit(64L), col("n") - col("start")))
      val w = Window.partitionBy(col("split"), col("lang"), col("source"))
        .orderBy(col("doc_id"), col("start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks
        .withColumn("cum", sum(col("chunk_tokens")).over(w))
        .withColumn("pack_id", expr("(cum - chunk_tokens) div 1024"))
        .groupBy(col("split"), col("lang"), col("source"), col("pack_id"))
        .agg(sum(col("chunk_tokens")).as("pack_tokens"))
        .groupBy(col("split"), col("lang"))
        .agg(
          count(lit(1)).as("n_packs"),
          sum(col("pack_tokens")).as("total_tokens"),
          sum(when(col("pack_tokens") === 1024L, 1L).otherwise(0L))
            .as("n_full_packs"))
        .withColumn("fill_rate",
          col("total_tokens").cast("double") /
            (col("n_packs") * 1024L).cast("double"))
    },
    Some(s"""
      WITH uniq AS (
        SELECT * FROM (
          SELECT doc_id, lang, source, text,
                 MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper_id
          FROM documents)
        WHERE doc_id = keeper_id),
      t AS (
        SELECT doc_id, lang, source,
               CASE WHEN ${sqlPolyHash("'gsplit:' || source")} % 100 < 80
                    THEN 'train' ELSE 'val' END AS split,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
        FROM uniq),
      st AS (
        SELECT doc_id, lang, source, split, n,
               unnest(range(0, greatest(n, 1), 48)) AS start
        FROM t),
      ch AS (
        SELECT doc_id, lang, source, split, start,
               least(64, n - start) AS chunk_tokens
        FROM st WHERE start < n),
      cm AS (
        SELECT *, SUM(chunk_tokens) OVER (PARTITION BY split, lang, source
                    ORDER BY doc_id, start
                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM ch),
      packs AS (
        SELECT split, lang, source,
               CAST((cum - chunk_tokens) // 1024 AS BIGINT) AS pack_id,
               CAST(SUM(chunk_tokens) AS BIGINT) AS pack_tokens
        FROM cm GROUP BY 1, 2, 3, 4)
      SELECT split, lang,
             COUNT(*) AS n_packs,
             CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN pack_tokens = 1024 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_full_packs,
             CAST(SUM(pack_tokens) AS DOUBLE)
               / CAST(COUNT(*) * 1024 AS DOUBLE) AS fill_rate
      FROM packs GROUP BY 1, 2"""))

  /** samp6: WEIGHTED sampling without replacement (Efraimidis–Spirakis
    * exponential race), deterministic: each document's race key is
    * `ln(u)/w` with `u = (hash(doc_id)+0.5)/2^32` and weight `w = n_chars`
    * — ordering by this key descending is ordering by `u^(1/w)`, the
    * classic weighted-reservoir key, so longer documents win
    * proportionally more often while every decision replays bit-stable
    * from the id hash (no rand(), same discipline as samp1/samp2).
    *
    * 100 TB shape: the key is map-side arithmetic on columns already in
    * the scan; top-20-per-language goes through the same salted two-phase
    * window as samp2 (32-way local top-k first, then the final window
    * over ≤ 32·k survivors — Spark's WindowGroupLimit pushes the rank
    * bound into partial top-k before the shuffle). The float key itself
    * stays internal; the output carries only ranks and integer columns.
    */
  val weightedSample = GQuery(
    "samp6_weighted_sample",
    (s, dir) => {
      val wkey = log((u(col("doc_id")) + lit(0.5)) / lit(4294967296.0)) /
        col("n_chars").cast("double")
      val local = row_number().over(
        Window.partitionBy(col("lang"), pmod(col("doc_id"), lit(32L)))
          .orderBy(col("wkey").desc, col("doc_id")))
      val rk = row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("wkey").desc, col("doc_id")))
      docs(s, dir)
        .filter(col("n_chars") > 0)
        .withColumn("wkey", wkey)
        .withColumn("lrk", local)
        .filter(col("lrk") <= 20)
        .withColumn("rk", rk)
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
    },
    Some(s"""
      WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               ln(($SqlU + 0.5) / 4294967296) / CAST(n_chars AS DOUBLE)
                 AS wkey
        FROM documents WHERE n_chars > 0)
      SELECT lang, rk, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY wkey DESC, doc_id) AS rk
        FROM keyed) WHERE rk <= 20"""))

  /** samp7: Horvitz–Thompson estimation audit — the statistical layer that
    * makes samples USABLE: every sampled row is weighted by its inverse
    * inclusion probability 1/π, so corpus totals estimated from the samp1
    * stratified sample are unbiased, and this audit reports the estimate
    * next to the exact truth with relative errors. At 100 TB the truth
    * side runs once per release (or on a slice); the estimator side is
    * what daily jobs consume.
    *
    * Determinism: the samp1 thresholds are powers of two, so the inverse
    * probabilities (2, 4, 8) are EXACT doubles and the estimates are
    * integer-sum × exact-double products — no float accumulation anywhere.
    * Plan: two scans (sample + truth), each one partial-aggregable groupBy
    * on the ≤ #langs stratum key, joined as tiny dimensions.
    */
  val htEstimate = GQuery(
    "samp7_ht_estimate",
    (s, dir) => {
      val invPi = when(col("lang").isin("en", "fr"), 2.0)
        .when(col("lang").isin("de", "es"), 4.0)
        .otherwise(8.0)
      val threshold = when(col("lang").isin("en", "fr"), 2147483648L)
        .when(col("lang").isin("de", "es"), 1073741824L)
        .otherwise(536870912L)
      val est = docs(s, dir)
        .filter(u(col("doc_id")) < threshold)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("chars_sampled"))
        .select(col("lang"), col("n_sampled"),
          (col("n_sampled") * invPi).as("est_docs"),
          (col("chars_sampled") * invPi).as("est_chars"))
      val truth = docs(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("true_docs"),
          sum(col("n_chars")).as("true_chars"))
      est.join(truth, "lang")
        .select(col("lang"), col("n_sampled"),
          col("est_docs"), col("true_docs"),
          (col("est_docs") / col("true_docs") - 1.0).as("rel_err_docs"),
          col("est_chars"), col("true_chars"),
          (col("est_chars") / col("true_chars") - 1.0).as("rel_err_chars"))
    },
    Some(s"""
      WITH est AS (
        SELECT lang, COUNT(*) AS n_sampled,
               COUNT(*) * (CASE WHEN lang IN ('en','fr') THEN 2.0
                                WHEN lang IN ('de','es') THEN 4.0
                                ELSE 8.0 END) AS est_docs,
               SUM(n_chars) * (CASE WHEN lang IN ('en','fr') THEN 2.0
                                    WHEN lang IN ('de','es') THEN 4.0
                                    ELSE 8.0 END) AS est_chars
        FROM documents
        WHERE $SqlU < CASE WHEN lang IN ('en','fr') THEN 2147483648
                           WHEN lang IN ('de','es') THEN 1073741824
                           ELSE 536870912 END
        GROUP BY 1),
      truth AS (
        SELECT lang, COUNT(*) AS true_docs,
               CAST(SUM(n_chars) AS BIGINT) AS true_chars
        FROM documents GROUP BY 1)
      SELECT lang, n_sampled, est_docs, true_docs,
             est_docs / true_docs - 1.0 AS rel_err_docs,
             est_chars, true_chars,
             est_chars / true_chars - 1.0 AS rel_err_chars
      FROM est JOIN truth USING (lang)"""))

  /** Poisson(1) inverse-CDF thresholds scaled to [0, 2^32) — the cumulative
    * probabilities e^-1·Σ 1/k!, rounded once and shared verbatim with the
    * oracle, so resample weights are a pure integer comparison chain.
    */
  private val PoisCum = Seq(1580030169L, 3160060337L, 3950075422L,
    4213413783L, 4279248373L, 4292415891L)

  /** samp8: Poisson-bootstrap confidence intervals — uncertainty for a
    * corpus statistic (mean document length per language) WITHOUT
    * resampling the dataset: each of B=32 virtual resamples gives every
    * row an independent Poisson(1) weight, the per-resample weighted means
    * form the bootstrap distribution, and the CI is read off their order
    * statistics. This is the standard bootstrap at terabyte scale (true
    * multinomial resampling needs the global N per draw; Poisson weights
    * are per-row independent, so the whole thing rides the scan).
    *
    * Determinism: the Poisson draw is the inverse CDF applied to the
    * sk-pack's avalanched mix32 hash of (doc_id, b) — no rand(), replays
    * bit-stable anywhere. Weighted sums are integer (weight × chars);
    * each resample mean is one double division; the CI bounds are order
    * statistics (rank 2 / rank 31 of 32 — a ~94% interval), elected by
    * row_number, not float quantile math.
    *
    * Plan: explode ×32 (the bootstrap's real, honest cost — still
    * scan-shaped), one partial-aggregable groupBy on (lang, b), then
    * window + election over ≤ 32·#langs rows.
    */
  val bootstrapCi = GQuery(
    "samp8_bootstrap_ci",
    (s, dir) => {
      val exploded = docs(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          explode(sequence(lit(0L), lit(31L))).as("b"))
        .withColumn("ma", ((col("doc_id") * 64L + col("b")) * 2654435761L)
          % 4294967296L)
        .withColumn("mb", expr("ma ^ (ma div 65536)"))
        .withColumn("mc", expr("(mb * 1540483477L) % 4294967296L"))
        .withColumn("md", expr("mc ^ (mc div 8192)"))
        .withColumn("me", expr("(md * 1274126177L) % 4294967296L"))
        .withColumn("pri", expr("me ^ (me div 65536)"))
        .withColumn("w", PoisCum.zipWithIndex.foldRight(lit(6L): Column) {
          case ((cum, k), rest) => when(col("pri") < cum, k.toLong)
            .otherwise(rest)
        })
      val means = exploded.groupBy(col("lang"), col("b"))
        .agg(sum(col("w")).as("sw"),
          sum(col("w") * col("n_chars")).as("swx"))
        .filter(col("sw") > 0)
        .withColumn("mean_b", col("swx").cast("double") / col("sw"))
      val ranked = means.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("mean_b"), col("b"))))
      val ci = ranked.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_resamples"),
          min(when(col("rk") === 2, col("mean_b"))).as("boot_lo"),
          min(when(col("rk") === 31, col("mean_b"))).as("boot_hi"))
      val point = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(lit(1)))
            .as("mean_chars"))
      point.join(ci, "lang")
        .select(col("lang"), col("n_docs"), col("mean_chars"),
          col("boot_lo"), col("boot_hi"), col("n_resamples"))
    },
    Some(s"""
      WITH expl AS (
        SELECT lang, doc_id, n_chars, unnest(generate_series(0, 31)) AS b
        FROM documents),
      x1 AS (SELECT lang, n_chars, b,
               ((doc_id * 64 + b) * 2654435761) % 4294967296 AS ma FROM expl),
      x2 AS (SELECT lang, n_chars, b, xor(ma, ma // 65536) AS mb FROM x1),
      x3 AS (SELECT lang, n_chars, b,
               (mb * 1540483477) % 4294967296 AS mc FROM x2),
      x4 AS (SELECT lang, n_chars, b, xor(mc, mc // 8192) AS md FROM x3),
      x5 AS (SELECT lang, n_chars, b,
               (md * 1274126177) % 4294967296 AS me FROM x4),
      pr AS (SELECT lang, n_chars, b, xor(me, me // 65536) AS pri FROM x5),
      wt AS (SELECT lang, n_chars, b,
               CASE WHEN pri < ${PoisCum(0)} THEN 0
                    WHEN pri < ${PoisCum(1)} THEN 1
                    WHEN pri < ${PoisCum(2)} THEN 2
                    WHEN pri < ${PoisCum(3)} THEN 3
                    WHEN pri < ${PoisCum(4)} THEN 4
                    WHEN pri < ${PoisCum(5)} THEN 5
                    ELSE 6 END AS w
             FROM pr),
      means AS (
        SELECT lang, b,
               CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w) AS mean_b
        FROM wt GROUP BY 1, 2 HAVING SUM(w) > 0),
      ranked AS (
        SELECT lang, b, mean_b,
               row_number() OVER (PARTITION BY lang
                 ORDER BY mean_b, b) AS rk
        FROM means),
      ci AS (
        SELECT lang, COUNT(*) AS n_resamples,
               MIN(CASE WHEN rk = 2 THEN mean_b END) AS boot_lo,
               MIN(CASE WHEN rk = 31 THEN mean_b END) AS boot_hi
        FROM ranked GROUP BY 1),
      pt AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
        FROM documents GROUP BY 1)
      SELECT lang, n_docs, mean_chars, boot_lo, boot_hi, n_resamples
      FROM pt JOIN ci USING (lang)"""))

  /** samp9: temperature-scaled mixture — the multilingual up/down-sampling
    * rule (XLM-R / mT5): source shares ∝ size^(1/T) instead of samp3's
    * equal shares, so small languages are boosted without flattening the
    * mixture entirely. T = 2 here, i.e. shares ∝ √size — deliberately,
    * because sqrt is a correctly-rounded IEEE op (identical bits on every
    * engine) where pow(x, 0.3) is not; a temperature that needs pow would
    * quantize shares to integers first. Output is the per-source plan:
    * natural share, tempered share, the keep-rate that realizes it under
    * a 20% character budget, and the realized sampled-document count from
    * the samp1 hash-threshold rule (deterministic, seedless).
    *
    * Scale shape: one scan aggregates per-source mass (map-side combined);
    * shares and rates are window math over the ≤|sources| relation; the
    * realized count joins the broadcast rate table back against the scan
    * and filters on the integer hash — no rand(), no second shuffle.
    */
  val temperatureMix = GQuery(
    "samp9_temperature_mix",
    (s, dir) => {
      val rates = docs(s, dir).groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("lang_chars"))
        .withColumn("total_chars",
          sum(col("lang_chars")).over(Window.partitionBy()))
        // per-row quantize before the cross-partition sum (the tx21 rule):
        // the decimal sum is exact, so share values cannot drift with the
        // engine's addition order
        .withColumn("tempered",
          sqrt(col("lang_chars").cast("double")).cast("decimal(28,12)"))
        .withColumn("temp_share",
          col("tempered").cast("double") /
            sum(col("tempered")).over(Window.partitionBy()).cast("double"))
        .withColumn("nat_share",
          col("lang_chars").cast("double") / col("total_chars").cast("double"))
        .withColumn("rate", least(lit(1.0),
          col("total_chars").cast("double") * 0.2 * col("temp_share") /
            col("lang_chars").cast("double")))
        .select(col("lang"), col("lang_chars"), col("nat_share"),
          col("temp_share"), col("rate"))
      val sampled = docs(s, dir)
        .join(broadcast(rates.select(col("lang"), col("rate"))), "lang")
        .filter(u(col("doc_id")).cast("double") < col("rate") * 4294967296.0)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("lang"), "left")
        .select(col("lang"), col("lang_chars"), col("nat_share"),
          col("temp_share"), col("rate"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
    },
    Some(s"""
      WITH lc AS (
        SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS lang_chars
        FROM documents GROUP BY 1),
      lcq AS (
        SELECT lang, lang_chars,
               CAST(sqrt(CAST(lang_chars AS DOUBLE)) AS DECIMAL(28,12))
                 AS tempered
        FROM lc),
      rates AS (
        SELECT lang, lang_chars,
               CAST(lang_chars AS DOUBLE) / CAST(SUM(lang_chars) OVER () AS DOUBLE)
                 AS nat_share,
               CAST(tempered AS DOUBLE)
                 / CAST(SUM(tempered) OVER () AS DOUBLE) AS temp_share,
               least(1.0,
                 CAST(SUM(lang_chars) OVER () AS DOUBLE) * 0.2
                   * (CAST(tempered AS DOUBLE)
                      / CAST(SUM(tempered) OVER () AS DOUBLE))
                   / CAST(lang_chars AS DOUBLE)) AS rate
        FROM lcq),
      sampled AS (
        SELECT d.lang, COUNT(*) AS n_sampled
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST($SqlU AS DOUBLE) < r.rate * 4294967296.0
        GROUP BY 1)
      SELECT r.lang, r.lang_chars, r.nat_share, r.temp_share, r.rate,
             COALESCE(s.n_sampled, 0) AS n_sampled
      FROM rates r LEFT JOIN sampled s ON r.lang = s.lang"""))

  /** samp10: epoch plan — samp9 capped its keep-rate at 1.0 (sampling can
    * only discard); real data recipes REPLICATE under-represented sources
    * instead (multiple epochs of a small source per single epoch of the
    * web crawl — the Llama-style data-budget table). Same tempered shares,
    * uncapped: epochs = budget_share / source_size in integer ppm
    * (> 1e6 ⇒ replicate, < 1e6 ⇒ subsample), with the whole-epoch count
    * and the fractional remainder rate a loader needs to realize it.
    *
    * Scale shape: arithmetic over the ≤|sources| mass table (one map-side
    * combined scan); the decimal-quantized √mass sum is samp9's (addition
    * order cannot move shares); epochs_ppm is a floor of a double ratio —
    * the expression tree is mirrored, so the floor lands identically.
    */
  val epochPlan = GQuery(
    "samp10_epoch_plan",
    (s, dir) => {
      val rates = docs(s, dir).groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("lang_chars"))
        .withColumn("total_chars",
          sum(col("lang_chars")).over(Window.partitionBy()))
        .withColumn("tempered",
          sqrt(col("lang_chars").cast("double")).cast("decimal(28,12)"))
        .withColumn("temp_share",
          col("tempered").cast("double") /
            sum(col("tempered")).over(Window.partitionBy()).cast("double"))
      rates
        .withColumn("target_chars",
          floor(col("total_chars").cast("double") * 0.2 * col("temp_share"))
            .cast("long"))
        .withColumn("epochs_ppm",
          floor(col("total_chars").cast("double") * 0.2 * col("temp_share")
            * 1000000.0 / col("lang_chars").cast("double")).cast("long"))
        .select(col("lang"), col("lang_chars"), col("target_chars"),
          col("epochs_ppm"),
          expr("epochs_ppm div 1000000").as("full_epochs"),
          (col("epochs_ppm") % 1000000L).as("remainder_rate_ppm"),
          when(col("epochs_ppm") > 1000000L, lit("replicate"))
            .otherwise(lit("subsample")).as("plan"))
    },
    Some("""
      WITH lc AS (
        SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS lang_chars
        FROM documents GROUP BY 1),
      lcq AS (
        SELECT lang, lang_chars,
               CAST(SUM(lang_chars) OVER () AS BIGINT) AS total_chars,
               CAST(sqrt(CAST(lang_chars AS DOUBLE)) AS DECIMAL(28,12))
                 AS tempered
        FROM lc),
      rates AS (
        SELECT lang, lang_chars, total_chars,
               CAST(tempered AS DOUBLE)
                 / CAST(SUM(tempered) OVER () AS DOUBLE) AS temp_share
        FROM lcq),
      plan AS (
        SELECT lang, lang_chars,
               CAST(FLOOR(CAST(total_chars AS DOUBLE) * 0.2 * temp_share)
                    AS BIGINT) AS target_chars,
               CAST(FLOOR(CAST(total_chars AS DOUBLE) * 0.2 * temp_share
                          * 1000000.0 / CAST(lang_chars AS DOUBLE))
                    AS BIGINT) AS epochs_ppm
        FROM rates)
      SELECT lang, lang_chars, target_chars, epochs_ppm,
             CAST(epochs_ppm // 1000000 AS BIGINT) AS full_epochs,
             epochs_ppm % 1000000 AS remainder_rate_ppm,
             CASE WHEN epochs_ppm > 1000000 THEN 'replicate'
                  ELSE 'subsample' END AS plan
      FROM plan"""))

  override def queries: Seq[GQuery] =
    Seq(stratifiedSample, reservoirPerStratum, mixtureResample, trainingMix,
      sequencePacking, groupedSplit, shardManifest, weightedSample,
      htEstimate, bootstrapCi, temperatureMix, epochPlan)
}
