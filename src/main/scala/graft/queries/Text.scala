package graft.queries

import graft.{GQuery, QueryPack, Tables}
import graft.functions.TextHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language-ID, quality scoring, token counting, document
  * fingerprinting). All pure Column/HOF expressions (codegen'd, per-row,
  * shuffle-free until the final aggregate), with bit-exact DuckDB oracles via
  * the shared [[graft.functions.TextHash]] constructions.
  */
object Text extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Token counting: whitespace tokens + BPE-ish lexer tokens + chars. */
  val tokenCounts = GQuery(
    "tx1_token_counts",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_measured")),
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
             len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
             CAST(length(text) AS BIGINT) AS n_chars_measured
      FROM documents"""))

  /** Quality scoring: structural ratios every pretraining filter starts from
    * (cf. Gopher/C4 heuristics — length, mean word length, punctuation and
    * stopword ratios). Ratios are double divisions of exact integers →
    * deterministic across engines.
    */
  val quality = GQuery(
    "tx2_quality_scores",
    (s, dir) => {
      val t = size(tokens(col("text"))).cast("double")
      val stop = size(filter(tokens(col("text")),
        w => lower(w).isin("the", "a", "of", "and", "to", "in", "is", "on"))).cast("double")
      val punct = size(regexp_extract_all(col("text"), lit("[\\.,;:!\\?]"), lit(0))).cast("double")
      docs(s, dir).select(
        col("doc_id"),
        t.cast("long").as("n_tokens"),
        (length(col("text")).cast("double") / t).as("mean_token_len"),
        (stop / t).as("stopword_ratio"),
        (punct / length(col("text")).cast("double")).as("punct_ratio"))
    },
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS n_tokens,
             CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '\S+'))
               AS mean_token_len,
             CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                    w -> lower(w) IN ('the','a','of','and','to','in','is','on')))
                  AS DOUBLE) / len(regexp_extract_all(text, '\S+'))
               AS stopword_ratio,
             CAST(len(regexp_extract_all(text, '[\.,;:!\?]')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS punct_ratio
      FROM documents"""))

  /** Language-ID: marker-stopword voting with a fixed priority tie-break —
    * the classic cheap n-gram/stopword heuristic, deterministic in SQL.
    */
  val langId = GQuery(
    "tx3_lang_id",
    (s, dir) => {
      def score(words: String*) =
        size(filter(tokens(col("text")), w => lower(w).isin(words: _*)))
      val en = score("the", "and", "of", "to", "a", "is")
      val de = score("der", "die", "und", "ist", "das", "nicht")
      val es = score("el", "la", "que", "los", "una", "es")
      val fr = score("le", "les", "des", "et", "une", "est")
      docs(s, dir).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        en.cast("long").as("s_en"),
        when(en >= de && en >= es && en >= fr, "en")
          .when(de >= es && de >= fr, "de")
          .when(es >= fr, "es")
          .otherwise("fr").as("predicted_lang"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('the','and','of','to','a','is'))) AS s_en,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('der','die','und','ist','das','nicht'))) AS s_de,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('el','la','que','los','una','es'))) AS s_es,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('le','les','des','et','une','est'))) AS s_fr
        FROM documents)
      SELECT doc_id, labeled_lang, s_en,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM scored"""))

  /** Document fingerprinting: 31-base rolling hash of the full text plus a
    * word-shingle count — the primitive under content-defined dedup.
    */
  val fingerprint = GQuery(
    "tx4_fingerprints",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        polyHash(col("text")).as("fingerprint"),
        size(shingles3(col("toks"))).cast("long").as("n_shingles")),
    Some(s"""
      WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks,
               ${sqlPolyHash("text")} AS fingerprint
        FROM documents)
      SELECT doc_id, fingerprint,
             CAST(len(${sqlShingles3("toks")}) AS BIGINT) AS n_shingles
      FROM t"""))

  /** Per-language corpus rollup — the summary a data pipeline reports. */
  val corpusStats = GQuery(
    "tx5_corpus_stats",
    (s, dir) => docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars")),
    Some("""
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
               AS total_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1, 2"""))

  /** TF-IDF top terms per language — the corpus-characterization query every
    * pipeline runs after language split. Two shuffles total (tf groupBy, df
    * groupBy), both on uniform token keys; the corpus size joins in as a
    * broadcast scalar; top-5 per language is a bounded window over the
    * (small) per-language term aggregate, not over raw tokens.
    * ln/division on identical inputs are sub-ulp-stable across engines —
    * far inside the oracle's 6-significant-digit float compare.
    */
  val tfidfTopTerms = GQuery(
    "tx6_tfidf_top_terms",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
      // ONE scan + ONE shuffle over the raw tokens: the per-doc partial
      // aggregate (with map-side combine) feeds both tf (sum over docs) and
      // df (count of docs) — vs the naive two-scan plan (tf groupBy + a
      // distinct + df groupBy) that tokenizes and shuffles the corpus twice.
      val perDoc = toks.groupBy(col("doc_id"), col("lang"), col("token"))
        .agg(count(lit(1)).as("tf_doc"))
      val tf = perDoc.groupBy(col("lang"), col("token"))
        .agg(sum(col("tf_doc")).as("tf"))
      val df = perDoc.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "token").crossJoin(broadcast(n))
        .select(
          col("lang"), col("token"), col("tf"),
          (col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      val rk = row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("tfidf").desc, col("token")))
      scored.withColumn("rk", rk).filter(col("rk") <= 5)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS token
        FROM documents),
      tf AS (SELECT lang, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT lang, token, tf,
               CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n)
      SELECT lang, token, tf, tfidf,
             row_number() OVER (PARTITION BY lang
                                ORDER BY tfidf DESC, token) AS rk
      FROM scored QUALIFY rk <= 5"""))

  /** Bigram language-model counts: top-20 word bigrams with their corpus
    * frequencies and left-context counts — the n-gram statistics under
    * KenLM-style LM scoring and contamination checks. Bigrams are built
    * with shifted-slice zip_with (tokens stay in HOF argument position),
    * exploded once; both aggregates shuffle on uniform token keys.
    */
  val bigramStats = GQuery(
    "tx7_bigram_stats",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val n = greatest(size(col("t")) - 1, lit(0))
      val bi = toks.select(posexplode(
        zip_with(slice(col("t"), lit(1), n), slice(col("t"), lit(2), n),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg"))))
        .as(Seq("p", "v")))
        .select(col("v.w1").as("w1"), col("v.bg").as("bigram"))
      val counts = bi.groupBy(col("w1"), col("bigram"))
        .agg(count(lit(1)).as("n_bigram"))
      val left = bi.groupBy(col("w1")).agg(count(lit(1)).as("n_left"))
      val top = counts.join(left, "w1")
        .select(col("bigram"), col("n_bigram"), col("n_left"),
          (col("n_bigram").cast("double") / col("n_left").cast("double"))
            .as("cond_prob"))
        .orderBy(col("n_bigram").desc, col("bigram")).limit(20)
      top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_bigram").desc, col("bigram"))))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      bi AS (
        SELECT unnest(list_transform(range(1, len(t)),
                 i -> struct_pack(w1 := t[i], bg := t[i] || ' ' || t[i+1]))) AS v
        FROM toks WHERE len(t) >= 2),
      flat AS (SELECT v.w1 AS w1, v.bg AS bigram FROM bi),
      counts AS (
        SELECT w1, bigram, COUNT(*) AS n_bigram FROM flat GROUP BY 1, 2),
      lefts AS (SELECT w1, COUNT(*) AS n_left FROM flat GROUP BY 1),
      top AS (
        SELECT bigram, n_bigram, n_left,
               CAST(n_bigram AS DOUBLE) / CAST(n_left AS DOUBLE) AS cond_prob,
               row_number() OVER (ORDER BY n_bigram DESC, bigram) AS rk
        FROM counts JOIN lefts USING (w1))
      SELECT bigram, CAST(n_bigram AS BIGINT) AS n_bigram,
             CAST(n_left AS BIGINT) AS n_left, cond_prob, rk
      FROM top WHERE rk <= 20"""))

  /** Benchmark decontamination: flag corpus documents sharing any word
    * 4-gram with a probe set (docs 0–4 stand in for eval-benchmark text) and
    * count the shared shingles. The probe side is tiny and BROADCAST — at
    * 100 TB the corpus streams through executors with zero shuffle until the
    * final per-doc count; the corpus side computes its shingles once per
    * row. The standard n-gram-overlap decontamination pass of LLM data
    * pipelines (cf. GPT-3 appendix C).
    */
  val decontamination = GQuery(
    "tx8_decontamination",
    (s, dir) => {
      val sh = (c: org.apache.spark.sql.Column) => shinglesK(tokens(c), 4)
      val probes = docs(s, dir).filter(col("doc_id") < 5)
        .select(explode(sh(col("text"))).as("shingle")).distinct()
      docs(s, dir).filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(sh(col("text"))).as("shingle"))
        .join(broadcast(probes), "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_4grams"))
    },
    Some(s"""
      WITH probe AS (
        SELECT DISTINCT unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
          AS shingle
        FROM documents WHERE doc_id < 5),
      cand AS (
        SELECT doc_id,
               unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)}) AS shingle
        FROM documents WHERE doc_id >= 5)
      SELECT doc_id, COUNT(*) AS n_shared_4grams
      FROM cand JOIN probe USING (shingle)
      GROUP BY 1"""))

  /** Per-document LM quality score under the corpus's OWN bigram model —
    * the classic "train a cheap LM on the corpus, flag the documents it
    * finds surprising" filter. Score = mean scaled inverse conditional
    * probability of the document's bigram instances, in EXACT integer math
    * (`n_left * 1e6 div n_bigram`, integer sums) so the oracle comparison is
    * bit-deterministic — no float logs whose last-ulp differences between
    * engines could flip a rounding.
    *
    * Scale shape: the bigram model is O(distinct bigrams) — far too big to
    * broadcast at 100 TB — so scoring is a shuffle equi-join of instances
    * against the model on the uniform bigram key (AQE splits the
    * stop-bigram skew), then a per-doc hash aggregation.
    */
  val lmScores = GQuery(
    "tx9_lm_scores",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val n = greatest(size(col("t")) - 1, lit(0))
      val flat = toks.select(col("doc_id"), posexplode(
        zip_with(slice(col("t"), lit(1), n), slice(col("t"), lit(2), n),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg"))))
        .as(Seq("p", "v")))
        .select(col("doc_id"), col("v.w1").as("w1"), col("v.bg").as("bigram"))
      // r14 (guide §2.3 "aggregate before you shuffle"): the left-context
      // total is a ROLLUP of the bigram counts (n_left = Σ n_bigram over
      // w1), so derive it from the model-sized `counts` relation instead of
      // a second full-corpus aggregation of `flat` — one fewer tokenize
      // pass and one fewer instance-sized exchange. `counts` feeds both
      // the rollup and the model join → persist the (small) model relation
      // so the remaining pipeline pass runs once.
      val counts = flat.groupBy(col("w1"), col("bigram"))
        .agg(count(lit(1)).as("n_bigram"))
        .persist()
      val lefts = counts.groupBy(col("w1"))
        .agg(sum(col("n_bigram")).as("n_left"))
      val model = counts.join(lefts, "w1")
      flat.join(model, Seq("w1", "bigram"))
        .withColumn("inv_p_micro", expr("n_left * 1000000L div n_bigram"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum(col("inv_p_micro")).as("sum_inv_p_micro"))
        .withColumn("avg_inv_p_micro",
          expr("sum_inv_p_micro div n_bigrams"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      bi AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> struct_pack(w1 := t[i], bg := t[i] || ' ' || t[i+1]))) AS v
        FROM toks WHERE len(t) >= 2),
      flat AS (SELECT doc_id, v.w1 AS w1, v.bg AS bigram FROM bi),
      counts AS (
        SELECT w1, bigram, COUNT(*) AS n_bigram FROM flat GROUP BY 1, 2),
      lefts AS (SELECT w1, COUNT(*) AS n_left FROM flat GROUP BY 1),
      model AS (
        SELECT w1, bigram, n_bigram, n_left FROM counts JOIN lefts USING (w1)),
      scored AS (
        SELECT doc_id, (n_left * 1000000) // n_bigram AS inv_p_micro
        FROM flat JOIN model USING (w1, bigram))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(inv_p_micro) AS BIGINT) AS sum_inv_p_micro,
             CAST(CAST(SUM(inv_p_micro) AS BIGINT) // COUNT(*) AS BIGINT)
               AS avg_inv_p_micro
      FROM scored GROUP BY doc_id"""))

  /** Corpus mixing: deterministic hash-based train/val split (90/10) plus
    * per-language mixture downsampling (en kept at 80%, other languages at
    * 50%) — the reproducible-sampling primitive under training-data mixture
    * weights. Membership is a pure function of (source, doc_id) via the
    * shared rolling hash, so the SAME document lands in the SAME split on
    * every engine, every run, every partitioning — no RAND(), no seed
    * plumbing, no resampling drift when the corpus is re-sharded. Per-row
    * math + one aggregate; at 100 TB the split/keep decision rides the scan.
    */
  val mixSplit = GQuery(
    "tx10_mix_split",
    (s, dir) => {
      val splitBucket = pmod(
        polyHash(concat(lit("split:"), col("source"), lit(":"),
          col("doc_id").cast("string"))), lit(100))
      val mixBucket = pmod(
        polyHash(concat(lit("mix:"), col("source"), lit(":"),
          col("doc_id").cast("string"))), lit(100))
      docs(s, dir)
        .select(
          col("lang"), col("source"),
          when(splitBucket < 90, lit("train")).otherwise(lit("val")).as("split"),
          when(col("lang") === "en", mixBucket < 80)
            .otherwise(mixBucket < 50).as("kept"))
        .groupBy(col("lang"), col("source"), col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
    },
    Some(s"""
      WITH b AS (
        SELECT lang, source,
               ${sqlPolyHash("'split:' || source || ':' || CAST(doc_id AS VARCHAR)")}
                 % 100 AS split_bucket,
               ${sqlPolyHash("'mix:' || source || ':' || CAST(doc_id AS VARCHAR)")}
                 % 100 AS mix_bucket
        FROM documents)
      SELECT lang, source,
             CASE WHEN split_bucket < 90 THEN 'train' ELSE 'val' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN (lang = 'en' AND mix_bucket < 80)
                             OR (lang <> 'en' AND mix_bucket < 50)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM b GROUP BY 1, 2, 3"""))

  /** Vocabulary capping: keep the top-40 corpus tokens (by frequency, ties
    * by token), rewrite every other token to `<unk>`, and reassemble each
    * document in order — the `<unk>`-substitution step of a fixed-vocabulary
    * LM pipeline.
    *
    * Scale shape: one token-count aggregate (uniform keys), a rank to pick
    * the vocabulary (vocab-sized, tiny), then a BROADCAST membership join
    * against the exploded tokens and one groupBy(doc_id) to reassemble —
    * the corpus is never shuffled by token, and the per-doc sort is bounded
    * by document length. In-order reassembly uses array_sort over (pos,
    * token) structs, not collect_list order (which is partition-dependent).
    */
  val vocabCap = GQuery(
    "tx11_vocab_cap",
    (s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      val rk = row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("tok")))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .withColumn("rk", rk).filter(col("rk") <= 40)
        .select(col("tok"), lit(true).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .select(col("doc_id"), col("pos"),
          when(col("in_vocab").isNotNull, col("tok"))
            .otherwise(lit("<unk>")).as("t2"))
        .groupBy(col("doc_id"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("t2")))),
            x => x("t2")), " ").as("capped_text"),
          sum(when(col("t2") === "<unk>", 1L).otherwise(0L)).as("n_unk"),
          count(lit(1)).as("n_tokens"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '\S+')) AS tok,
               unnest(range(0, len(regexp_extract_all(text, '\S+')))) AS pos
        FROM documents),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, COUNT(*) AS n,
                 row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
          FROM toks GROUP BY tok) WHERE rk <= 40),
      capped AS (
        SELECT t.doc_id, t.pos,
               CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<unk>' END AS t2
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
      SELECT doc_id,
             string_agg(t2, ' ' ORDER BY pos) AS capped_text,
             CAST(SUM(CASE WHEN t2 = '<unk>' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unk,
             COUNT(*) AS n_tokens
      FROM capped GROUP BY doc_id"""))

  /** Per-language percentile quality gate: keep documents at or below their
    * LANGUAGE's median mean-token-length — relative (distribution-based)
    * filtering rather than tx2's absolute thresholds, which is how real
    * pipelines avoid tuning one cutoff across languages with different
    * typography.
    *
    * Determinism: the score is integer-quantized (chars·1000 div tokens) so
    * the exact percentile interpolates between integers — an exact double in
    * ANY engine — and the boundary comparison can't drift by an ulp. Scale
    * shape: one small per-language aggregate (exact percentile; at 100 TB
    * swap `percentile` → `approx_percentile`, same plan), broadcast back
    * over the corpus — the gate itself rides the scan.
    */
  val qualityGate = GQuery(
    "tx12_quality_percentile_gate",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_c"))
        .filter(col("n_tok") > 0)
        .withColumn("score_milli", expr("n_c * 1000 div n_tok"))
      val med = d.groupBy(col("lang"))
        .agg(expr("percentile(score_milli, 0.5d)").as("lang_median"))
      d.join(broadcast(med), "lang")
        .select(col("doc_id"), col("lang"), col("score_milli"),
          col("lang_median"),
          (col("score_milli").cast("double") <= col("lang_median")).as("passed"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '\S+')) AS n_tok,
               CAST(length(text) AS BIGINT) AS n_c
        FROM documents),
      d2 AS (
        SELECT doc_id, lang, (n_c * 1000) // n_tok AS score_milli
        FROM d WHERE n_tok > 0),
      m AS (
        SELECT lang, quantile_cont(score_milli, 0.5) AS lang_median
        FROM d2 GROUP BY lang)
      SELECT doc_id, d2.lang, score_milli, lang_median,
             CAST(score_milli AS DOUBLE) <= lang_median AS passed
      FROM d2 JOIN m ON d2.lang = m.lang"""))

  /** Corpus-law statistics: Heaps-style vocabulary growth (cumulative
    * distinct tokens as the corpus grows in doc_id order, bucketed by 50
    * docs) — the saturation curve that tells a data pipeline whether more
    * raw data still adds vocabulary. The naive "distinct over every prefix"
    * is quadratic; this is the linear formulation: a token contributes to
    * growth exactly at its FIRST document, so cumulative vocabulary = running
    * sum of first-occurrence counts per bucket. One token aggregate + one
    * bucket aggregate + a window over the (tiny) bucket axis.
    */
  val vocabGrowth = GQuery(
    "tx13_vocab_growth",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val firstDoc = toks.groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
        .groupBy((col("fd") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("new_tokens"))
      val volume = toks.groupBy((col("doc_id") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("bucket_tokens"))
      volume.join(firstDoc, Seq("bucket"), "left")
        .select(col("bucket"), col("bucket_tokens"),
          coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
        .withColumn("cum_tokens", sum(col("bucket_tokens")).over(w))
        .withColumn("cum_vocab", sum(col("new_tokens")).over(w))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents),
      fd AS (
        SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
               COUNT(*) AS new_tokens
        FROM (SELECT tok, MIN(doc_id) AS doc_id FROM toks GROUP BY tok)
        GROUP BY 1),
      vol AS (
        SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
               COUNT(*) AS bucket_tokens
        FROM toks GROUP BY 1)
      SELECT v.bucket, v.bucket_tokens,
             COALESCE(f.new_tokens, 0) AS new_tokens,
             CAST(SUM(v.bucket_tokens) OVER (ORDER BY v.bucket
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             CAST(SUM(COALESCE(f.new_tokens, 0)) OVER (ORDER BY v.bucket
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      FROM vol v LEFT JOIN fd f ON v.bucket = f.bucket"""))

  /** PII detect + redact — the scrubbing pass every pretraining pipeline
    * runs before anything else. The fixture corpus is synthetic word soup
    * with no natural PII, so the query PLANTS a deterministic contact block
    * per row (`doc_id%3` emails, `doc_id%2` phone numbers) and the operator
    * under test is the detect/count/redact pass over the combined text:
    * codegen'd per-row regex work, shuffle-free — the 100 TB shape is a
    * map-only scan. The redaction is verified byte-exactly via md5 of the
    * scrubbed text against the oracle's RE2 replacement.
    */
  val piiScan = GQuery(
    "tx14_pii_scan",
    (s, dir) => {
      val emailRe = "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "555-[0-9]{4}"
      val email = concat(lit("doc"), col("doc_id"), lit("@"),
        col("source"), lit(".example.com"))
      val phone = concat(lit("555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      // plain concatenation of leading-space blocks: concat_ws would differ
      // between engines on empty segments (DuckDB skips them, Spark keeps)
      val planted = concat(col("text"),
        concat_ws("", array_repeat(concat(lit(" "), email),
          (col("doc_id") % 3).cast("int"))),
        concat_ws("", array_repeat(concat(lit(" "), phone),
          (col("doc_id") % 2).cast("int"))))
      docs(s, dir)
        .select(col("doc_id"), planted.as("full_text"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("full_text"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("full_text"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("full_text"), emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]")).as("redacted_md5"))
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
               text ||
                 COALESCE(array_to_string(list_transform(range(0, doc_id % 3),
                   i -> concat(' doc', doc_id, '@', source, '.example.com')), ''), '') ||
                 COALESCE(array_to_string(list_transform(range(0, doc_id % 2),
                   i -> concat(' 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))), ''), '')
                 AS full_text
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(full_text,
               '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(full_text, '555-[0-9]{4}')) AS BIGINT)
               AS n_phones,
             md5(regexp_replace(
               regexp_replace(full_text,
                 '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
               '555-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
      FROM planted"""))

  /** Fixed-size token chunking with overlap (window 64, stride 48) — the
    * context-window prep step between cleaning and tokenization. Chunk
    * starts come from an integer sequence per doc (explode, no window
    * function), slices are array ops on the token list, and each chunk is
    * identity-checked via md5 of its joined text. Map-side only: rows
    * expand ×(n/48) with no shuffle — the 100 TB shape.
    */
  val chunking = GQuery(
    "tx15_chunking",
    (s, dir) => {
      val C = 64
      val S = 48L
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)),
            lit(S))).as("start"))
        .filter(col("start") < col("n"))
        .select(col("doc_id"),
          (col("start") / S).cast("long").as("chunk_id"),
          slice(col("toks"), (col("start") + 1L).cast("int"), lit(C)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
        FROM documents),
      starts AS (
        SELECT doc_id, toks, n,
               unnest(range(0, greatest(n, 1), 48)) AS start
        FROM toks)
      SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
             CAST(len(list_slice(toks, start + 1, least(start + 64, n)))
               AS BIGINT) AS n_chunk_tokens,
             md5(array_to_string(
               list_slice(toks, start + 1, least(start + 64, n)), ' '))
               AS chunk_md5
      FROM starts WHERE start < n"""))

  /** Per-document duplicated-n-gram rate: what fraction of a document's
    * distinct 4-grams also appear in OTHER documents — the repetition /
    * boilerplate signal (the RefinedWeb/CCNet family of "duplicated
    * n-gram fraction" filters), and the per-doc view of what dd2/dd4
    * decide pairwise. One shuffle on the uniform shingle key to get
    * document frequencies, one per-doc aggregate; the rate is a double
    * division of exact counts.
    */
  val dupNgramRate = GQuery(
    "tx16_dup_ngram_rate",
    (s, dir) => {
      // document frequency as a window over the distinct (doc, shingle)
      // relation — ONE scan of the shingle inventory instead of an
      // aggregate + join-back that would recompute it (2 fewer exchanges,
      // measured ~2× on this query)
      val sh = docs(s, dir)
        .select(col("doc_id"), explode(shinglesK(tokens(col("text")), 4)).as("shingle"))
        .distinct()
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      sh.groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("dup_rate",
          col("n_shared").cast("double") / col("n_shingles").cast("double"))
    },
    Some(s"""
      WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
                 AS shingle
        FROM documents),
      d AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh)
      SELECT doc_id, COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_rate
      FROM d GROUP BY 1"""))

  /** The filter RULEBOOK: named boolean quality rules evaluated per
    * document with exact integer arithmetic (Gopher-style explainable
    * filtering — a pipeline needs to know WHICH rule dropped a document,
    * not just that one did). All per-row work riding the scan; thresholds
    * in integer milli-units so no float boundary can drift between
    * engines. `keep` = no rule fired.
    */
  /** The tx17 rule projection over any (doc_id, text) relation — shared by
    * the batch GQuery and the streaming path (stateless per-row ⇒ the same
    * expression tree runs unchanged on a stream; equivalence asserted in
    * StreamingCorpusSpec).
    */
  def qualityRuleCols(in: DataFrame): DataFrame = {
    val stop = Seq("the", "and", "of", "to", "a", "is",
      "der", "die", "und", "ist", "das", "nicht",
      "el", "la", "que", "los", "una", "es",
      "le", "les", "des", "et", "une", "est")
    val d = in.select(col("doc_id"),
      tokens(col("text")).as("toks"),
      length(col("text")).cast("long").as("n_c"))
      .select(col("doc_id"), col("n_c"),
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("toks"), w => lower(w).isin(stop: _*)))
          .cast("long").as("n_stop"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
    d.select(col("doc_id"),
      (col("n_tok") < 10).as("r_too_short"),
      when(col("n_tok") > 0, expr("n_c * 1000 div n_tok") > 8000)
        .otherwise(lit(true)).as("r_long_words"),
      (col("n_stop") === 0).as("r_no_stopwords"),
      (col("n_distinct") * 1000 < col("n_tok") * 400).as("r_repetitive"))
      .withColumn("keep",
        !col("r_too_short") && !col("r_long_words") &&
          !col("r_no_stopwords") && !col("r_repetitive"))
  }

  val qualityRules = GQuery(
    "tx17_quality_rules",
    (s, dir) => qualityRuleCols(docs(s, dir)),
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
               CAST(length(text) AS BIGINT) AS n_c
        FROM documents),
      d AS (
        SELECT doc_id, n_c,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_filter(toks, w -> lower(w) IN (
                 'the','and','of','to','a','is',
                 'der','die','und','ist','das','nicht',
                 'el','la','que','los','una','es',
                 'le','les','des','et','une','est'))) AS BIGINT) AS n_stop,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        FROM t),
      r AS (
        SELECT doc_id,
               n_tok < 10 AS r_too_short,
               CASE WHEN n_tok > 0 THEN (n_c * 1000) // n_tok > 8000
                    ELSE true END AS r_long_words,
               n_stop = 0 AS r_no_stopwords,
               n_distinct * 1000 < n_tok * 400 AS r_repetitive
        FROM d)
      SELECT *, NOT (r_too_short OR r_long_words OR r_no_stopwords
                     OR r_repetitive) AS keep
      FROM r"""))

  /** BM25 lexical retrieval: probe documents (doc_id < 5) as QUERIES
    * against the rest of the corpus, Lucene-parameter BM25
    * (k1 = 1.2, b = 0.75, idf = ln((N − df + ½)/(df + ½) + 1)), top-10
    * hits per query. Complements sim1–sim9's dense retrieval with the
    * sparse/lexical path every retrieval stack pairs it with.
    *
    * Scale shape: corpus statistics are exact integers (N, Σdl — one
    * bounded narrow aggregate, broadcast); the exploded token stream is
    * semi-restricted by the BROADCAST query-term set BEFORE any shuffle,
    * so only matched tokens ever aggregate (the full-vocabulary inverted
    * index is never built); the restricted postings — the probe-set-sized
    * retrieval working set — materialize once (`localCheckpoint`, the dd7
    * diamond-breaking pattern) and feed both the df count and the scoring
    * join; the per-(query, doc) sum shuffles on uniform composite keys;
    * top-k is the samp2 salted two-phase window, so no single partition
    * ever sees more than 32·k survivors per query.
    */
  val bm25TopK = GQuery(
    "tx18_bm25_topk",
    (s, dir) => {
      val corpus = docs(s, dir).filter(col("doc_id") >= 5)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("dl"))
      val stats = corpus.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      val qterms = docs(s, dir).filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(tokens(col("text")))).as("term"))
      val postings = corpus
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qterms.select(col("term")).distinct()), "term")
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
        // persist, not eager localCheckpoint: this is diamond-breaking (the
        // postings feed BOTH the df count and the scoring join), not lineage
        // truncation in a loop — lazy caching defers the materialization to
        // first use and keeps AQE able to re-plan both consumers.
        .persist()
      // postings rows are distinct (doc, term): df is a plain row count
      val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val avgdl = col("total_dl").cast("double") / col("n_docs")
      val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
      val contrib = idf * ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl))))
      val scored = postings
        .join(broadcast(qterms), "term")
        .join(broadcast(dfreq), "term")   // both probe-set-sized dims
        .crossJoin(broadcast(stats))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(contrib).as("score"), count(lit(1)).cast("long").as("n_terms"))
      val local = row_number().over(
        Window.partitionBy(col("query_id"), pmod(col("doc_id"), lit(32L)))
          .orderBy(col("score").desc, col("doc_id")))
      val rk = row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id")))
      scored
        .withColumn("lrk", local).filter(col("lrk") <= 10)
        .withColumn("rk", rk).filter(col("rk") <= 10)
        .select(col("query_id"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_terms"), col("score"))
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        FROM documents WHERE doc_id >= 5),
      c2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM corpus),
      stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM c2),
      p0 AS (SELECT doc_id, dl, unnest(toks) AS term FROM c2),
      postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf FROM p0 GROUP BY 1, 2, 3),
      q AS (
        SELECT doc_id AS query_id,
               unnest(list_distinct(regexp_extract_all(text, '\S+'))) AS term
        FROM documents WHERE doc_id < 5),
      dfreq AS (
        SELECT term, COUNT(*) AS df FROM postings
        WHERE term IN (SELECT term FROM q) GROUP BY 1),
      scored AS (
        SELECT q.query_id, postings.doc_id,
               SUM( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                    * ((tf * 2.2) /
                       (tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(total_dl AS DOUBLE) / n_docs))))) ) AS score,
               COUNT(*) AS n_terms
        FROM postings JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY 1, 2)
      SELECT query_id, rk, doc_id, n_terms, score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rk
        FROM scored) WHERE rk <= 10"""))

  /** Fuzzy decontamination: benchmark contamination at the NEAR-dup level.
    * tx8 catches verbatim 4-gram overlap; real leakage is usually a light
    * paraphrase or re-template of a benchmark item, which exact n-grams
    * miss. This pass runs the dd4 MinHash+LSH machinery between the corpus
    * and a held-out benchmark set (every 20th document): corpus docs that
    * share an LSH band with any benchmark doc are candidate contaminations,
    * reported with their strongest-matching benchmark item and the
    * signature-agreement evidence (integer 0..16, so the ranking and the
    * oracle comparison are bit-exact).
    *
    * Scale shape: the benchmark is the bounded relation (benchmarks are
    * KBs–MBs, fixed as the corpus grows) — its banded signatures broadcast;
    * the corpus streams through the signature pipeline once, per-row inside
    * codegen, and the candidate join is a broadcast equi-join on
    * (band, band_hash). Nothing all-pairs; the per-doc best-match is a
    * window over the already-thin candidate rows.
    */
  val fuzzyDecontamination = GQuery(
    "tx19_fuzzy_decontamination",
    (s, dir) => {
      val sig = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
        .select(col("doc_id"),
          transform(col("sh"), h => polyHash(h)).as("hs"))
        .select(col("doc_id"), minhashSig(col("hs"), 16).as("sig"))
      val bands = sig.select(
        col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)), b =>
          aggregate(slice(col("sig"), b * 4 + 1, lit(4)), lit(0L),
            (acc, v) => (acc * 31 + v) % Mod)))
          .as(Seq("band", "band_hash")))
      val probes = bands.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("probe_id"), col("sig").as("probe_sig"),
          col("band"), col("band_hash"))
      val cand = bands.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(probes), Seq("band", "band_hash"))
        .select(col("doc_id"), col("probe_id"), col("sig"), col("probe_sig"))
        .distinct()
      val scored = cand.select(col("doc_id"), col("probe_id"),
        size(filter(zip_with(col("sig"), col("probe_sig"),
          (x, y) => x === y), b => b)).cast("long").as("n_agree"))
      val rk = row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("n_agree").desc, col("probe_id")))
      scored.withColumn("rk", rk)
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_probe_hits"),
          max(when(col("rk") === 1, col("probe_id"))).as("best_probe_id"),
          max(when(col("rk") === 1, col("n_agree"))).as("best_agree_16"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               list_transform(${sqlShingles3("regexp_extract_all(text, '\\S+')")},
                              sh -> ${sqlPolyHash("sh")}) AS hs
        FROM documents),
      sig AS (SELECT doc_id, ${sqlMinhashSig("hs", 16)} AS sig FROM d),
      bands AS (
        SELECT doc_id, sig, unnest(range(0, 4)) AS band,
               unnest(list_transform(range(0, 4), b ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
                             (acc, v) -> (acc * 31 + v) % $Mod))) AS band_hash
        FROM sig),
      cand AS (
        SELECT DISTINCT c.doc_id, p.doc_id AS probe_id,
               c.sig AS sig, p.sig AS probe_sig
        FROM bands c JOIN bands p
          ON c.band = p.band AND c.band_hash = p.band_hash
         AND c.doc_id % 20 <> 0 AND p.doc_id % 20 = 0),
      scored AS (
        SELECT doc_id, probe_id,
               CAST(len(list_filter(list_zip(sig, probe_sig),
                                    x -> x[1] = x[2])) AS BIGINT) AS n_agree
        FROM cand),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n_agree DESC, probe_id) AS rk
        FROM scored)
      SELECT doc_id, COUNT(*) AS n_probe_hits,
             MAX(CASE WHEN rk = 1 THEN probe_id END) AS best_probe_id,
             MAX(CASE WHEN rk = 1 THEN n_agree END) AS best_agree_16
      FROM rk GROUP BY 1"""))

  /** DSIR-style target-domain data selection (Xie et al., "Data Selection
    * for Language Models via Importance Resampling"): rank corpus documents
    * by how much their n-gram distribution looks like a TARGET domain
    * (here the held-out benchmark set, every 20th document) relative to
    * the corpus itself. Each bigram instance contributes the add-1
    * importance ratio `(target_count + 1) / (corpus_count + 1)` in exact
    * integer micro-units (ratios rank identically to log-ratios under
    * per-doc averaging at fixed length; integer div keeps both engines
    * bit-identical — the published method's hashed-ngram LM ratio, with
    * smoothing choice pinned in the expression).
    *
    * Scale shape: the tx9 pattern with two models — the TARGET model is
    * benchmark-bounded (broadcast, like tx18's probe structures); the
    * CORPUS model is unbounded, so instances join it on the uniform
    * bigram key (shuffle equi-join, AQE handles the stop-bigram skew).
    * The exploded bigram relation is persisted once and reused for the
    * corpus model and the scoring pass. Top-25 selection is
    * TakeOrderedAndProject, never a global sort.
    */
  val dsirSelection = GQuery(
    "tx20_dsir_selection",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val n = greatest(size(col("t")) - 1, lit(0))
      val flat = toks
        .select(col("doc_id"), explode(
          zip_with(slice(col("t"), lit(1), n), slice(col("t"), lit(2), n),
            (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .persist() // reused: corpus model + scoring instances
      val tModel = flat.filter(col("doc_id") % 20 === 0)
        .groupBy(col("bigram")).agg(count(lit(1)).as("t_bg"))
      val cModel = flat.filter(col("doc_id") % 20 =!= 0)
        .groupBy(col("bigram")).agg(count(lit(1)).as("c_bg"))
      val scored = flat.filter(col("doc_id") % 20 =!= 0)
        .join(cModel, "bigram")
        .join(broadcast(tModel), Seq("bigram"), "left")
        .withColumn("ratio_micro",
          expr("(coalesce(t_bg, 0L) + 1L) * 1000000L div (c_bg + 1L)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("ratio_micro")).as("sum_ratio_micro"))
        .withColumn("dsir_score_micro",
          expr("sum_ratio_micro div n_bigrams"))
      scored
        .orderBy(col("dsir_score_micro").desc, col("doc_id"))
        .limit(25)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("dsir_score_micro").desc, col("doc_id"))))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      flat AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2),
      tmodel AS (
        SELECT bigram, COUNT(*) AS t_bg FROM flat
        WHERE doc_id % 20 = 0 GROUP BY 1),
      cmodel AS (
        SELECT bigram, COUNT(*) AS c_bg FROM flat
        WHERE doc_id % 20 <> 0 GROUP BY 1),
      scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM((COALESCE(t_bg, 0) + 1) * 1000000 // (c_bg + 1))
                    AS BIGINT) AS sum_ratio_micro
        FROM flat JOIN cmodel USING (bigram)
             LEFT JOIN tmodel USING (bigram)
        WHERE doc_id % 20 <> 0
        GROUP BY 1)
      SELECT * FROM (
        SELECT doc_id, n_bigrams, sum_ratio_micro,
               sum_ratio_micro // n_bigrams AS dsir_score_micro,
               row_number() OVER (ORDER BY sum_ratio_micro // n_bigrams DESC,
                                  doc_id) AS rk
        FROM scored) WHERE rk <= 25"""))

  /** tx21: Zipf-law fit — the corpus-statistics companion to tx13's Heaps
    * curve: regress log(frequency) on log(rank) over the top-1000 terms and
    * report the exponent, intercept, and r². A healthy natural-language
    * corpus fits slope ≈ −1; a corpus poisoned by boilerplate or synthetic
    * repetition bends the head of the curve, so the exponent is a cheap
    * whole-corpus health gate alongside tx16's dup-rate.
    *
    * Scale shape: term counting is one uniform token shuffle with map-side
    * combine; the top-1000 election is the salted two-phase window (the
    * samp2/sk1 idiom — the final rank window sees ≤ 32·k survivors, a
    * BOUNDED single partition, never the vocabulary); the regression is
    * one aggregate over exactly 1000 rows. Float discipline: per-row
    * log() values quantize to decimal(28,12) before summation, so the
    * normal-equation sums are exact and the fit is bit-stable (ln() ulp
    * differences between engines sit 6 orders below the compare
    * precision).
    */
  val zipfFit = GQuery(
    "tx21_zipf_fit",
    (s, dir) => {
      val K = 1000
      val counts = docs(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
      val local = row_number().over(
        Window.partitionBy(pmod(hash(col("token")), lit(32)))
          .orderBy(col("f").desc, col("token")))
      val rk = row_number().over(
        Window.orderBy(col("f").desc, col("token")))
      val head = counts
        .withColumn("lrk", local).filter(col("lrk") <= K)
        .withColumn("rank", rk).filter(col("rank") <= K)
        .select(
          log(col("rank").cast("double")).cast("decimal(18,12)").as("x"),
          log(col("f").cast("double")).cast("decimal(18,12)").as("y"))
      // sums are exact decimals (items quantized per row, products fit
      // decimal(37,24)); regression algebra then runs in double over the
      // six exact scalars — identical expression structure to the oracle,
      // so every IEEE operation matches
      val sums = head.agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val varX = col("n") * col("sxx") - col("sx") * col("sx")
      val varY = col("n") * col("syy") - col("sy") * col("sy")
      sums.select(
        col("n").cast("long").as("n_terms"),
        (cov / varX).as("zipf_slope"),
        ((col("sy") - cov / varX * col("sx")) / col("n")).as("intercept"),
        (cov * cov / (varX * varY)).as("r2"))
    },
    Some("""
      WITH counts AS (
        SELECT token, COUNT(*) AS f
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents)
        GROUP BY 1),
      head AS (
        SELECT CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,12)) AS x,
               CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(18,12)) AS y
        FROM (SELECT f, row_number() OVER (ORDER BY f DESC, token) AS rank
              FROM counts)
        WHERE rank <= 1000),
      sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM head)
      SELECT CAST(n AS BIGINT) AS n_terms,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept,
             (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      FROM sums"""))

  /** tx22: language-ID evaluation — the confusion matrix of tx3's stopword
    * classifier against the labeled `lang` column, the sim9-for-text: every
    * heuristic that gates a corpus needs its error structure measured
    * before anyone trusts the gate (which languages bleed into which, and
    * at what rate). Reuses tx3's exact classifier body (er2-reuses-er1
    * pattern), so the evaluation can never drift from the operator it
    * evaluates.
    *
    * Scale shape: per-row classification rides the scan (tx3's argument);
    * the matrix is one groupBy on the ≤ |langs|² cell key; row totals are
    * windows over that tiny relation, never a second corpus pass. The
    * diagonal cell_rate IS per-class recall.
    */
  val langIdEval = GQuery(
    "tx22_langid_eval",
    (s, dir) => {
      val cells = langId.run(s, dir)
        .groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("row_total", sum(col("n")).over(
          Window.partitionBy(col("labeled_lang"))))
        .withColumn("cell_rate",
          col("n").cast("double") / col("row_total").cast("double"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('the','and','of','to','a','is'))) AS s_en,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('der','die','und','ist','das','nicht'))) AS s_de,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('el','la','que','los','una','es'))) AS s_es,
          len(list_filter(regexp_extract_all(text, '\S+'),
              w -> lower(w) IN ('le','les','des','et','une','est'))) AS s_fr
        FROM documents),
      pred AS (
        SELECT labeled_lang,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS predicted_lang
        FROM scored),
      cells AS (
        SELECT labeled_lang, predicted_lang, COUNT(*) AS n
        FROM pred GROUP BY 1, 2)
      SELECT labeled_lang, predicted_lang, n,
             CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT)
               AS row_total,
             CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS DOUBLE)
               AS cell_rate
      FROM cells"""))

  /** pipe4: quality-score calibration — IS the cheap heuristic predictive
    * of the expensive signal? Decile-bucket tx2's stopword ratio and
    * report each decile's mean duplicated-shingle rate (tx16): if the
    * curve is flat the score carries no information about duplication and
    * gating on it is cargo cult; if it slopes, the score earns its place
    * in the pipe2 gate. The canonical "measure your heuristic before
    * trusting it" audit, composed from two existing operators' bodies.
    *
    * Scale shape + determinism: scores quantize to integer 1e-5 units
    * FIRST, and the decile boundaries are DISCRETE order statistics read
    * off the quantized-score histogram with a cumulative window (the sk8
    * extraction pattern) — NOT interpolated percentiles, whose last-ulp
    * differences between engines reassign entire tie groups at a
    * boundary (observed at sf0.1), and NOT an ntile window over the
    * corpus, which would single-partition it. The histogram is bounded
    * by the quantization resolution (≤ 1e5 rows) regardless of corpus
    * size; boundaries broadcast back as a 9-element array; bucket
    * assignment is per-row integer comparison; means accumulate in
    * quantized decimal. Bit-stable end to end.
    */
  val qualityCalibration = GQuery(
    "pipe4_quality_calibration",
    (s, dir) => {
      val q = quality.run(s, dir).select(col("doc_id"), col("stopword_ratio"))
      val d = dupNgramRate.run(s, dir).select(col("doc_id"), col("dup_rate"))
      // r14: `joined` feeds BOTH the decile-boundary histogram and the
      // final per-decile rollup — without a persist each consumer re-runs
      // the two full text pipelines (tx2 stopword scan + tx16 shingle
      // window) behind it. Doc-count-sized rows (4 scalars), so the cache
      // is corpus-row-bounded, never corpus-byte-bounded.
      val joined = q.join(d, "doc_id")
        .withColumn("r_m",
          floor(col("stopword_ratio") * 100000).cast("long"))
        .persist()
      val cum = joined.groupBy(col("r_m")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("r_m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      val probes = s.range(1, 10).select((col("id").cast("double") / 10).as("p"))
      val bounds = cum.crossJoin(broadcast(probes))
        .filter(col("cum") >= ceil(col("p") * col("n")))
        .groupBy(col("p")).agg(min(col("r_m")).as("b"))
        .agg(sort_array(collect_list(col("b"))).as("bs"))
      joined.crossJoin(broadcast(bounds))
        .withColumn("decile",
          size(filter(col("bs"), b => col("r_m") > b)).cast("long"))
        .groupBy(col("decile"))
        .agg(
          count(lit(1)).as("n_docs"),
          (sum(col("stopword_ratio").cast("decimal(18,12)")).cast("double") /
            count(lit(1))).as("mean_stopword_ratio"),
          (sum(col("dup_rate").cast("decimal(18,12)")).cast("double") /
            count(lit(1))).as("mean_dup_rate"))
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
                      w -> lower(w) IN ('the','a','of','and','to','in','is','on')))
                    AS DOUBLE) / len(regexp_extract_all(text, '\\S+'))
                 AS stopword_ratio
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
               unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
                 AS shingle
        FROM documents),
      wdf AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh),
      d AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS dup_rate
        FROM wdf GROUP BY 1),
      joined AS (
        SELECT q.doc_id, q.stopword_ratio, d.dup_rate,
               CAST(FLOOR(q.stopword_ratio * 100000) AS BIGINT) AS r_m
        FROM q JOIN d ON q.doc_id = d.doc_id),
      cum AS (
        SELECT r_m, c,
               SUM(c) OVER (ORDER BY r_m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(c) OVER () AS n
        FROM (SELECT r_m, COUNT(*) AS c FROM joined GROUP BY 1)),
      probes AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS p),
      bnd AS (
        SELECT p, MIN(r_m) AS b
        FROM cum CROSS JOIN probes
        WHERE cum >= CEIL(p * n)
        GROUP BY 1),
      bounds AS (SELECT list_sort(list(b)) AS bs FROM bnd)
      SELECT CAST(len(list_filter(bs, b -> r_m > b)) AS BIGINT) AS decile,
             COUNT(*) AS n_docs,
             CAST(SUM(CAST(stopword_ratio AS DECIMAL(18,12))) AS DOUBLE)
               / COUNT(*) AS mean_stopword_ratio,
             CAST(SUM(CAST(dup_rate AS DECIMAL(18,12))) AS DOUBLE)
               / COUNT(*) AS mean_dup_rate
      FROM joined, bounds
      GROUP BY 1"""))

  /** tx23: BPE merge-pair statistics — the initialization step of byte-pair
    * encoding tokenizer training (Sennrich et al. 2016): count every
    * adjacent symbol pair inside every word, weighted by the word's corpus
    * frequency, and elect the top merge candidates. The full BPE loop is
    * sequential (each merge changes the next count), but the expensive part
    * — the corpus-wide pair census each round re-runs — is exactly this
    * query, and the first round's winner IS the first merge rule.
    *
    * Scale shape: the corpus collapses to the word-frequency table first
    * (one uniform token shuffle with map-side combine — vocabulary-sized,
    * orders of magnitude below the corpus), so the per-character pair
    * explosion runs over word TYPES, not word occurrences: "the" appearing
    * 10^9 times explodes its 2 pairs once, weighted by wf. Pair extraction
    * is one zip_with over the character array (codegen'd, shuffle-free);
    * the census is one ≤|alphabet|²-keyed aggregate; the top-K election is
    * the salted two-phase window (tx21's idiom — the global rank sees
    * ≤ 32·K survivors, never the pair table). All counts are exact
    * integers; ties break on the pair bytes, so the merge order is
    * bit-stable — the property tokenizer reproducibility depends on.
    */
  val bpeMergeStats = GQuery(
    "tx23_bpe_merge_stats",
    (s, dir) => {
      val K = 50
      val words = docs(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      val cs = chars(col("word"))
      val pairs = zip_with(
        slice(cs, lit(1), size(cs) - 1),
        slice(cs, lit(2), size(cs) - 1),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))
      val census = words
        .select(col("word"), col("wf"), explode(pairs).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(
          sum(col("wf")).as("pair_count"),
          countDistinct(col("word")).as("word_types"))
      val local = row_number().over(
        Window.partitionBy(pmod(hash(col("lhs"), col("rhs")), lit(32)))
          .orderBy(col("pair_count").desc, col("lhs"), col("rhs")))
      val global = row_number().over(
        Window.orderBy(col("pair_count").desc, col("lhs"), col("rhs")))
      census
        .withColumn("lrk", local).filter(col("lrk") <= K)
        .withColumn("merge_rank", global).filter(col("merge_rank") <= K)
        .select(col("merge_rank"), col("lhs"), col("rhs"),
          col("pair_count"), col("word_types"))
    },
    Some("""
      WITH words AS (
        SELECT word, COUNT(*) AS wf
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
              FROM documents)
        GROUP BY 1),
      pos AS (
        SELECT word, wf,
               unnest(range(1, length(word))) AS i
        FROM words),
      census AS (
        SELECT substr(word, CAST(i AS INTEGER), 1) AS lhs,
               substr(word, CAST(i AS INTEGER) + 1, 1) AS rhs,
               CAST(SUM(wf) AS BIGINT) AS pair_count,
               COUNT(DISTINCT word) AS word_types
        FROM pos GROUP BY 1, 2)
      SELECT row_number() OVER (ORDER BY pair_count DESC, lhs, rhs)
               AS merge_rank,
             lhs, rhs, pair_count, word_types
      FROM census
      ORDER BY pair_count DESC, lhs, rhs
      LIMIT 50"""))

  /** tx24: INTRA-document repetition census — the other half of the
    * repetition signal tx16 measures across documents. Per (doc, n) for
    * n ∈ {2,3,4}: total n-gram occurrences, characters covered by grams
    * that recur WITHIN the document (the Gopher-family
    * "fraction of characters in duplicate n-grams" filters — Rae et al.
    * 2021 §A1.1 run exactly this battery before training), and the char
    * coverage of the single heaviest gram (count × gram length — a
    * well-ordered scalar max, no tie-break needed). Fractions are exact
    * integer ppm so no float boundary drifts between engines; a looping
    * doc ("buy now buy now buy now…") pins dup_char_ppm near 10^6 while a
    * clean doc sits near 0 — the threshold a corpus gate cuts on.
    *
    * Scale shape: shingles explode map-side (tokens stay in HOF argument
    * position — the shinglesKAll slices — so no per-element re-eval);
    * ONE map-side-combinable shuffle on the uniform (doc, n, gram) key,
    * then a (doc, n)-keyed aggregate over the per-doc gram inventory.
    * Nothing is cross-document, so the query scales with corpus size
    * like a scan, and a multi-MB pathological document costs its own
    * gram count, never a driver-side structure.
    */
  val intraDocRepetition = GQuery(
    "tx24_intra_doc_repetition",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        tokens(col("text")).as("toks"))
      val grams = d.select(col("doc_id"), col("n_chars"),
        explode(flatten(array(Seq(2, 3, 4).map(k =>
          transform(shinglesKAll(col("toks"), k),
            g => struct(lit(k).as("n"), g.as("gram")))): _*))).as("e"))
        .select(col("doc_id"), col("n_chars"),
          col("e.n").as("n"), col("e.gram").as("gram"))
      val counts = grams
        .groupBy(col("doc_id"), col("n_chars"), col("n"), col("gram"))
        .agg(count(lit(1)).as("c"))
        .withColumn("gram_chars", length(col("gram")).cast("long"))
      counts.groupBy(col("doc_id"), col("n_chars"), col("n"))
        .agg(
          sum(col("c")).as("n_grams"),
          sum(when(col("c") > 1, col("c") * col("gram_chars"))
            .otherwise(0L)).as("dup_chars"),
          max(col("c") * col("gram_chars")).as("top_chars"))
        .select(col("doc_id"), col("n"), col("n_chars"), col("n_grams"),
          col("dup_chars"), col("top_chars"),
          expr("dup_chars * 1000000L div n_chars").as("dup_char_ppm"),
          expr("top_chars * 1000000L div n_chars").as("top_char_ppm"))
    },
    Some {
      val toks = "regexp_extract_all(text, '\\S+')"
      val arms = Seq(2, 3, 4).map(k =>
        s"""SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars, $k AS n,
               unnest(${sqlShinglesKAll(toks, k)}) AS gram
            FROM documents""").mkString(" UNION ALL ")
      s"""
      WITH g AS ($arms),
      counts AS (
        SELECT doc_id, n_chars, n, gram, COUNT(*) AS c,
               CAST(len(gram) AS BIGINT) AS gram_chars
        FROM g GROUP BY 1, 2, 3, 4),
      agg AS (
        SELECT doc_id, n, n_chars,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c > 1 THEN c * gram_chars ELSE 0 END)
                    AS BIGINT) AS dup_chars,
               CAST(MAX(c * gram_chars) AS BIGINT) AS top_chars
        FROM counts GROUP BY 1, 2, 3)
      SELECT doc_id, n, n_chars, n_grams, dup_chars, top_chars,
             CAST(dup_chars * 1000000 // n_chars AS BIGINT) AS dup_char_ppm,
             CAST(top_chars * 1000000 // n_chars AS BIGINT) AS top_char_ppm
      FROM agg"""
    })

  override def queries: Seq[GQuery] =
    Seq(tokenCounts, quality, langId, fingerprint, corpusStats, tfidfTopTerms,
      bigramStats, decontamination, lmScores, mixSplit, vocabCap, qualityGate,
      vocabGrowth, piiScan, chunking, dupNgramRate, qualityRules, bm25TopK,
      fuzzyDecontamination, dsirSelection, zipfFit, langIdEval,
      qualityCalibration, bpeMergeStats, intraDocRepetition)
}
