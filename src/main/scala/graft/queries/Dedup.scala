package graft.queries

import graft.{GQuery, QueryPack, Tables}
import graft.functions.TextHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators over `documents` / `embeddings` — the core
  * large-corpus cleaning toolkit: exact hashing, n-gram Jaccard with an
  * inverted-index join, MinHash+LSH banding, SimHash, and embedding-cosine
  * near-dup.
  *
  * Scale design (the 100 TB story):
  *   - exact dedup is a single hash-shuffle groupBy — linear, skew-free
  *     (SHA-256 keys are uniform);
  *   - candidate generation for near-dup NEVER does the O(n²) cross join:
  *     pairs come from co-occurrence joins (shared shingle / shared LSH
  *     band), which shuffle on uniform hash keys. The pair-scoring join is
  *     then bounded by true-candidate counts;
  *   - per-doc signatures (minhash/simhash) are one-pass array math — no
  *     shuffle, no state.
  * Determinism: every hash is the shared rolling-hash family from
  * [[graft.functions.TextHash]], reproduced exactly in the DuckDB oracles.
  */
object Dedup extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Exact dedup: SHA-256 content hash, keeper = min doc_id per group. */
  val exact = GQuery(
    "dd1_exact_hash_dedup",
    (s, dir) => docs(s, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies")),
    Some("""
      SELECT sha256(text) AS text_hash,
             MIN(doc_id) AS keeper_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY 1"""))

  /** N-gram Jaccard near-dup: distinct word-3-gram shingles, inverted-index
    * join on shared shingles, exact integer Jaccard. Top-20 pairs by
    * similarity (deterministic tie-break) so output size is stable.
    */
  val ngramJaccard = GQuery(
    "dd2_ngram_jaccard_pairs",
    (s, dir) => {
      // staged projections: tokens → shingles each computed once per row
      // (inlining them into one tree duplicates the regex tokenize)
      val d = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
      val sized = d.select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      // self-joined below: materialize once so the shingle pipeline isn't
      // planned (and executed) twice — at cluster scale this is a cached
      // (or checkpointed) build side, not a recompute.
      // (A grouped-postings rewrite — collect_list per shingle, pair
      // expansion via nested transform/slice HOFs — was tried and is 2×
      // SLOWER: per-element slice copies the postings array O(df²) times in
      // interpreted HOF land. The codegen'd hash join wins.)
      // df pruning (a result-preserving rewrite for REAL corpora): shingles
      // with df=1 can never produce a pair, and on a natural heavy-tailed
      // shingle histogram they are the majority of postings — prepend
      //   inv.join(inv.groupBy("shingle").count().filter($"count">=2)
      //      .select("shingle"), Seq("shingle"), "left_semi")
      // before the self-join at 100 TB. On THIS synthetic corpus the
      // vocabulary is tiny (df=1 is 0.8% of postings, measured at sf0.1),
      // so the extra aggregate+semi-join costs more than it prunes — the
      // plain inverted index wins locally.
      val inv = sized.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
        .persist()
      val pairs = inv.as("a").join(inv.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("common"))
        .select(
          col("doc_a"), col("doc_b"),
          (col("common").cast("double") /
            (col("na") + col("nb") - col("common")).cast("double")).as("jaccard"))
      // top-k via TakeOrderedAndProject (per-partition partial top-k, no
      // single-partition window over the full pair set); the rank window
      // then only sees the 20 survivors
      val top = pairs
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(20)
      top.withColumn("rk", row_number().over(
        Window.orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, ${sqlShingles3("regexp_extract_all(text, '\\S+')")} AS sh
        FROM documents),
      sized AS (SELECT doc_id, sh, len(sh) AS n FROM d),
      inv AS (SELECT doc_id, n, unnest(sh) AS shingle FROM sized),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
               COUNT(*) AS common
        FROM inv a JOIN inv b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4),
      scored AS (
        SELECT doc_a, doc_b,
               CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) AS jaccard
        FROM pairs)
      SELECT doc_a, doc_b, jaccard,
             row_number() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS rk
      FROM scored QUALIFY rk <= 20"""))

  /** MinHash signatures (k=16) — per-doc one-pass array math. Output is the
    * flattened (doc_id, sig_index, minhash) so the oracle hash-compare works
    * on scalar columns.
    */
  val minhash = GQuery(
    "dd3_minhash_signatures",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles3(col("toks")).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), sh => polyHash(sh)).as("hs"))
      .select(col("doc_id"),
        posexplode(minhashSig(col("hs"), 16)).as(Seq("sig_index", "minhash"))),
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               list_transform(${sqlShingles3("regexp_extract_all(text, '\\S+')")},
                              sh -> ${sqlPolyHash("sh")}) AS hs
        FROM documents),
      sig AS (SELECT doc_id, ${sqlMinhashSig("hs", 16)} AS sig FROM d)
      SELECT doc_id,
             CAST(unnest(range(0, 16)) AS INT) AS sig_index,
             unnest(sig) AS minhash
      FROM sig"""))

  /** MinHash + LSH banding (4 bands × 4 rows): candidate pairs sharing ≥1
    * band, scored by signature agreement. The band key is a rolling hash of
    * the 4 minhash values — co-occurrence join, never a cross join.
    */
  val lshCandidates = GQuery(
    "dd4_minhash_lsh_pairs",
    (s, dir) => {
      val sig = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
        .select(col("doc_id"),
          transform(col("sh"), sh => polyHash(sh)).as("hs"))
        .select(col("doc_id"), minhashSig(col("hs"), 16).as("sig"))
      val bands = sig.select(
        col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)), b =>
          aggregate(slice(col("sig"), b * 4 + 1, lit(4)), lit(0L),
            (acc, v) => (acc * 31 + v) % Mod)))
          .as(Seq("band", "band_hash")))
        .persist() // self-joined: compute the minhash pipeline once
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .distinct()
      cand.select(
        col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / 16.0)
          .as("sig_agreement"))
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
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
             CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2]))
                  AS DOUBLE) / 16.0 AS sig_agreement
      FROM cand"""))

  /** SimHash (32-bit) per document — Hamming-space near-dup primitive. */
  val simhash = GQuery(
    "dd5_simhash",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      simhash32(transform(tokens(col("text")), t => polyHash(t))).as("simhash")),
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               list_transform(regexp_extract_all(text, '\\S+'),
                              t -> ${sqlPolyHash("t")}) AS hs
        FROM documents)
      SELECT doc_id, ${sqlSimhash32("hs")} AS simhash FROM d"""))

  /** Embedding-cosine near-dup: top-20 most similar CO-BUCKETED embedding
    * pairs — the dd16 sign-bucket equi-join as the pair source, exact
    * quantized integer cosine (see [[graft.functions.TextHash.quantize]])
    * as the score. The oracle recomputes the identical bucket rule
    * digit-for-digit, so candidate generation sits on the gate, not just
    * scoring.
    *
    * Scale shape: bucket equi-join on the 8-plane sign key — per-bucket
    * occupancy is n/2^planes, and the plane count is the knob that keeps it
    * O(1) as n grows (more planes = more buckets); NEVER the all-pairs
    * O(n²) join. The brute-force all-pairs formulation survives only as
    * [[cosinePairsBrute]], the spec-side recall oracle.
    */
  val cosinePairs = GQuery(
    "dd6_embedding_cosine_pairs",
    (s, dir) => {
      val q = emb(s, dir)
        .select(col("vec_id"), quantize(col("embedding")).as("qv"))
        .withColumn("norm", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
        .withColumn("bucket", lshBucket(col("qv"), 8))
        .persist() // both sides of the bucket self-join
      val pairs = q.as("a").join(q.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (dotQ(col("a.qv"), col("b.qv")) / (col("a.norm") * col("b.norm")))
            .as("cosine"))
      // top-k via TakeOrderedAndProject, not a global single-partition window
      val top = pairs
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b")).limit(20)
      top.withColumn("rk", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))))
    },
    Some(s"""
      WITH q0 AS (
        SELECT vec_id, ${sqlQuantize("embedding")} AS qv
        FROM embeddings),
      q AS (
        SELECT vec_id, qv, sqrt(CAST(${sqlDotQ("qv", "qv")} AS DOUBLE)) AS norm,
               ${graft.functions.TextHash.sqlLshBucket("qv", 8)} AS bucket
        FROM q0),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(${sqlDotQ("a.qv", "b.qv")} AS DOUBLE) / (a.norm * b.norm)
                 AS cosine
        FROM q a JOIN q b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cosine,
             row_number() OVER (ORDER BY cosine DESC, vec_a, vec_b) AS rk
      FROM pairs QUALIFY rk <= 20"""))

  /** Spec-only recall oracle for [[cosinePairs]]: the exact all-pairs
    * formulation (O(n²) — audit tool, never the driver query). Specs assert
    * dd6's bucketed pairs score identically here and measure candidate
    * recall against the exact top-k.
    */
  def cosinePairsBrute(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("norm", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dotQ(col("a.qv"), col("b.qv")) / (col("a.norm") * col("b.norm")))
          .as("cosine"))
  }

  /** The composed corpus-cleaning pipeline — what an LLM-data user actually
    * runs end-to-end: exact dedup (keep min doc_id per content hash) →
    * near-dup removal among the keepers (MinHash+LSH candidates, greedy
    * drop-the-larger-id at signature agreement ≥ 0.5) → structural quality
    * gate (≥ 5 tokens, mean token length ≤ 15). Emits one row per document
    * with per-stage verdicts so every stage is oracle-checked, not just the
    * survivor count.
    *
    * Scale shape: one hash-shuffle for the exact stage, the dd4 LSH
    * co-occurrence join (never O(n²)) for the near stage, per-row math for
    * the quality stage — the same plan shapes as dd1/dd4/tx2, composed.
    */
  val cleanCorpus = GQuery(
    "pipe1_clean_corpus",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      // stage 1: exact dedup — r14 (guide §2.4, the dd8 rewrite): the
      // keeper is min(doc_id) over the hash partition, so read it off a
      // window (exactly the oracle's own formulation below) instead of
      // aggregate + join-back — one hash(h) exchange instead of two plus a
      // join, and `d` is no longer consumed twice.
      val flagged = d
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("keeper_id",
          min(col("doc_id")).over(Window.partitionBy(col("h"))))
        .withColumn("is_exact_dup", col("doc_id") =!= col("keeper_id"))
        // flagged feeds stage 2 (keeper tokenize) AND stage 3 (quality
        // gate): persist so the scan + hash window run once per query —
        // otherwise the corpus text bytes cross the h-exchange twice
        .persist()
      // stage 2: LSH near-dup among exact keepers (dd4 pipeline)
      val bands = flagged.filter(!col("is_exact_dup"))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
        .select(col("doc_id"), transform(col("sh"), sh => polyHash(sh)).as("hs"))
        .select(col("doc_id"), minhashSig(col("hs"), 16).as("sig"))
        .select(col("doc_id"), col("sig"),
          posexplode(transform(sequence(lit(0), lit(3)), b =>
            aggregate(slice(col("sig"), b * 4 + 1, lit(4)), lit(0L),
              (acc, v) => (acc * 31 + v) % Mod)))
            .as(Seq("band", "band_hash")))
        .persist()
      val nearDups = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id"),
          (size(filter(zip_with(col("a.sig"), col("b.sig"),
            (x, y) => x === y), bb => bb)).cast("double") / 16.0).as("agreement"))
        .filter(col("agreement") >= 0.5)
        .select("doc_id").distinct()
        .withColumn("is_near_dup", lit(true))
      // stage 3: structural quality gate
      val nTok = size(tokens(col("text")))
      flagged.join(nearDups, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("is_exact_dup"),
          coalesce(col("is_near_dup"), lit(false)).as("is_near_dup"),
          (nTok >= 5 &&
            (length(col("text")).cast("double") / nTok.cast("double")) <= 15.0)
            .as("passes_quality"))
        .withColumn("kept",
          !col("is_exact_dup") && !col("is_near_dup") && col("passes_quality"))
    },
    Some(s"""
      WITH d0 AS (
        SELECT doc_id, text, sha256(text) AS h,
               MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper_id
        FROM documents),
      k AS (SELECT doc_id, text FROM d0 WHERE doc_id = keeper_id),
      hs AS (
        SELECT doc_id,
               list_transform(${sqlShingles3("regexp_extract_all(text, '\\S+')")},
                              sh -> ${sqlPolyHash("sh")}) AS hs
        FROM k),
      sig AS (SELECT doc_id, ${sqlMinhashSig("hs", 16)} AS sig FROM hs),
      bands AS (
        SELECT doc_id, sig, unnest(range(0, 4)) AS band,
               unnest(list_transform(range(0, 4), b ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
                             (acc, v) -> (acc * 31 + v) % $Mod))) AS band_hash
        FROM sig),
      near AS (
        SELECT DISTINCT b.doc_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE CAST(len(list_filter(list_zip(a.sig, b.sig), x -> x[1] = x[2]))
                   AS DOUBLE) / 16.0 >= 0.5),
      q AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\\S+')) AS n_tok,
               CAST(length(text) AS DOUBLE) AS n_chars
        FROM documents)
      SELECT d0.doc_id,
             d0.doc_id <> d0.keeper_id AS is_exact_dup,
             near.doc_id IS NOT NULL AS is_near_dup,
             (q.n_tok >= 5 AND q.n_chars / q.n_tok <= 15.0) AS passes_quality,
             (d0.doc_id = d0.keeper_id AND near.doc_id IS NULL
              AND q.n_tok >= 5 AND q.n_chars / q.n_tok <= 15.0) AS kept
      FROM d0
      LEFT JOIN near ON d0.doc_id = near.doc_id
      JOIN q ON d0.doc_id = q.doc_id"""))

  /** Near-dup CLUSTERS: dd4's verified LSH pairs (signature agreement >=
    * 0.5) as edges, [[graft.operators.ConnectedComponents]] for the
    * transitive closure — similarity is not pairwise-droppable, so cluster
    * id (= min doc_id of the component) is what a keep-one-per-cluster
    * policy needs. Oracle: the same closure as a DuckDB recursive CTE
    * (min-label reachability), checking the distributed fixpoint against a
    * declarative one.
    */
  val dedupClusters = GQuery(
    "dd7_dedup_clusters",
    (s, dir) => {
      val edges = lshCandidates.run(s, dir)
        .filter(col("sig_agreement") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      // r14 (guide §2.4): cluster size as a count window over the component
      // key instead of aggregate + join-back — one exchange on the
      // node-sized labels instead of two plus a join (shared helper).
      graft.operators.ConnectedComponents.runWithSize(edges, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("component").as("cluster_id"),
          col("component_size").as("cluster_size"))
    },
    lshCandidates.oracle.map(dd4Sql => s"""
      ${ccSqlPrefix(dd4Sql)}
      SELECT doc_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM cc"""))

  /** Shared oracle CTE chain: dd4's verified pairs → undirected edges →
    * recursive min-label closure → `cc(doc_id, cluster_id)`.
    */
  private def ccSqlPrefix(dd4Sql: String): String = s"""
      WITH RECURSIVE pairs AS ($dd4Sql),
      und AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE sig_agreement >= 0.5
        UNION
        SELECT doc_b, doc_a FROM pairs WHERE sig_agreement >= 0.5),
      walk(v, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT e.dst, w.label FROM walk w JOIN und e ON e.src = w.v),
      cc AS (SELECT v AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY v)"""

  /** Canonical-keeper election per near-dup cluster — the policy step that
    * turns dd7's clusters into a dedup decision: keep the longest document
    * (tie → smallest doc_id), mark the rest as drops. The election is a
    * per-cluster window over cluster-sized groups (bounded by cluster size,
    * not corpus size); the keeper map joins back on cluster_id — both
    * shuffles key on cluster_id, so the whole policy adds two small
    * exchanges over the (tiny) clustered subset, never touching the full
    * corpus.
    */
  val clusterKeepers = GQuery(
    "dd8_cluster_keepers",
    (s, dir) => {
      val cc = dedupClusters.run(s, dir)
      val lens = docs(s, dir).select(col("doc_id"), length(col("text")).as("n"))
      val sized = cc.join(lens, "doc_id")
      // r14: the keeper is the FIRST row of each cluster under the election
      // order, so read it off with first() over the ordered window instead
      // of electing via row_number + filter + join-back — the join (and the
      // second pass over `sized` feeding its probe side) disappears; one
      // cluster-keyed exchange remains.
      val keeperW = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n").desc, col("doc_id"))
      sized.withColumn("keeper_id", first(col("doc_id")).over(keeperW))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("keeper_id"), (col("doc_id") === col("keeper_id")).as("is_keeper"))
    },
    lshCandidates.oracle.map(dd4Sql => s"""
      ${ccSqlPrefix(dd4Sql)},
      sized AS (
        SELECT cc.doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               length(d.text) AS n
        FROM cc JOIN documents d ON cc.doc_id = d.doc_id),
      k AS (
        SELECT cluster_id, doc_id AS keeper_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n DESC, doc_id) AS rk
        FROM sized QUALIFY rk = 1)
      SELECT s.doc_id, s.cluster_id, s.cluster_size, k.keeper_id,
             s.doc_id = k.keeper_id AS is_keeper
      FROM sized s JOIN k ON s.cluster_id = k.cluster_id"""))

  /** Cross-document repeated spans: every 5-token window is fingerprinted
    * (rolling hash) and windows occurring in ≥2 distinct documents are
    * surfaced — the fixed-length-fingerprint approximation of suffix-array
    * substring dedup (the "dedup training data repeats" operator). One
    * hash-shuffle on uniform fingerprint keys, count-distinct by doc —
    * no pair enumeration anywhere, so cost is linear in corpus token count
    * at any scale. Top-20 by spread for a stable oracle row set.
    */
  val repeatedSpans = GQuery(
    "dd9_repeated_spans",
    (s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shinglesK(col("toks"), 5).as("sh"))
        .select(col("doc_id"),
          explode(transform(col("sh"), x => polyHash(x))).as("fp"))
      val top = d.groupBy(col("fp"))
        .agg(
          count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("fp"))
        .limit(20)
      top.withColumn("rk", row_number().over(
        Window.orderBy(col("n_docs").desc, col("n_occurrences").desc, col("fp"))))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               unnest(list_transform(
                 ${sqlShinglesK("regexp_extract_all(text, '\\S+')", 5)},
                 x -> ${sqlPolyHash("x")})) AS fp
        FROM documents),
      g AS (
        SELECT fp, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
        FROM d GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT fp, n_docs, n_occurrences,
             row_number() OVER (ORDER BY n_docs DESC, n_occurrences DESC, fp)
               AS rk
      FROM g QUALIFY rk <= 20"""))

  /** Hamming-space near-dup DEGREE over the 32-bit SimHash: for every
    * document, how many others sit within Hamming distance 3 — the density
    * signal a near-dup triage uses. Pairs are found WITHOUT a cross join by
    * the pigeonhole band trick: split the hash into 4 8-bit bands; ≤3
    * differing bits cannot touch all 4 bands, so every qualifying pair
    * shares at least one exact band ⇒ the band equi-join has PERFECT recall
    * (not probabilistic like dd4's minhash banding). Candidates verify with
    * one `bit_count(xor)` — integer-exact in both engines — and collapse to
    * a per-doc count, so the output stays one row per document no matter
    * how dense the pair space is. The oracle brute-forces the O(n²) pair
    * space (fine at oracle scale); the engine plan is the banded hash join
    * that survives 100 TB.
    */
  val simhashDegree = GQuery(
    "dd10_simhash_hamming_degree",
    (s, dir) => {
      val sims = docs(s, dir).select(
        col("doc_id"),
        simhash32(transform(tokens(col("text")), t => polyHash(t))).as("simhash"))
        .persist() // feeds bands twice (self-join) + the final join-back
      val bands = sims.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "band_val")))
      // Hamming filter BEFORE the distinct: most band collisions fail it,
      // so the dedup exchange only carries qualifying (doc_a, doc_b) pairs
      val pairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val degree = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_near3"))
      sims.select(col("doc_id")).join(degree, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_near3"), lit(0L)).as("n_near3"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               list_transform(regexp_extract_all(text, '\\S+'),
                              t -> ${sqlPolyHash("t")}) AS hs
        FROM documents),
      s AS (SELECT doc_id, ${sqlSimhash32("hs")} AS simhash FROM d)
      SELECT a.doc_id,
             CAST(COUNT(CASE WHEN b.doc_id IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_near3
      FROM s a LEFT JOIN s b
        ON a.doc_id <> b.doc_id
       AND bit_count(xor(a.simhash, b.simhash)) <= 3
      GROUP BY a.doc_id"""))

  /** Normalization-aware exact dedup: case-fold + whitespace-collapse
    * BEFORE hashing, so trivially reformatted copies (case, spacing) land
    * in one group — the canonicalization stage real pipelines run ahead of
    * dd1. `n_raw_variants` counts how many byte-distinct texts each
    * normalized group coalesced. Same single hash-shuffle shape as dd1;
    * normalization is per-row codegen'd string work riding the scan.
    */
  val normalizedDedup = GQuery(
    "dd11_normalized_dedup",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .groupBy(sha2(col("norm"), 256).as("norm_hash"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(sha2(col("text"), 256)).as("n_raw_variants")),
    Some("""
      WITH n AS (
        SELECT doc_id, text,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents)
      SELECT sha256(norm) AS norm_hash,
             MIN(doc_id) AS keeper_id,
             COUNT(*) AS n_copies,
             COUNT(DISTINCT sha256(text)) AS n_raw_variants
      FROM n GROUP BY 1"""))

  /** Incremental (cross-corpus) exact dedup with a Bloom-filter pre-prune:
    * flag every "new batch" document (odd doc_id) whose content hash already
    * exists in the "reference corpus" (even doc_id). The batch is first
    * filtered through a Bloom filter built over the corpus hashes, and only
    * the Bloom-POSITIVE survivors go through the exact semi-join verify —
    * the final answer is therefore EXACT (false positives are eliminated by
    * the verify join, false negatives don't exist), which is why the oracle
    * is the plain hash anti/semi join.
    *
    * Scale shape (the reason this operator exists): at 100 TB the naive plan
    * shuffles the ENTIRE new batch by hash to meet the corpus. The Bloom
    * filter (~1.2 GB per 10^9 corpus keys at 1% fpp) is built with one
    * corpus-side aggregate, broadcast once, and drops ~99% of the batch
    * map-side; the exact-verify semi-join then only shuffles true duplicates
    * plus the 1% fp residue. Same trick Spark's own runtime row-filtering
    * uses, applied cross-corpus. The membership probe is a scalar JVM call
    * against the broadcast sketch (no per-row serialization).
    */
  val bloomIncremental = GQuery(
    "dd12_bloom_incremental_dedup",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), sha2(col("text"), 256).as("h"))
      val corpus = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1)
      // size the sketch from the actual corpus cardinality (a fixed capacity
      // silently degrades fpp toward 1 as the corpus outgrows it, and the
      // "drops ~99% of the batch map-side" property evaporates); the count
      // is one columnar-scan aggregate over a table we scan anyway
      val corpusKeys = math.max(corpus.count(), 1000L)
      val bloom = corpus.stat.bloomFilter("h", corpusKeys, 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((h: String) => h != null && bc.value.mightContainString(h))
      val confirmed = batch.filter(mightContain(col("h")))
        .join(corpus.select(col("h")).distinct(), Seq("h"), "left_semi")
        .select(col("doc_id"), lit(true).as("c"))
      batch.join(confirmed, Seq("doc_id"), "left")
        .select(col("doc_id"), col("h").as("text_hash"),
          coalesce(col("c"), lit(false)).as("in_corpus"))
    },
    Some("""
      WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
      corpus AS (SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0),
      batch AS (SELECT doc_id, h FROM d WHERE doc_id % 2 = 1)
      SELECT b.doc_id, b.h AS text_hash, c.h IS NOT NULL AS in_corpus
      FROM batch b LEFT JOIN corpus c ON b.h = c.h"""))

  /** Maximal repeated spans: dd9 found which 5-token windows recur across
    * documents; dd13 merges ADJACENT repeated window positions within each
    * document into maximal spans `[span_start, span_end]` (token indexes) —
    * the span-level output an exact-substring training-data deduper actually
    * removes (windows are the fixed-length probes; runs of overlapping hits
    * are one repeated passage).
    *
    * Plan shape, all linear: positional windows ride the scan (shifted-slice
    * zip, no distinct); the repeated-fingerprint set is one uniform-key
    * groupBy; membership joins back on the fingerprint; islands form with
    * the classic pos − row_number() gaps-and-islands trick — one doc_id
    * shuffle whose per-doc sort is bounded by document length. No pair
    * enumeration anywhere, so cost stays linear in corpus token count.
    */
  val maximalSpans = GQuery(
    "dd13_maximal_repeated_spans",
    (s, dir) => {
      val K = 5
      val toks = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("t"))
      val n = greatest(size(col("t")) - (K - 1), lit(0))
      val joined = (2 to K).foldLeft(slice(col("t"), lit(1), n)) { (acc, j) =>
        zip_with(acc, slice(col("t"), lit(j), n), (a, b) => concat_ws(" ", a, b))
      }
      // r14: the window-fingerprint relation feeds BOTH the repeat
      // aggregate and the hit join — persist it so the tokenize +
      // K-way zip_with + polyHash pipeline (the expensive part) runs once
      // per corpus pass instead of twice. Rows are (doc_id, pos, fp) —
      // ~20 bytes each, token-count-bounded, disk-spillable.
      val w = toks.select(col("doc_id"),
        posexplode(transform(joined, x => polyHash(x))).as(Seq("pos", "fp")))
        .persist()
      val rep = w.groupBy(col("fp"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("fp"))
      val hits = w.join(rep, "fp").select(col("doc_id"), col("pos"))
      val grp = col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos")))
      hits.withColumn("grp", grp)
        .groupBy(col("doc_id"), col("grp"))
        .agg(
          min(col("pos")).as("span_start"),
          (max(col("pos")) + (K - 1)).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_windows"))
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
        FROM documents),
      w0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM t WHERE len(toks) >= 5),
      w AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               ${sqlPolyHash(
                 "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]")}
                 AS fp
        FROM w0),
      rep AS (
        SELECT fp FROM w GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2),
      k AS (SELECT doc_id, pos FROM w JOIN rep USING (fp)),
      g AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM k)
      SELECT doc_id, MIN(pos) AS span_start,
             CAST(MAX(pos) + 4 AS INT) AS span_end,
             COUNT(*) AS n_windows
      FROM g GROUP BY doc_id, grp"""))

  /** Cross-SOURCE similarity via mergeable MinHash sketches: every source's
    * documents collapse into one k=16 signature (the [[graft.functions
    * .MinHashMerge]] custom aggregate — element-wise min, which IS the
    * signature of the source's pooled shingle set), then pairwise sketch
    * agreement estimates the Jaccard overlap between sources — the
    * "which data sources duplicate each other" triage a mixture designer
    * runs before weighting.
    *
    * Scale shape: per-doc signing rides the scan; the sketch aggregate
    * carries 128 BYTES of state per source through an ordinary partial/
    * final hash aggregate (map-side combined, partitioning-independent);
    * the pairwise stage touches only |sources|² sketch rows — never
    * documents. This is the sketch pattern (constant-size mergeable state)
    * that replaces corpus-pair joins entirely at 100 TB.
    */
  val sourceSketch = GQuery(
    "dd14_source_minhash_sketch",
    (s, dir) => {
      val sig = docs(s, dir)
        .select(col("source"), tokens(col("text")).as("toks"))
        .select(col("source"), shingles3(col("toks")).as("sh"))
        .select(col("source"), transform(col("sh"), x => polyHash(x)).as("hs"))
        .select(col("source"), minhashSig(col("hs"), 16).as("sig"))
      val sk = sig.groupBy(col("source")).agg(minhashMerge(col("sig"), 16).as("sk"))
      sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
        .select(
          col("a.source").as("source_a"), col("b.source").as("source_b"),
          (size(filter(zip_with(col("a.sk"), col("b.sk"),
            (x, y) => x === y), bb => bb)).cast("double") / 16.0)
            .as("est_jaccard"))
    },
    Some(s"""
      WITH d AS (
        SELECT source,
               ${sqlMinhashSig(
                 s"list_transform(${sqlShingles3("regexp_extract_all(text, '\\S+')")}, " +
                 s"sh -> ${sqlPolyHash("sh")})", 16)} AS sig
        FROM documents),
      e AS (
        SELECT source, CAST(unnest(range(0, 16)) AS INT) AS i, unnest(sig) AS v
        FROM d),
      sk AS (SELECT source, i, MIN(v) AS mv FROM e GROUP BY 1, 2)
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS DOUBLE) / 16.0
               AS est_jaccard
      FROM sk a JOIN sk b ON a.i = b.i AND a.source < b.source
      GROUP BY 1, 2"""))

  /** The full production near-dup step: dd4's LSH CANDIDATES verified with
    * the EXACT shingle Jaccard — estimation proposes, exact math disposes.
    * dd2 computes exact Jaccard for every co-occurring pair (the audit
    * tool); this computes it only for banding candidates, so verification
    * cost is bounded by the candidate count the band parameters control —
    * the composition that actually ships at 100 TB. Per-pair verification
    * is an in-memory array intersection (bounded by document length), not
    * a join.
    */
  val verifiedNearDups = GQuery(
    "dd15_verified_near_dups",
    (s, dir) => {
      val sh = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
      val cand = lshCandidates.run(s, dir)
        .select(col("doc_a"), col("doc_b"), col("sig_agreement"))
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(
          col("doc_a"), col("doc_b"), col("sig_agreement"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) -
              size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
            .as("exact_jaccard"))
        .withColumn("verified", col("exact_jaccard") >= 0.5)
    },
    lshCandidates.oracle.map(dd4Sql => s"""
      WITH cand AS ($dd4Sql),
      sh AS (
        SELECT doc_id, ${sqlShingles3("regexp_extract_all(text, '\\S+')")} AS sh
        FROM documents),
      scored AS (
        SELECT c.doc_a, c.doc_b, c.sig_agreement,
               CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                    AS DOUBLE) /
               CAST(len(a.sh) + len(b.sh) -
                    len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                    AS DOUBLE) AS exact_jaccard
        FROM cand c
        JOIN sh a ON c.doc_a = a.doc_id
        JOIN sh b ON c.doc_b = b.doc_id)
      SELECT doc_a, doc_b, sig_agreement, exact_jaccard,
             exact_jaccard >= 0.5 AS verified
      FROM scored"""))

  /** SEMANTIC dedup clusters (the SemDeDup shape, Abbas et al. '23): group
    * embeddings whose cosine similarity exceeds a threshold into
    * transitive clusters — candidates from the 8-plane random-hyperplane
    * LSH buckets (vectors agreeing on every hyperplane sign), exact
    * quantized-integer cosine verification, then
    * [[graft.operators.ConnectedComponents]] for the closure. A
    * keep-one-per-cluster policy (dd8) applied on top is embedding-level
    * dedup of paraphrases/translations that text hashing can't see.
    *
    * Scale shape: bucket join on the sign key (never a cross join; probe
    * multiplicity is bucket occupancy, tuned by plane count), exact verify
    * only on co-bucketed pairs, cluster closure over the (sparse) verified
    * edge set. The oracle recomputes the same bucket rule digit-for-digit
    * (same integer hyperplane hashes), so candidate generation — not just
    * scoring — sits on the gate.
    */
  val semanticClusters = GQuery(
    "dd16_semantic_clusters",
    (s, dir) => {
      val q = emb(s, dir)
        .select(col("vec_id"), quantize(col("embedding")).as("qv"))
        .withColumn("norm", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
        .withColumn("bucket", lshBucket(col("qv"), 8))
        .persist() // both sides of the bucket self-join
      val edges = q.as("a").join(q.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
          (dotQ(col("a.qv"), col("b.qv")) / (col("a.norm") * col("b.norm")))
            .as("cosine"))
        .filter(col("cosine") >= 0.3)
        .select(col("src"), col("dst"))
      // r14: count window over the component key (see dd7's helper note).
      graft.operators.ConnectedComponents.runWithSize(edges, "src", "dst")
        .select(col("vertex").as("vec_id"), col("component").as("cluster_id"),
          col("component_size").as("cluster_size"))
    },
    Some(s"""
      WITH RECURSIVE q0 AS (
        SELECT vec_id, ${sqlQuantize("embedding")} AS qv FROM embeddings),
      q AS (
        SELECT vec_id, qv,
               sqrt(CAST(${sqlDotQ("qv", "qv")} AS DOUBLE)) AS norm,
               ${graft.functions.TextHash.sqlLshBucket("qv", 8)} AS bucket
        FROM q0),
      pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM q a JOIN q b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE CAST(${sqlDotQ("a.qv", "b.qv")} AS DOUBLE) / (a.norm * b.norm)
              >= 0.3),
      und AS (
        SELECT src, dst FROM pairs
        UNION
        SELECT dst, src FROM pairs),
      walk(v, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT e.dst, w.label FROM walk w JOIN und e ON e.src = w.v),
      cc AS (SELECT v AS vec_id, MIN(label) AS cluster_id FROM walk GROUP BY v)
      SELECT vec_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM cc"""))

  /** dd17: span scrub — the TRANSFORM half of exact-substring dedup. dd13
    * reports where the repeated passages are; this applies the cut: every
    * 5-token window whose fingerprint's canonical occurrence (min doc_id)
    * lives in an EARLIER document is a scrub window, scrub windows merge
    * into spans (gaps-and-islands), and the covered tokens are removed from
    * the document — keep-first-occurrence, the Lee et al. 2021 ExactSubstr
    * policy. Output is one row per document with before/after token counts
    * and the fingerprint of the CLEANED text, so the driver's oracle
    * hash-checks the actual post-scrub content, not just the span list.
    *
    * Plan shape, all linear (the dd13 argument): windows ride the scan;
    * the keeper election is one uniform fp-keyed aggregate; islands form
    * per doc under one doc_id shuffle; the scrub itself is a per-row
    * indexed filter against the doc's own (bounded) span list joined back
    * as an array — the corpus is never exploded a second time and nothing
    * is pairwise. Every value is an integer or a rolling hash, bit-stable.
    */
  val spanScrub = GQuery(
    "dd17_span_scrub",
    (s, dir) => {
      val K = 5
      val toks = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("t"))
      val n = greatest(size(col("t")) - (K - 1), lit(0))
      val joined = (2 to K).foldLeft(slice(col("t"), lit(1), n)) { (acc, j) =>
        zip_with(acc, slice(col("t"), lit(j), n), (a, b) => concat_ws(" ", a, b))
      }
      val w = toks.select(col("doc_id"),
        posexplode(transform(joined, x => polyHash(x))).as(Seq("pos", "fp")))
      // r14 (guide §2.4, the dd8/pipe1 rewrite): the canonical occurrence is
      // min(doc_id) over the fp partition — a window reads it off each row
      // directly, so the aggregate + join-back pair AND the second run of
      // the fingerprint pipeline feeding the join's probe side both vanish
      // (one fp-keyed exchange total).
      val scrub = w
        .withColumn("keeper", min(col("doc_id")).over(
          Window.partitionBy(col("fp"))))
        .filter(col("doc_id") > col("keeper"))
        .select(col("doc_id"), col("pos"))
      val grp = col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos")))
      val spans = scrub.withColumn("grp", grp)
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).as("s"), (max(col("pos")) + (K - 1)).as("e"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
      val empty = expr("cast(array() as array<struct<s:int,e:int>>)")
      toks.join(spans, Seq("doc_id"), "left")
        .withColumn("spans", coalesce(col("spans"), empty))
        .withColumn("kept", filter(col("t"), (x, i) =>
          !exists(col("spans"),
            sp => i >= sp.getField("s") && i <= sp.getField("e"))))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
          polyHash(concat_ws(" ", col("kept"))).as("cleaned_fp"))
    },
    Some(s"""
      WITH t AS MATERIALIZED (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
        FROM documents),
      w0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM t WHERE len(toks) >= 5),
      w AS MATERIALIZED (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               ${sqlPolyHash(
                 "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]")}
                 AS fp
        FROM w0),
      fpmin AS (SELECT fp, MIN(doc_id) AS keeper FROM w GROUP BY 1),
      scrub AS (
        SELECT w.doc_id, w.pos FROM w JOIN fpmin USING (fp)
        WHERE w.doc_id > keeper),
      g AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM scrub),
      spans AS (
        SELECT doc_id, MIN(pos) AS s, CAST(MAX(pos) + 4 AS INT) AS e
        FROM g GROUP BY doc_id, grp),
      sp AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans
             FROM spans GROUP BY 1),
      cleaned AS (
        SELECT t.doc_id, t.toks,
               list_filter(t.toks, (x, i) ->
                 len(list_filter(COALESCE(sp.spans, []),
                     r -> i - 1 BETWEEN struct_extract(r, 's')
                                    AND struct_extract(r, 'e'))) = 0) AS kept
        FROM t LEFT JOIN sp ON t.doc_id = sp.doc_id)
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
             ${sqlPolyHash("array_to_string(kept, ' ')")} AS cleaned_fp
      FROM cleaned"""))

  /** dd18: the dedup PLANNER — before launching a near-dup pass over a new
    * corpus, measure what each candidate-generation strategy would emit and
    * choose. The exact inverted-index join (dd2) emits Σ_shingle C(df,2)
    * rows; the MinHash-LSH band join (dd4) emits Σ_bucket C(n,2); both
    * volumes fall out of ONE profiling pass over the same constructions the
    * strategies themselves use, so the estimates are not models — they are
    * the exact join cardinalities the engine would see ("measure, don't
    * guess" applied to the engine's own plan choice). The decision rule is
    * an integer budget (exact path admissible while its volume stays under
    * 50 rows per document); the LSH reduction ratio rides along in ppm.
    *
    * Scale shape: both profiles are uniform-key groupBy counts (map-side
    * combined) over relations the dedup pass computes anyway; the output
    * is one row. The cost of deciding is one corpus scan — the cost of
    * deciding WRONG is the difference between the two volumes, which is
    * exactly what this reports.
    */
  val dedupPlanner = GQuery(
    "dd18_dedup_planner",
    (s, dir) => {
      val sh = docs(s, dir)
        .select(col("doc_id"),
          explode(transform(shingles3(tokens(col("text"))),
            x => polyHash(x))).as("h"))
        .distinct()
      val exactVol = sh.groupBy(col("h"))
        .agg(count(lit(1)).as("df"))
        .agg(
          count(lit(1)).as("n_distinct_shingles"),
          sum(expr("df * (df - 1) div 2")).as("exact_pairs"))
      val sig = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
        .select(col("doc_id"),
          transform(col("sh"), x => polyHash(x)).as("hs"))
        .select(col("doc_id"), minhashSig(col("hs"), 16).as("sig"))
      val lshVol = sig.select(
          posexplode(transform(sequence(lit(0), lit(3)), b =>
            aggregate(slice(col("sig"), b * 4 + 1, lit(4)), lit(0L),
              (acc, v) => (acc * 31 + v) % Mod)))
            .as(Seq("band", "band_hash")))
        .groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("lsh_pairs"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      nDocs.crossJoin(broadcast(exactVol)).crossJoin(broadcast(lshVol))
        .select(col("n_docs"), col("n_distinct_shingles"),
          col("exact_pairs"), col("lsh_pairs"),
          expr("lsh_pairs * 1000000L div greatest(exact_pairs, 1L)")
            .as("lsh_reduction_ppm"),
          when(col("exact_pairs") <= col("n_docs") * 50,
            lit("exact-inverted-index")).otherwise(lit("minhash-lsh"))
            .as("chosen_strategy"))
    },
    Some(s"""
      WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                 ${sqlShingles3("regexp_extract_all(text, '\\S+')")},
                 x -> ${sqlPolyHash("x")})) AS h
        FROM documents),
      ev AS (
        SELECT COUNT(*) AS n_distinct_shingles,
               CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS exact_pairs
        FROM (SELECT h, COUNT(*) AS df FROM sh GROUP BY 1)),
      d AS (
        SELECT doc_id,
               list_transform(${sqlShingles3("regexp_extract_all(text, '\\S+')")},
                              x -> ${sqlPolyHash("x")}) AS hs
        FROM documents),
      sig AS (SELECT doc_id, ${sqlMinhashSig("hs", 16)} AS sig FROM d),
      bands AS (
        SELECT doc_id, unnest(range(0, 4)) AS band,
               unnest(list_transform(range(0, 4), b ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
                             (acc, v) -> (acc * 31 + v) % $Mod))) AS band_hash
        FROM sig),
      lv AS (
        SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS lsh_pairs
        FROM (SELECT band, band_hash, COUNT(*) AS n FROM bands GROUP BY 1, 2)),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT n_docs, n_distinct_shingles, exact_pairs, lsh_pairs,
             CAST(lsh_pairs * 1000000 // greatest(exact_pairs, 1) AS BIGINT)
               AS lsh_reduction_ppm,
             CASE WHEN exact_pairs <= n_docs * 50
                  THEN 'exact-inverted-index' ELSE 'minhash-lsh' END
               AS chosen_strategy
      FROM nd, ev, lv"""))

  /** pipe5: the scrubbed-corpus manifest — what a corpus looks like AFTER
    * the cuts, per source: benchmark-contaminated documents (tx8's 4-gram
    * overlap) drop whole, surviving documents lose their non-keeper
    * repeated spans (dd17), and the per-source before/after token ledger
    * is the artifact a data lead signs off on — "we removed X% as
    * contamination and Y% as duplication" with the numbers attached.
    * pipe2 decides which documents ship; this reports what shipping COST.
    *
    * Scale shape: both inputs are the existing operators' outputs (scrub
    * rides dd17's linear plan, contamination rides tx8's broadcast probe
    * join); the manifest is one groupBy over the ≤|sources| key after
    * doc-keyed joins — nothing new moves.
    */
  val scrubManifest = GQuery(
    "pipe5_scrub_manifest",
    (s, dir) => {
      val scrub = spanScrub.run(s, dir)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"))
      val contaminated = Text.decontamination.run(s, dir)
        .select(col("doc_id"), lit(true).as("dirty"))
      docs(s, dir).filter(col("doc_id") >= 5)
        .select(col("doc_id"), col("source"))
        .join(scrub, "doc_id")
        .join(contaminated, Seq("doc_id"), "left")
        .withColumn("dirty", coalesce(col("dirty"), lit(false)))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("dirty"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(!col("dirty"), col("n_tokens")).otherwise(0L))
            .as("tokens_before"),
          sum(when(!col("dirty"), col("n_removed")).otherwise(0L))
            .as("tokens_scrubbed"))
        .withColumn("tokens_after",
          col("tokens_before") - col("tokens_scrubbed"))
        .withColumn("removed_ppm", expr(
          "(tokens_scrubbed * 1000000L) div greatest(tokens_before, 1L)"))
    },
    Some(s"""
      WITH t AS MATERIALIZED (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
        FROM documents),
      w0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM t WHERE len(toks) >= 5),
      w AS MATERIALIZED (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               ${sqlPolyHash(
                 "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]")}
                 AS fp
        FROM w0),
      fpmin AS (SELECT fp, MIN(doc_id) AS keeper FROM w GROUP BY 1),
      scrubw AS (
        SELECT w.doc_id, w.pos FROM w JOIN fpmin USING (fp)
        WHERE w.doc_id > keeper),
      g AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM scrubw),
      spans AS (
        SELECT doc_id, MIN(pos) AS sp, CAST(MAX(pos) + 4 AS INT) AS ep
        FROM g GROUP BY doc_id, grp),
      spl AS (SELECT doc_id, list(struct_pack(s := sp, e := ep)) AS spans
              FROM spans GROUP BY 1),
      removedTok AS (
        -- token-exact removal (NOT Σ span lengths: islands 2-3 window
        -- positions apart produce token-overlapping spans, which a length
        -- sum double-counts; the kept-filter dedups exactly like dd17)
        SELECT t.doc_id,
               CAST(len(t.toks) - len(list_filter(t.toks, (x, i) ->
                 len(list_filter(spl.spans,
                     r -> i - 1 BETWEEN struct_extract(r, 's')
                                    AND struct_extract(r, 'e'))) = 0))
                 AS BIGINT) AS n_removed
        FROM t JOIN spl ON t.doc_id = spl.doc_id),
      probe AS (
        SELECT DISTINCT
               unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
                 AS shingle
        FROM documents WHERE doc_id < 5),
      dirty AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id,
                 unnest(${sqlShinglesK("regexp_extract_all(text, '\\S+')", 4)})
                   AS shingle
          FROM documents WHERE doc_id >= 5) c
        JOIN probe USING (shingle)),
      ledger AS (
        SELECT d.source, d.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               COALESCE(r.n_removed, 0) AS n_removed,
               (dd.doc_id IS NOT NULL) AS dirty
        FROM documents d
        JOIN t ON t.doc_id = d.doc_id
        LEFT JOIN removedTok r ON r.doc_id = d.doc_id
        LEFT JOIN dirty dd ON dd.doc_id = d.doc_id
        WHERE d.doc_id >= 5)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN dirty THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             CAST(SUM(CASE WHEN dirty THEN 0 ELSE n_tokens END) AS BIGINT)
               AS tokens_before,
             CAST(SUM(CASE WHEN dirty THEN 0 ELSE n_removed END) AS BIGINT)
               AS tokens_scrubbed,
             CAST(SUM(CASE WHEN dirty THEN 0 ELSE n_tokens END)
                  - SUM(CASE WHEN dirty THEN 0 ELSE n_removed END) AS BIGINT)
               AS tokens_after,
             CAST((SUM(CASE WHEN dirty THEN 0 ELSE n_removed END) * 1000000)
                  // greatest(SUM(CASE WHEN dirty THEN 0 ELSE n_tokens END), 1)
                  AS BIGINT) AS removed_ppm
      FROM ledger GROUP BY 1"""))

  override def queries: Seq[GQuery] =
    Seq(exact, ngramJaccard, minhash, lshCandidates, simhash, cosinePairs,
      cleanCorpus, dedupClusters, clusterKeepers, repeatedSpans, simhashDegree,
      normalizedDedup, bloomIncremental, maximalSpans, sourceSketch,
      verifiedNearDups, semanticClusters, spanScrub, dedupPlanner,
      scrubManifest)
}
