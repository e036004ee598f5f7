package graft.queries

import graft.{GQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the canonical "same real-world thing,
  * different strings" problem every 100 TB catalog ingest hits: product names
  * arrive with typos and editorial variants ("cold bolt" vs "old bolt"), and
  * revenue rollups silently fragment until the variants are resolved to one
  * entity. The classic pipeline is blocking → pairwise matching → transitive
  * clustering → survivorship, and each stage has a distinct scale shape:
  *
  *   - **Blocking** bounds the candidate space: never all-pairs over rows, and
  *     not even all-pairs over distinct names — pairs are generated only
  *     within a cheap deterministic block key (here the head noun of the
  *     name). At 100 TB the block key is the knob: a skewed block is salted or
  *     split by a second key, and the cost stays Σ|block|², not N².
  *   - **Matching runs on the DISTINCT name domain**, not on rows. A catalog
  *     with 10^11 rows has maybe 10^7 distinct names; `distinct()` first makes
  *     the quadratic stage operate on the small domain and the per-row work a
  *     broadcast hash join at the end. This is the single most important
  *     card in the ER deck and the reason none of these queries re-scan
  *     `part` more than once per stage.
  *   - **Edit distance uses Spark's banded `levenshtein(l, r, threshold)`**
  *     (SQL `levenshtein` 3-arg form, Spark 3.5+): the DP early-exits at the
  *     band, O(k·n) per pair instead of O(n²), and returns -1 above the
  *     threshold so the filter is sargable on the result. No UDF.
  *   - **Clustering** reuses [[graft.operators.ConnectedComponents]] (min-
  *     label propagation, one shuffle join per round) because string-equality
  *     matching is not transitive: "cold bolt"–"old bolt"–"red bolt" chains
  *     must land in ONE entity even though the endpoints are 3 edits apart.
  *   - **Survivorship + rollup** joins the (tiny) resolved-entity map back to
  *     rows/facts as a broadcast — the 100 TB fact table never shuffles.
  *
  * Reference scope note: the reference (event-stream) has no ER machinery;
  * this pack is part of the beyond-reference training-data mandate (the same
  * blocking/banding discipline as dd4's LSH, applied to relational entities).
  */
object EntityResolution extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val MaxEdits = 2

  /** Distinct part names with their block key (head noun = 2nd token). */
  private def blockedNames(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_name"))
      .distinct()
      .withColumn("block", split(col("p_name"), " ").getItem(1))

  /** er1: candidate variant pairs — block on the head noun, match with the
    * banded edit distance. Output is canonically ordered (name_a < name_b) so
    * the pair set is deterministic and directly consumable as an edge list.
    */
  val candidatePairs = GQuery(
    "er1_candidate_pairs",
    (s, dir) => {
      val names = blockedNames(s, dir)
      val a = names.select(col("block"), col("p_name").as("name_a"))
      val b = names.select(col("block"), col("p_name").as("name_b"))
      // distinct-domain self-join inside the block; the banded levenshtein
      // evaluates AFTER the block equi-join, so the quadratic term is
      // Σ|block|² over a domain of distinct names, never over rows
      a.join(b, "block")
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b"), MaxEdits).cast("long"))
        .filter(col("dist") >= 0)
        .select(col("name_a"), col("name_b"), col("dist"))
    },
    Some(s"""
      WITH names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS block FROM part)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM names a JOIN names b USING (block)
      WHERE a.p_name < b.p_name
        AND levenshtein(a.p_name, b.p_name) <= $MaxEdits"""))

  /** Shared oracle CTE chain: er1 pairs → undirected edges → recursive
    * min-label closure → `cc(name, entity_id)` (lexicographic min over ASCII
    * names — identical ordering in Spark and DuckDB).
    */
  private def ccSql: String = s"""
      WITH RECURSIVE names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS block FROM part),
      pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM names a JOIN names b USING (block)
        WHERE a.p_name < b.p_name
          AND levenshtein(a.p_name, b.p_name) <= $MaxEdits),
      und AS (
        SELECT name_a AS src, name_b AS dst FROM pairs
        UNION SELECT name_b, name_a FROM pairs),
      walk(v, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT e.dst, w.label FROM walk w JOIN und e ON e.src = w.v),
      cc AS (SELECT v AS name, MIN(label) AS entity_id FROM walk GROUP BY v)"""

  /** er2: variant clusters — connected components over the er1 edge list.
    * Matching is not transitive, so the pair list alone under-merges chains;
    * min-label propagation closes them. Entity id = lexicographically
    * smallest member name (stable, human-readable).
    */
  val entityClusters = GQuery(
    "er2_entity_clusters",
    (s, dir) => {
      val pairs = candidatePairs.run(s, dir)
      // r14: variant count via the shared count-window helper — one
      // node-sized exchange instead of aggregate + join-back.
      graft.operators.ConnectedComponents.runWithSize(pairs, "name_a", "name_b")
        .select(col("vertex").as("name"), col("component").as("entity_id"),
          col("component_size").as("n_variants"))
    },
    Some(s"""
      $ccSql
      SELECT name, entity_id,
             COUNT(*) OVER (PARTITION BY entity_id) AS n_variants
      FROM cc"""))

  /** er3: golden records — survivorship merge per resolved entity, singleton
    * names included as their own entity (left join + coalesce, so the output
    * covers the whole domain). Survivorship rules here: record count,
    * variant count, smallest part key as the anchor row, exact min/max price
    * (no order-dependent float sums).
    */
  val goldenRecords = GQuery(
    "er3_golden_records",
    (s, dir) => {
      val clusters = entityClusters.run(s, dir)
        .select(col("name"), col("entity_id"))
      val parts = t(s, dir, "part")
      // the entity map is distinct-name-domain-sized → broadcast; the row
      // side (100 TB in production) streams through map-side
      parts.join(broadcast(clusters),
          parts("p_name") === clusters("name"), "left")
        .withColumn("entity_id", coalesce(col("entity_id"), col("p_name")))
        .groupBy(col("entity_id"))
        .agg(
          count(lit(1)).as("n_records"),
          countDistinct(col("p_name")).as("n_variants"),
          min(col("p_partkey")).as("anchor_partkey"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"))
    },
    Some(s"""
      $ccSql
      SELECT COALESCE(cc.entity_id, p.p_name) AS entity_id,
             COUNT(*) AS n_records,
             COUNT(DISTINCT p.p_name) AS n_variants,
             MIN(p_partkey) AS anchor_partkey,
             MIN(p_retailprice) AS min_price,
             MAX(p_retailprice) AS max_price
      FROM part p LEFT JOIN cc ON p.p_name = cc.name
      GROUP BY 1"""))

  /** er4: the downstream payoff — revenue rolled up by RESOLVED entity
    * instead of raw name, the query that shows why ER ran at all (variant
    * fragments collapse into one line). Fact side joins `part` on the part
    * key and the broadcast entity map on the name; the fact table is the only
    * big relation and it shuffles exactly once, for the final group-by.
    */
  val resolvedRevenue = GQuery(
    "er4_resolved_revenue",
    (s, dir) => {
      val clusters = entityClusters.run(s, dir)
        .select(col("name"), col("entity_id"))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val parts = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(clusters), col("p_name") === col("name"), "left")
        .withColumn("entity_id", coalesce(col("entity_id"), col("p_name")))
        .groupBy(col("entity_id"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
    },
    Some(s"""
      $ccSql
      SELECT COALESCE(cc.entity_id, p.p_name) AS entity_id,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      LEFT JOIN cc ON p.p_name = cc.name
      GROUP BY 1"""))

  /** er5: blocking-quality audit — the evaluation metric every production
    * blocking scheme is tuned with (the sim9-for-ER): pair completeness
    * (how many TRUE matches the block key retains) and reduction ratio
    * (how much of the quadratic pair space it prunes). Ground truth here is
    * the unblocked all-pairs banded match over the distinct name domain —
    * affordable exactly because the domain is small; at 100 TB the same
    * audit runs on a hash-sampled slice of the domain (the sampling knob is
    * orthogonal to this plan). The all-pairs side is a deliberate
    * broadcast nested-loop over the domain relation, never over rows.
    */
  val blockingQuality = GQuery(
    "er5_blocking_quality",
    (s, dir) => {
      val names = blockedNames(s, dir)
      val a = names.select(col("p_name").as("name_a"), col("block").as("block_a"))
      val b = names.select(col("p_name").as("name_b"), col("block").as("block_b"))
      a.join(broadcast(b), col("name_a") < col("name_b"))
        .select(
          (levenshtein(col("name_a"), col("name_b"), MaxEdits) >= 0)
            .as("is_true"),
          (col("block_a") === col("block_b")).as("same_block"))
        .agg(
          count(lit(1)).as("n_all_pairs"),
          sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true_matches"),
          sum(when(col("is_true") && col("same_block"), 1L).otherwise(0L))
            .as("n_candidates_true"),
          sum(when(col("same_block"), 1L).otherwise(0L)).as("n_candidates"))
        .select(col("n_all_pairs"), col("n_true_matches"),
          col("n_candidates"), col("n_candidates_true"),
          (col("n_candidates_true").cast("double") /
            col("n_true_matches").cast("double")).as("pair_completeness"),
          (lit(1.0) - col("n_candidates").cast("double") /
            col("n_all_pairs").cast("double")).as("reduction_ratio"))
    },
    Some(s"""
      WITH names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS block FROM part),
      pairs AS (
        SELECT levenshtein(a.p_name, b.p_name) <= $MaxEdits AS is_true,
               a.block = b.block AS same_block
        FROM names a JOIN names b ON a.p_name < b.p_name)
      SELECT COUNT(*) AS n_all_pairs,
             CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_matches,
             CAST(SUM(CASE WHEN same_block THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidates,
             CAST(SUM(CASE WHEN is_true AND same_block THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_candidates_true,
             CAST(SUM(CASE WHEN is_true AND same_block THEN 1 ELSE 0 END)
                  AS DOUBLE)
               / CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS DOUBLE)
               AS pair_completeness,
             1.0 - CAST(SUM(CASE WHEN same_block THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS reduction_ratio
      FROM pairs"""))

  /** er6: Fellegi–Sunter match-weight estimation — the scoring layer of
    * probabilistic record linkage. For each comparison field (brand, type,
    * size) estimate m = P(field agrees | records match) and
    * u = P(field agrees | random pair), then the log2 agreement /
    * disagreement weights a pairwise classifier would sum per field.
    *
    * The scale trick: neither probability needs a materialized pair set.
    * Agreement counts over all C(N,2) random pairs and over the
    * assumed-match pairs (records sharing an exact p_name) are frequency
    * moments — Σ C(n_v, 2) over per-value counts and Σ C(n_{name,v}, 2)
    * over per-(name,value) counts — so the whole estimation is three
    * groupBy aggregates on low-cardinality keys riding one exploded scan,
    * where the textbook formulation is an O(N²) pair join. This is how FS
    * parameters are actually fit at census scale (method-of-moments /
    * EM initialization from value frequencies).
    *
    * On THIS generator brand/type/size are independent of the name, so the
    * report correctly shows m ≈ u (weights near zero): like dq3, the
    * operator's job is to measure the linkage power, not to assume it.
    */
  val fsWeights = GQuery(
    "er6_fs_weights",
    (s, dir) => {
      val vals = t(s, dir, "part").select(col("p_name"), explode(array(
          struct(lit("brand").as("field"), col("p_brand").as("value")),
          struct(lit("type").as("field"), col("p_type").as("value")),
          struct(lit("size").as("field"),
            col("p_size").cast("string").as("value")))).as("fv"))
        .select(col("p_name"), col("fv.field"), col("fv.value"))
      def pairs(c: Column): Column = (c * (c - 1)).cast("long") / 2
      // The finest aggregation level — per-(field, name, value) counts —
      // determines EVERYTHING else by re-aggregation, so it is the only
      // relation that ever touches the exploded scan (persisted: three
      // consumers): per-value counts are sums over names, per-name record
      // counts are the 'brand' slice's sums, and N is their total. One
      // scan, one wide shuffle; the rest is arithmetic on tiny relations.
      val mLevel = vals.groupBy(col("field"), col("p_name"), col("value"))
        .agg(count(lit(1)).as("c"))
        .persist()
      // agreement pairs among assumed-match (same exact name) pairs
      val mPairs = mLevel.groupBy(col("field"))
        .agg(sum(pairs(col("c"))).cast("long").as("m_pairs"))
      // agreement pairs among ALL record pairs: per-value counts first
      val uPairs = mLevel.groupBy(col("field"), col("value"))
        .agg(sum(col("c")).as("nv"))
        .groupBy(col("field"))
        .agg(sum(pairs(col("nv"))).cast("long").as("u_pairs"))
      // denominators: C(N,2) and Σ_name C(n_name,2) — from the 'brand'
      // slice (every record carries exactly one brand value)
      val denom = mLevel.filter(col("field") === "brand")
        .groupBy(col("p_name"))
        .agg(sum(col("c")).as("cn"))
        .agg(sum(col("cn")).as("n"),
          sum(pairs(col("cn"))).cast("long").as("match_pairs"))
        .select(pairs(col("n")).cast("long").as("total_pairs"),
          col("match_pairs"))
      uPairs.join(mPairs, "field")
        .crossJoin(broadcast(denom))
        .withColumn("m", col("m_pairs").cast("double") / col("match_pairs"))
        .withColumn("u", col("u_pairs").cast("double") / col("total_pairs"))
        .select(col("field"), col("m_pairs"), col("u_pairs"),
          col("match_pairs"), col("total_pairs"), col("m"), col("u"),
          log2(col("m") / col("u")).as("w_agree"),
          log2((lit(1.0) - col("m")) / (lit(1.0) - col("u")))
            .as("w_disagree"))
    },
    Some("""
      WITH vals AS (
        SELECT p_name, 'brand' AS field, p_brand AS value FROM part
        UNION ALL SELECT p_name, 'type', p_type FROM part
        UNION ALL SELECT p_name, 'size', CAST(p_size AS VARCHAR) FROM part),
      up AS (
        SELECT field, CAST(SUM(c*(c-1)//2) AS BIGINT) AS u_pairs
        FROM (SELECT field, value, COUNT(*) AS c FROM vals GROUP BY 1, 2)
        GROUP BY 1),
      mp AS (
        SELECT field, CAST(SUM(c*(c-1)//2) AS BIGINT) AS m_pairs
        FROM (SELECT field, p_name, value, COUNT(*) AS c
              FROM vals GROUP BY 1, 2, 3)
        GROUP BY 1),
      denom AS (
        SELECT CAST(SUM(c)*(SUM(c)-1)//2 AS BIGINT) AS total_pairs,
               CAST(SUM(c*(c-1)//2) AS BIGINT) AS match_pairs
        FROM (SELECT COUNT(*) AS c FROM part GROUP BY p_name))
      SELECT field, m_pairs, u_pairs, match_pairs, total_pairs,
             CAST(m_pairs AS DOUBLE) / match_pairs AS m,
             CAST(u_pairs AS DOUBLE) / total_pairs AS u,
             log2((CAST(m_pairs AS DOUBLE) / match_pairs)
                  / (CAST(u_pairs AS DOUBLE) / total_pairs)) AS w_agree,
             log2((1.0 - CAST(m_pairs AS DOUBLE) / match_pairs)
                  / (1.0 - CAST(u_pairs AS DOUBLE) / total_pairs))
               AS w_disagree
      FROM up JOIN mp USING (field), denom"""))

  /** er7: the Fellegi–Sunter scoring step er6's weights exist FOR — every
    * er1 candidate pair scored by Σ over fields of (agree ? w_agree :
    * w_disagree) and ranked into the clerical-review queue a human (or an
    * expensive model) works from the top of. Decisions are deliberately
    * NOT thresholded here: on this generator m ≈ u (same-name records
    * draw attributes independently), so any fixed cut would be a
    * constant-column pretense — the ranked queue is the honest artifact,
    * and a deployment picks cuts from ITS weight magnitudes.
    *
    * Scale shape: attribute representatives are one name-bounded
    * aggregate (min per (name, field) — deterministic canonical value);
    * each pair meets its two rep rows through uniform name-keyed joins
    * (pair volume already bounded by er1's blocking); the 3-row weight
    * table broadcasts. Float discipline: the per-field log-weights
    * quantize to decimal BEFORE the per-pair sum (the tx21 rule), so the
    * queue order cannot drift with join order.
    */
  val reviewQueue = GQuery(
    "er7_review_queue",
    (s, dir) => {
      val vals = t(s, dir, "part").select(col("p_name"), explode(array(
          struct(lit("brand").as("field"), col("p_brand").as("value")),
          struct(lit("type").as("field"), col("p_type").as("value")),
          struct(lit("size").as("field"),
            col("p_size").cast("string").as("value")))).as("fv"))
        .select(col("p_name"), col("fv.field"), col("fv.value"))
      val reps = vals.groupBy(col("p_name"), col("field"))
        .agg(min(col("value")).as("rep"))
      val pairs = candidatePairs.run(s, dir)
      val w = fsWeights.run(s, dir)
        .select(col("field"), col("w_agree"), col("w_disagree"))
      val pf = pairs
        .join(reps.select(col("p_name").as("name_a"), col("field"),
          col("rep").as("rep_a")), Seq("name_a"))
        .join(reps.select(col("p_name").as("nb"),
          col("field").as("field_b"), col("rep").as("rep_b")),
          col("name_b") === col("nb") && col("field") === col("field_b"))
        .drop("nb", "field_b")
        .withColumn("agree", col("rep_a") === col("rep_b"))
      val scored = pf.join(broadcast(w), "field")
        .withColumn("wq",
          when(col("agree"), col("w_agree")).otherwise(col("w_disagree"))
            .cast("decimal(18,12)"))
        .groupBy(col("name_a"), col("name_b"), col("dist"))
        .agg(
          sum(when(col("agree"), 1L).otherwise(0L)).as("n_agree"),
          sum(col("wq")).cast("double").as("score"))
      scored.withColumn("queue_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("score").desc, col("name_a"), col("name_b"))))
    },
    Some(s"""
      WITH names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS block FROM part),
      pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM names a JOIN names b USING (block)
        WHERE a.p_name < b.p_name
          AND levenshtein(a.p_name, b.p_name) <= $MaxEdits),
      vals AS (
        SELECT p_name, 'brand' AS field, p_brand AS value FROM part
        UNION ALL SELECT p_name, 'type', p_type FROM part
        UNION ALL SELECT p_name, 'size', CAST(p_size AS VARCHAR) FROM part),
      reps AS (SELECT p_name, field, MIN(value) AS rep FROM vals GROUP BY 1, 2),
      up AS (
        SELECT field, CAST(SUM(c*(c-1)//2) AS BIGINT) AS u_pairs
        FROM (SELECT field, value, COUNT(*) AS c FROM vals GROUP BY 1, 2)
        GROUP BY 1),
      mp AS (
        SELECT field, CAST(SUM(c*(c-1)//2) AS BIGINT) AS m_pairs
        FROM (SELECT field, p_name, value, COUNT(*) AS c
              FROM vals GROUP BY 1, 2, 3)
        GROUP BY 1),
      denom AS (
        SELECT CAST(SUM(c)*(SUM(c)-1)//2 AS BIGINT) AS total_pairs,
               CAST(SUM(c*(c-1)//2) AS BIGINT) AS match_pairs
        FROM (SELECT COUNT(*) AS c FROM part GROUP BY p_name)),
      w AS (
        SELECT field,
               log2((CAST(m_pairs AS DOUBLE) / match_pairs)
                    / (CAST(u_pairs AS DOUBLE) / total_pairs)) AS w_agree,
               log2((1.0 - CAST(m_pairs AS DOUBLE) / match_pairs)
                    / (1.0 - CAST(u_pairs AS DOUBLE) / total_pairs))
                 AS w_disagree
        FROM up JOIN mp USING (field), denom),
      pf AS (
        SELECT p.name_a, p.name_b, p.dist, ra.field,
               (ra.rep = rb.rep) AS agree
        FROM pairs p
        JOIN reps ra ON ra.p_name = p.name_a
        JOIN reps rb ON rb.p_name = p.name_b AND rb.field = ra.field),
      scored AS (
        SELECT name_a, name_b, dist,
               CAST(SUM(CASE WHEN agree THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_agree,
               CAST(SUM(CAST(CASE WHEN agree THEN w_agree ELSE w_disagree END
                             AS DECIMAL(18,12))) AS DOUBLE) AS score
        FROM pf JOIN w USING (field) GROUP BY 1, 2, 3)
      SELECT name_a, name_b, dist, n_agree, score,
             row_number() OVER (ORDER BY score DESC, name_a, name_b)
               AS queue_rank
      FROM scored"""))

  override def queries: Seq[GQuery] =
    Seq(candidatePairs, entityClusters, goldenRecords, resolvedRevenue,
      blockingQuality, fsWeights, reviewQueue)
}
