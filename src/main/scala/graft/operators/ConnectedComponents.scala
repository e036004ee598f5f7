package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step
  * that turns pairwise near-duplicate CANDIDATES (LSH/Jaccard pairs) into
  * dedup CLUSTERS: similarity is not transitive, so "drop the larger id of
  * every pair" under- or over-keeps on chains; keep-one-per-component is the
  * standard web-scale policy.
  *
  * Algorithm: hash-min label propagation. Every vertex starts labeled with
  * itself; each round, every vertex takes the min label among itself and its
  * neighbors; fixpoint = every vertex carries its component's min vertex id.
  * Each round is ONE shuffle join (edges x labels) + ONE aggregation —
  * all declarative DataFrame ops, so Catalyst/AQE handle partitioning and
  * skew. Rounds needed = graph diameter; near-dup graphs are
  * clique-ish (diameter a few hops), so this converges in 2-4 rounds at any
  * corpus size. (For adversarially long path graphs the two-hop
  * "large-star/small-star" variant of Kiveris et al. converges in
  * O(log n) rounds — same per-round plan shape, the swap is local to this
  * file.)
  *
  * The per-round `localCheckpoint` truncates the logical plan, keeping
  * planning O(1) per round instead of O(rounds) lineage growth; convergence
  * is detected from the label-change count of the SAME materialized result
  * (no second job).
  *
  * Deterministic: min-label over deterministic inputs.
  */
object ConnectedComponents {

  /** [[run]]'s output with a `component_size` column — the shared r14
    * idiom (dd7/dd16/er2): size = count window over the component key, one
    * node-sized exchange, never aggregate + join-back.
    */
  def runWithSize(
      edges: DataFrame,
      src: String,
      dst: String,
      maxRounds: Int = 25): DataFrame =
    run(edges, src, dst, maxRounds).withColumn("component_size",
      count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))

  /** @param edges undirected edge list (both orientations are derived)
    * @param src   source vertex column (integral id)
    * @param dst   destination vertex column
    * @param maxRounds safety cap on propagation rounds
    * @return (vertex, component): one row per distinct vertex appearing in
    *         any edge; component = min vertex id in its component
    */
  def run(
      edges: DataFrame,
      src: String,
      dst: String,
      maxRounds: Int = 25): DataFrame = {
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
    // The edge list is STATIC across rounds, so it gets repartition+persist
    // (the g1 edge-cache shape): InMemoryRelation reports the hash
    // partitioning, so every round's edges⋈labels join leaves the cached
    // side in place and only the node-sized label relation moves.
    // localCheckpoint would NOT work here — checkpointed plans scan an
    // ExistingRDD with no outputPartitioning and re-exchange every round
    // (verified empirically; only the iterating labels relation, whose
    // LINEAGE is the problem, needs checkpointing).
    val und = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist()

    var labels = und.select(col("src").as("vertex"))
      .distinct()
      .withColumn("component", col("vertex"))
      .localCheckpoint(true)

    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // messages: each vertex's current label, sent over every edge. The
      // vertex's own row is tagged `self` so the SAME aggregation yields
      // both the new label (min over self+neighbors) and the previous one
      // (the self row's) — convergence then reads off the materialized
      // result with a cache-local scan, no join, no extra shuffle.
      val msgs = und
        .join(labels, und("src") === labels("vertex"))
        .select(col("dst").as("vertex"), col("component"), lit(0).as("self"))
      val next = labels.withColumn("self", lit(1)).union(msgs)
        .groupBy("vertex").agg(
          min("component").as("component"),
          max(when(col("self") === 1, col("component"))).as("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("component") =!= col("prev")).count()
      labels = next.drop("prev")
      round += 1
    }
    labels
  }
}
