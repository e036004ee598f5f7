package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF coarse quantizer learned with Lloyd iterations — DataFrame plans for
  * everything corpus-sized (no RDDs, no randomness):
  *
  *   - init: centroids = the first k vectors by `vec_id` (deterministic);
  *   - assign: ONE codegen'd projection — the k-way argmin unrolled over
  *     centroid literals (see [[assign]]) — no row explosion, no exchange,
  *     no sort anywhere in the O(n·k) hot loop. Centroid coordinates are
  *     RE-QUANTIZED to the same 1e4 integer scale as the vectors so the
  *     inner product runs through the codegen'd [[TextHash.dotQ]] — no
  *     interpreted HOF lambdas;
  *   - update: `posexplode` the assigned vectors, per-(cell, dim) exact
  *     integer sums over the quantized coordinates → means. Sums of longs
  *     are exact ⇒ centroids are bit-deterministic across runs and
  *     partitionings (unlike naive double accumulation).
  *
  * The k×dims centroid matrix is MODEL STATE, not data: each iteration
  * materializes it to the driver (a few KB) and re-broadcasts, so the
  * lineage stays one-scan-per-iteration instead of exponentially nesting.
  * At 100 TB: per iteration one corpus scan + one (cell, dim)-key shuffle
  * of k·dims aggregate rows; assignment itself is shuffle-free.
  */
object IvfIndex {

  /** Nearest-centroid assignment: adds `cell` to vectors carrying
    * (vec_id, qv, qnorm). `centroids`: (cell, cq: array<bigint>, cnorm).
    *
    * r14 shape (guide §2.4 "remove shuffles outright"): the model is
    * KB-scale driver state (k ≤ 8 centroids — the same scale
    * [[materialize]] already collects every Lloyd step), so the argmin
    * unrolls into ONE codegen'd projection — k [[TextHash.dotQ]] terms
    * against centroid array literals folded through `greatest(struct(cos,
    * -cell))` — instead of the r9–r13 crossJoin(broadcast) → n·k rows →
    * corpus-wide (vec_id)-exchange → sort → rank-1 filter. Assignment is
    * now genuinely shuffle-free at any corpus size, and each Lloyd
    * iteration drops its row explosion and its exchange. Tie-breaking is
    * bit-identical: `greatest` and the old `ORDER BY _cos DESC, cell`
    * both use Spark's total ordering on doubles (NaN greatest), and the
    * negated cell makes the struct max prefer the smallest cell on ties.
    *
    * NB EAGER in `centroids`: the model is collected AT CALL TIME (it is
    * KB-scale by contract), so the returned plan snapshots the model —
    * callers must pass a finished model, not a plan they intend to mutate.
    */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(
        col("cell").cast("int"), col("cq"),
        col("cnorm").cast("double")).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1), r.getDouble(2)))
      .sortBy(_._1)
    // degenerate-model contract parity with the r9–r13 join shape: an
    // empty model assigned NO vector a cell (crossJoin with an empty
    // broadcast side), so an empty result — never a throw, never nulls
    if (cents.isEmpty)
      return vectors.withColumn("cell", lit(null).cast("int")).limit(0)
    val scored = cents.map { case (cell, cq, cnorm) =>
      struct(
        (TextHash.dotQ(col("qv"), typedLit(cq)).cast("double") /
          (col("qnorm") * lit(cnorm))).as("c"),
        lit(-cell).as("negCell"))
    }
    val best =
      if (scored.length == 1) scored.head else greatest(scored: _*)
    vectors.withColumn("cell", -best.getField("negCell"))
  }

  private def withNorms(centroids: DataFrame): DataFrame =
    centroids.withColumn("cnorm",
      sqrt(TextHash.dotQ(col("cq"), col("cq")).cast("double")))

  /** Materialize the (tiny) centroid model and rebuild it as a fresh local
    * relation, cutting the Lloyd lineage per iteration.
    *
    * r15: a LocalRelation (createDataFrame over the collected rows), not a
    * parallelize(rows, 1) RDD — the model is consumed by collect()s (every
    * [[assign]] call) and broadcast builds, and over a LocalRelation both
    * run driver-local with NO Spark job, where the RDD shape paid one
    * scheduler round-trip per consumption (measured: several jobs per sim*
    * query, each a full driver latency on small scale factors).
    */
  private def materialize(spark: SparkSession, centroids: DataFrame): DataFrame = {
    val cols = centroids.select("cell", "cq")
    val rows = java.util.Arrays.asList(cols.collect(): _*)
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(cols.schema.fields))
  }

  /** `iters` Lloyd steps from the deterministic init; returns the corpus
    * with its final `cell` column. `vectors` must carry (vec_id, qv) with
    * qv = quantized BIGINT coordinates ([[TextHash.quantize]]). Centroid
    * means are re-quantized (`round(mean · 1e4)` per coordinate, exact
    * rational → long) so assignment distances stay integer-exact.
    */
  def fit(spark: SparkSession, vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = vectors
      .withColumn("qnorm",
        sqrt(TextHash.dotQ(col("qv"), col("qv")).cast("double")))
      .persist() // scanned once per Lloyd iteration + once for final assign
    assign(v, withNorms(fitCentroids(spark, v, k, iters))).drop("qnorm")
  }

  /** Assignment against an ALREADY-FITTED model — for queries that need
    * both the corpus cells and the raw centroids (e.g. multiprobe), so the
    * Lloyd fit runs once instead of once per consumer. `centroids` is the
    * (cell, cq) relation [[fitCentroids]] returns.
    */
  def assignWith(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assign(
      vectors.withColumn("qnorm",
        sqrt(TextHash.dotQ(col("qv"), col("qv")).cast("double"))),
      withNorms(centroids)).drop("qnorm")

  /** The trained model alone: (cell, cq) after `iters` Lloyd steps — what a
    * deployment persists, and what the DuckDB oracle re-derives assignment
    * from (bit-deterministic: exact integer sums, fixed init, so a re-fit
    * reproduces the dumped model exactly). `v` must carry (vec_id, qv,
    * qnorm).
    */
  def fitCentroids(spark: SparkSession, v: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = materialize(spark, v.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"),
        // init centroids are the vectors themselves: already at 1e4 scale,
        // re-quantizing to mean·1e4 means scaling by another 1e4
        transform(col("qv"), x => x * 10000L).as("cq")))
    for (_ <- 0 until iters) {
      centroids = materialize(spark,
        assign(v, withNorms(centroids))
          .select(col("cell"), posexplode(col("qv")).as(Seq("d", "x")))
          .groupBy(col("cell"), col("d"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n")) // exact long sums
          .groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("d"), col("s"), col("n")))).as("a"))
          .select(col("cell"),
            // mean·1e4 = s·1e4 / n, rounded — exact integer rational math
            transform(col("a"), e =>
              round(e("s").cast("double") * 10000.0d / e("n").cast("double"))
                .cast("long")).as("cq")))
    }
    centroids
  }
}
