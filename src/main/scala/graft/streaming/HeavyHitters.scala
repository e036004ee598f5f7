package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online heavy-hitters (frequent keys) over an unbounded stream: the
  * SpaceSaving summary (Metwally et al., "Efficient computation of frequent
  * and top-k elements in data streams") maintained per state shard with
  * `flatMapGroupsWithState`.
  *
  * Scale shape: the KEY SPACE is hash-sharded, so each key lives in exactly
  * one shard's summary — state is `shards × capacity` counters regardless of
  * stream length or key cardinality (contrast an exact streaming groupBy
  * whose state grows with distinct keys forever). Shards update in parallel
  * across executors; the global answer is the union of the tiny per-shard
  * summaries (no cross-shard merge error, because shards partition rather
  * than replicate the key space).
  *
  * Guarantees (the SpaceSaving theorems, asserted in HeavyHittersSpec):
  *   - every estimate brackets the truth: true ≤ est ≤ true + err;
  *   - err ≤ floor(N_shard / capacity) (N_shard = weight seen by the shard);
  *   - any key with true count > N_shard/capacity is IN the summary;
  *   - with capacity ≥ distinct keys per shard the summary is exact and
  *     chunking-invariant (≡ batch groupBy/count).
  *
  * Determinism: SpaceSaving is arrival-order-dependent, and the group
  * iterator order within a micro-batch is shuffle-dependent — so each
  * invocation first pre-aggregates its micro-batch to key→weight (order
  * free) and applies updates in sorted key order; eviction ties break by
  * (est, key). Result: the summary is a pure function of the micro-batch
  * SEQUENCE, and of nothing else.
  */
object HeavyHitters {

  /** One weighted key occurrence, pre-assigned to a state shard (use
    * [[shardOf]] so batch and stream agree).
    */
  final case class KeyOcc(shard: Int, key: String, w: Long)

  final case class HHEntry(key: String, est: Long, err: Long)

  /** `tick` counts invocations so a consumer can select each shard's most
    * recent snapshot from the appended emissions; `n` is the total weight
    * the shard has absorbed (the N_shard of the error bound).
    */
  final case class HHState(tick: Long, n: Long, counters: Seq[HHEntry])

  final case class HHSnapshot(
      shard: Int, tick: Long, n: Long, key: String, est: Long, err: Long)

  /** Deterministic shard assignment (String.hashCode is JVM-spec-defined). */
  def shardOf(key: String, shards: Int): Int =
    math.floorMod(key.hashCode, shards)

  /** Apply one pre-aggregated batch of (key, weight) to a summary. Pure and
    * deterministic: updates in sorted key order, eviction by (est, key).
    */
  private[streaming] def update(
      counters: Map[String, (Long, Long)],
      batch: Seq[(String, Long)],
      capacity: Int): Map[String, (Long, Long)] = {
    val m = scala.collection.mutable.Map(counters.toSeq: _*)
    batch.sortBy(_._1).foreach { case (k, w) =>
      m.get(k) match {
        case Some((est, err)) => m(k) = (est + w, err)
        case None if m.size < capacity => m(k) = (w, 0L)
        case None =>
          val (mk, (mEst, _)) =
            m.minBy { case (key, (est, _)) => (est, key) }
          m.remove(mk)
          m(k) = (mEst + w, mEst)
      }
    }
    m.toMap
  }

  /** Maintain per-shard SpaceSaving summaries; each trigger appends the
    * shard's full current snapshot tagged with its invocation tick.
    */
  def summarize(ds: Dataset[KeyOcc], capacity: Int): Dataset[HHSnapshot] = {
    require(capacity > 0, "capacity must be positive")
    implicit val stateEnc: Encoder[HHState] = Encoders.product[HHState]
    implicit val outEnc: Encoder[HHSnapshot] = Encoders.product[HHSnapshot]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    ds.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[KeyOcc], state: GroupState[HHState]) =>
          val prev = state.getOption.getOrElse(HHState(0L, 0L, Nil))
          val batch = rows.toSeq.groupBy(_.key)
            .map { case (k, os) => k -> os.map(_.w).sum }.toSeq
          val counters = update(
            prev.counters.map(e => e.key -> (e.est, e.err)).toMap,
            batch, capacity)
          val next = HHState(
            prev.tick + 1,
            prev.n + batch.map(_._2).sum,
            counters.toSeq.sortBy(_._1)
              .map { case (k, (est, err)) => HHEntry(k, est, err) })
          state.update(next)
          next.counters.iterator.map(e =>
            HHSnapshot(shard, next.tick, next.n, e.key, e.est, e.err))
      }
  }
}
