package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact COUNT-window semantics for streams — the reference's
  * `Flow<T>.windowed(size, step)` / `chunked(size)` family
  * (`es-core/.../flow/Extensions.kt:179`, `:70`), which Spark's time-based
  * `window()` cannot express (SURVEY §2.7 W1: "If exact count semantics
  * needed: `flatMapGroupsWithState` with a counter").
  *
  * Design:
  *   - state is per key (`KeyValueGroupedDataset` → one state object per
  *     group): the distributed generalization of the reference's single
  *     global buffer. At 100 TB the keys shard the state store across
  *     executors; a single global window would serialize the stream.
  *   - heights arrive in ascending micro-batch offset ranges from the
  *     blockfeed connector, but WITHIN a micro-batch the group iterator
  *     order is shuffle-dependent — so the buffer is sorted before chunking,
  *     which (unique, monotone heights) makes emitted batches exactly the
  *     globally-sorted tumbling chunks: deterministic and restart-stable.
  *   - full chunks emit immediately (Append mode); the trailing partial
  *     chunk stays buffered, the reference's `partialWindows=false` default.
  *     (The reference's idle-`timeout` force-flush maps to
  *     `GroupStateTimeout.ProcessingTimeTimeout` + `state.hasTimedOut`; not
  *     enabled here because bounded fixture streams end before wall-clock
  *     timeouts can fire deterministically.)
  */
object CountWindows {

  final case class KeyedHeight(key: String, height: Long)
  final case class CountBatch(
      key: String, batchIndex: Long, n: Int,
      minHeight: Long, maxHeight: Long)
  /** (next batch index to emit, buffered heights not yet chunked) */
  final case class BufferState(nextIndex: Long, buffered: Seq[Long])

  /** Tumbling count batches of `size` per key (W2 `chunked`; W1 `windowed`
    * with step == size).
    */
  def countBatches(ds: Dataset[KeyedHeight], size: Int): Dataset[CountBatch] = {
    implicit val stateEnc: Encoder[BufferState] = Encoders.product[BufferState]
    implicit val outEnc: Encoder[CountBatch] = Encoders.product[CountBatch]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedHeight], state: GroupState[BufferState]) =>
          val prev = state.getOption.getOrElse(BufferState(0L, Nil))
          val buf = (prev.buffered ++ rows.map(_.height)).sorted
          val nFull = buf.length / size
          val out = (0 until nFull).map { i =>
            val chunk = buf.slice(i * size, (i + 1) * size)
            CountBatch(key, prev.nextIndex + i, chunk.length, chunk.head, chunk.last)
          }
          state.update(BufferState(prev.nextIndex + nFull, buf.drop(nFull * size)))
          out.iterator
      }
  }

  /** Convenience: blockfeed raw rows → per-chain tumbling count batches. */
  def blockCountBatches(spark: SparkSession, raw: Dataset[org.apache.spark.sql.Row],
                        size: Int): Dataset[CountBatch] = {
    import spark.implicits._
    countBatches(
      raw.select("chain_id", "height").as[(String, Long)]
        .map { case (k, h) => KeyedHeight(k, h) },
      size)
  }
}
