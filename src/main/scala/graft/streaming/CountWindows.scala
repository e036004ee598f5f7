package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact COUNT-window semantics for streams — the reference's
  * `Flow<T>.windowed(size, step)` / `chunked(size)` family
  * (`es-core/.../flow/Extensions.kt:179`, `:70`), which Spark's time-based
  * `window()` cannot express (SURVEY §2.7 W1: "If exact count semantics
  * needed: `flatMapGroupsWithState` with a counter").
  *
  * Window k covers sorted arrival positions `[k·step, k·step + size)`:
  * overlapping when step < size (sliding), tumbling when step == size
  * (`chunked`), sampling with gaps when step > size — the reference's
  * drop/skip slide algebra (`Extensions.kt:199–205`) expressed positionally.
  *
  * Design:
  *   - state is per key (`KeyValueGroupedDataset` → one state object per
  *     group): the distributed generalization of the reference's single
  *     global buffer. At 100 TB the keys shard the state store across
  *     executors; a single global window would serialize the stream.
  *   - heights arrive in ascending micro-batch offset ranges from the
  *     blockfeed connector, but WITHIN a micro-batch the group iterator
  *     order is shuffle-dependent — so the buffer is sorted before
  *     windowing, which (unique, monotone heights) makes emitted windows
  *     exactly the globally-sorted position slices: deterministic and
  *     restart-stable.
  *   - complete windows emit immediately (Append mode); trailing partial
  *     windows stay buffered, the reference's `partialWindows=false`
  *     default. (The reference's idle-`timeout` force-flush maps to
  *     `GroupStateTimeout.ProcessingTimeTimeout` + `state.hasTimedOut`; not
  *     enabled here because bounded fixture streams end before wall-clock
  *     timeouts can fire deterministically.)
  *   - state size is bounded: elements no future window can reference
  *     (position < nextWindow·step) are dropped eagerly, so the buffer
  *     holds at most ~size + one micro-batch of heights per key.
  */
object CountWindows {

  final case class KeyedHeight(key: String, height: Long)
  final case class CountBatch(
      key: String, batchIndex: Long, n: Int,
      minHeight: Long, maxHeight: Long)
  /** nextWindow = next window index to emit; posOffset = absolute arrival
    * position of `buffered.head`; positions below nextWindow·step are
    * dropped as they arrive (they can be ahead of the arrived data when
    * step > size skips forward).
    */
  final case class BufferState(nextWindow: Long, posOffset: Long, buffered: Seq[Long])

  /** General count windows of `size` sliding by `step` per key (W1). */
  def countWindows(ds: Dataset[KeyedHeight], size: Int, step: Int): Dataset[CountBatch] = {
    require(size > 0 && step > 0, "size and step must be positive")
    implicit val stateEnc: Encoder[BufferState] = Encoders.product[BufferState]
    implicit val outEnc: Encoder[CountBatch] = Encoders.product[CountBatch]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedHeight], state: GroupState[BufferState]) =>
          val prev = state.getOption.getOrElse(BufferState(0L, 0L, Nil))
          var buf = (prev.buffered ++ rows.map(_.height)).sorted
          var off = prev.posOffset
          var k = prev.nextWindow
          // drop positions no window ≥ k can reference
          def dropBelow(target: Long): Unit = {
            val d = math.min(math.max(target - off, 0L), buf.length.toLong).toInt
            if (d > 0) { buf = buf.drop(d); off += d }
          }
          dropBelow(k * step)
          val out = scala.collection.mutable.ArrayBuffer.empty[CountBatch]
          while (off + buf.length >= k * step + size) {
            val start = (k * step - off).toInt // ≥ 0 by the drop invariant
            val chunk = buf.slice(start, start + size)
            out += CountBatch(key, k, chunk.length, chunk.head, chunk.last)
            k += 1
            dropBelow(k * step)
          }
          state.update(BufferState(k, off, buf))
          out.iterator
      }
  }

  /** Tumbling count batches of `size` per key (W2 `chunked`; W1 `windowed`
    * with step == size).
    */
  def countBatches(ds: Dataset[KeyedHeight], size: Int): Dataset[CountBatch] =
    countWindows(ds, size, size)

  /** Convenience: blockfeed raw rows → per-chain count windows. */
  def blockCountBatches(spark: SparkSession, raw: Dataset[org.apache.spark.sql.Row],
                        size: Int, step: Int = 0): Dataset[CountBatch] = {
    import spark.implicits._
    countWindows(
      raw.select("chain_id", "height").as[(String, Long)]
        .map { case (k, h) => KeyedHeight(k, h) },
      size, if (step <= 0) size else step)
  }
}
