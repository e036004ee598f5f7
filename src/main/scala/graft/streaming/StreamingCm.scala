package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online frequency sketch: the sk2 Count-Min counters
  * (queries/Sketches.scala) maintained as `flatMapGroupsWithState` state —
  * one state group per hash row, d·w = 4×256 Long counters total,
  * regardless of stream length or key cardinality. Counter increments are
  * ADDITIVE — commutative and associative — so like StreamingHll (and
  * unlike SpaceSaving's arrival-order-sensitive evictions in HeavyHitters)
  * no pre-aggregation or ordered replay is needed: any chunking or replay
  * of the same rows yields the same counters, and counters from
  * independent jobs merge by plain addition (a CRDT counter grid).
  *
  * The hash constants are sk2's, so a snapshot of this state IS the batch
  * sk2 `cm` relation over the rows seen — StreamingCmSpec pins the
  * bit-identity, which makes the batch query's probe/estimate stage
  * directly reusable against streamed state.
  *
  * Where HeavyHitters answers "which keys are frequent" (SpaceSaving
  * tracks IDENTITIES), this answers "how frequent is key X" for any later
  * probe — frequency upper bounds with ε = e/w at δ = e^−d — in constant
  * state. The two summaries are complementary; production streams often
  * keep both.
  */
object StreamingCm {

  final case class CmOcc(key: Long)

  /** One increment routed to hash row `i`, bucket `bucket`. */
  final case class CmInc(i: Int, bucket: Int, w: Long)

  final case class CmState(tick: Long, n: Long, counters: Array[Long])

  final case class CmSnapshot(i: Int, tick: Long, n: Long, bucket: Int, cnt: Long)

  val W = 256

  /** sk2's hash rows — keep in lock-step with Sketches.CmRows. */
  val Rows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (22695477L, 1L),
    (1664525L, 1013904223L), (69069L, 362437L))

  def bucket(i: Int, key: Long): Int = {
    val (a, b) = Rows(i)
    (((key * a + b) % 2147483647L) % W).toInt
  }

  /** Route one key occurrence to its d increments (call site fans out). */
  def increments(key: Long): Seq[CmInc] =
    Rows.indices.map(i => CmInc(i, bucket(i, key), 1L))

  /** Absorb a micro-batch of increments for one hash row; append the
    * CHANGED buckets' counters (emission volume scales with touched
    * buckets ≤ w, not stream size).
    */
  def updateGroup(
      row: Int,
      incs: Iterator[CmInc],
      state: GroupState[CmState]): Iterator[CmSnapshot] = {
    val st = state.getOption.getOrElse(CmState(0L, 0L, new Array[Long](W)))
    val counters = st.counters.clone()
    var n = st.n
    val touched = scala.collection.mutable.SortedSet.empty[Int]
    incs.foreach { inc =>
      counters(inc.bucket) += inc.w
      n += inc.w
      touched += inc.bucket
    }
    val next = CmState(st.tick + 1, n, counters)
    state.update(next)
    touched.iterator.map(b => CmSnapshot(row, next.tick, n, b, counters(b)))
  }

  def apply(occs: Dataset[CmOcc]): Dataset[CmSnapshot] = {
    import occs.sparkSession.implicits._
    implicit val stateEnc: Encoder[CmState] = Encoders.product[CmState]
    occs.flatMap(o => increments(o.key))
      .groupByKey(_.i)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateGroup)
  }
}
