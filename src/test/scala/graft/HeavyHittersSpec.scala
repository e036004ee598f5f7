package graft

import graft.streaming.HeavyHitters
import graft.streaming.HeavyHitters.{KeyOcc, HHSnapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online heavy-hitters: the sharded SpaceSaving summary obeys its paper
  * guarantees on real event data, and in the exact regime (capacity ≥
  * distinct keys per shard) reproduces the batch groupBy counts under any
  * micro-batch chunking.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("hh-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"
  private val Shards = 4

  /** user_id occurrences from the events table, shard-assigned. */
  private def occs(): Seq[KeyOcc] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("user_id").cast("string"))
      .as[String].collect().toSeq
      .map(k => KeyOcc(HeavyHitters.shardOf(k, Shards), k, 1L))
  }

  /** Run the stream in `chunks` micro-batches, return each shard's LAST
    * snapshot (max tick) as (key -> (est, err)) plus per-shard N.
    */
  private def run(data: Seq[KeyOcc], chunks: Int, capacity: Int,
      name: String): (Map[String, (Long, Long)], Map[Int, Long]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KeyOcc]
    val q = HeavyHitters.summarize(stream.toDS(), capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val size = math.max(1, (data.length + chunks - 1) / chunks)
      data.grouped(size).foreach { c => stream.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val snaps = spark.table(name).as[HHSnapshot].collect()
    val last = snaps.groupBy(_.shard).toSeq.flatMap { case (_, rows) =>
      val maxTick = rows.map(_.tick).max
      rows.filter(_.tick == maxTick).toSeq
    }
    (last.map(s => s.key -> (s.est, s.err)).toMap,
      last.groupBy(_.shard).map { case (sh, rows) => sh -> rows.head.n })
  }

  test("exact regime: streamed summary == batch counts, chunking-invariant") {
    val data = occs()
    val truth = data.groupBy(_.key).map { case (k, os) => k -> os.size.toLong }
    // capacity generously above distinct-keys-per-shard => exact
    val cap = truth.size
    val (twoChunks, _) = run(data, 2, cap, "hh_exact_2")
    val (sevenChunks, _) = run(data, 7, cap, "hh_exact_7")
    assert(twoChunks.map { case (k, (est, _)) => k -> est } === truth)
    assert(sevenChunks === twoChunks, "summary depends on chunking in exact regime")
    assert(twoChunks.values.forall(_._2 == 0L), "exact regime must have zero error")
  }

  test("constrained regime: SpaceSaving bounds hold; heavy keys never evicted") {
    val data = occs()
    val truth = data.groupBy(_.key).map { case (k, os) => k -> os.size.toLong }
    val cap = 8 // far below distinct keys per shard
    val (summary, shardN) = run(data, 5, cap, "hh_tight")
    // per-shard truth and N
    val shardOfKey = truth.keys.map(k => k -> HeavyHitters.shardOf(k, Shards)).toMap
    summary.foreach { case (k, (est, err)) =>
      val t = truth(k)
      assert(t <= est, s"estimate below truth for $k: est=$est true=$t")
      assert(est <= t + err, s"error bound violated for $k: est=$est true=$t err=$err")
      assert(err <= shardN(shardOfKey(k)) / cap,
        s"err exceeds N/m for $k: err=$err N=${shardN(shardOfKey(k))} m=$cap")
    }
    // every key heavier than N_shard/capacity must be present
    truth.foreach { case (k, t) =>
      if (t > shardN(shardOfKey(k)) / cap)
        assert(summary.contains(k), s"heavy key $k (count $t) missing from summary")
    }
    // state is bounded: at most capacity entries per shard
    summary.groupBy { case (k, _) => shardOfKey(k) }.foreach { case (sh, m) =>
      assert(m.size <= cap, s"shard $sh summary exceeded capacity: ${m.size}")
    }
  }
}
