package graft

import graft.streaming.StreamingKmv
import graft.streaming.StreamingKmv.{KmvOcc, KmvSnapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV quantiles: ≤ k rows of state per group, snapshots
  * bit-identical to the batch sk1 query over the same rows,
  * chunking-invariant (bottom-k membership is per-row, order-free).
  */
class StreamingKmvSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("skmv-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def occs(): Seq[KmvOcc] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect().toSeq
      .map { case (t, id, v) => KmvOcc(t, id, v) }
  }

  /** Run in `chunks` micro-batches; return each group's final snapshots
    * keyed by (group, pPct).
    */
  private def run(data: Seq[KmvOcc], chunks: Int, name: String): Map[(String, Int), KmvSnapshot] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KmvOcc]
    val q = StreamingKmv(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val size = math.max(1, (data.length + chunks - 1) / chunks)
      data.grouped(size).foreach { c => stream.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val snaps = spark.table(name).as[KmvSnapshot].collect()
    snaps.groupBy(s => (s.group, s.pPct)).map { case (k, rows) =>
      k -> rows.maxBy(_.tick)
    }
  }

  test("streamed sample reproduces the batch sk1 quantiles bit-for-bit") {
    val batch = graft.queries.Sketches.kmvQuantiles.run(spark, dir)
      .select("event_type", "p_pct", "n_sample", "est_value")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val streamed = run(occs(), chunks = 5, name = "skmv_vs_batch")
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, s) =>
      assert((s.nSample, s.estValue) == batch(k),
        s"$k: streamed (${s.nSample},${s.estValue}) vs batch ${batch(k)}")
    }
  }

  test("chunking invariance and bounded state accounting") {
    val data = occs()
    val one = run(data, chunks = 1, name = "skmv_one")
    val many = run(data, chunks = 11, name = "skmv_many")
    assert(one.keySet == many.keySet)
    one.foreach { case (k, s) =>
      val m = many(k)
      assert((s.nSample, s.estValue) == (m.nSample, m.estValue))
      assert(s.n == m.n && s.n == data.count(_.group == k._1))
      assert(s.nSample <= StreamingKmv.K)
    }
  }
}
