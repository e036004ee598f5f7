package graft

import graft.streaming.StreamingCm
import graft.streaming.StreamingCm.{CmOcc, CmSnapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Count-Min: 4×256 Long counters of state total, streamed
  * counters bit-identical to the batch sk2 sketch over the same rows,
  * chunking-invariant (addition is commutative+associative).
  */
class StreamingCmSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("scm-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def occs(): Seq[CmOcc] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(col("user_id")).as[Long].collect().toSeq.map(CmOcc)
  }

  /** Run in `chunks` micro-batches; return final counters keyed by
    * (row, bucket) — each bucket's LAST emission.
    */
  private def run(data: Seq[CmOcc], chunks: Int, name: String): Map[(Int, Int), Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CmOcc]
    val q = StreamingCm(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val size = math.max(1, (data.length + chunks - 1) / chunks)
      data.grouped(size).foreach { c => stream.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val snaps = spark.table(name).as[CmSnapshot].collect()
    snaps.groupBy(s => (s.i, s.bucket)).map { case (k, rows) =>
      k -> rows.maxBy(_.tick).cnt
    }
  }

  private def batchCm(): Map[(Int, Int), Long] =
    occs().flatMap(o => StreamingCm.increments(o.key))
      .groupBy(i => (i.i, i.bucket))
      .map { case (k, is) => k -> is.map(_.w).sum }

  test("streamed counters reproduce the batch sk2 counter grid bit-for-bit") {
    // the batch reference is computed with the SAME hash constants the
    // oracle-gated sk2 query uses (lock-step pinned in StreamingCm.Rows)
    val batch = batchCm()
    val streamed = run(occs(), chunks = 6, name = "scm_vs_batch")
    assert(streamed == batch)
  }

  test("chunking invariance: 1 batch == 9 batches") {
    val data = occs()
    val one = run(data, chunks = 1, name = "scm_one")
    val many = run(data, chunks = 9, name = "scm_many")
    assert(one == many)
  }

  test("probe estimates from streamed counters upper-bound exact counts") {
    val counters = run(occs(), chunks = 4, name = "scm_probe")
    val exact = occs().groupBy(_.key).map { case (k, os) => k -> os.size.toLong }
    exact.foreach { case (k, n) =>
      val est = StreamingCm.Rows.indices
        .map(i => counters.getOrElse((i, StreamingCm.bucket(i, k)), 0L)).min
      assert(est >= n, s"key $k: est $est < exact $n")
    }
  }
}
