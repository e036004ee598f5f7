package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the batched decode kernel (mapPartitions over typed
  * rows — the mapInPandas shape) must agree bit-for-bit with its
  * Column-expression twin, which the DuckDB oracle checks independently.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Session.get("multimodal-spec")
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def media = Media.fromDocuments(Tables.load(spark, sf, "documents"))

  test("decode kernel (mapPartitions) == expression twin, all rows") {
    val kernel = Media.decodeFeatures(media)
      .toDF("media_id", "k_features")
    val expr = media.select(
      col("media_id"),
      Media.featureExprs(col("content").cast("string")).as("e_features"))
    val joined = kernel.join(expr, "media_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("k_features") =!= col("e_features")).count() == 0)
  }

  test("binary content round-trips to the source text") {
    val docs = Tables.load(spark, sf, "documents")
    val bad = Media.fromDocuments(docs)
      .join(docs, col("media_id") === col("doc_id"))
      .filter(col("content").cast("string") =!= col("text"))
    assert(bad.count() == 0)
  }

  test("kernel preserves partitioning (no shuffle at the decode boundary)") {
    val m = media.repartition(7)
    assert(Media.decodeFeatures(m).rdd.getNumPartitions == 7)
  }

  test("frame sampling covers n_frames at step=1 and respects bounds") {
    val full = media.select(
      col("media_id"),
      col("meta.n_frames").as("n_frames"),
      size(Media.sampleFrames(col("content").cast("string"), 1, 10000)).as("sampled"))
    // step=1 with a huge cap samples exactly every frame
    assert(full.filter(col("sampled") =!= col("n_frames")).count() == 0)
  }

  test("resize pads short vectors with zeros and truncates long ones") {
    val df = spark.sql("SELECT array(1L, 2L, 3L) AS v")
    val out = df.select(
      Media.resizeFeatures(col("v"), 5).as("pad"),
      Media.resizeFeatures(col("v"), 2).as("cut")).head()
    assert(out.getSeq[Long](0) == Seq(1L, 2L, 3L, 0L, 0L))
    assert(out.getSeq[Long](1) == Seq(1L, 2L))
  }
}
