package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** [[IntervalJoin]] must return EXACTLY the naive overlap join's pairs —
  * banding is a physical rewrite, not an approximation — across bucket
  * widths much smaller and much larger than the interval spans, on
  * adversarial randomized intervals (zero-length, bucket-straddling,
  * far-apart, nested).
  */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    Session.builder("ivjoin-test").getOrCreate()

  test("banded overlap == naive overlap at any bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // intervals cluster around a few epochs so real overlaps exist;
    // spans range from 0 (instants) to 10x the smaller bucket width
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val base = rnd.nextInt(5) * 100000L + rnd.nextInt(2000)
      val span = if (rnd.nextBoolean()) rnd.nextInt(10000).toLong else 0L
      (rnd.nextInt(3).toLong, s"$tag$i", base, base + span)
    }
    val l = mk(120, "L").toDF("k", "lid", "l_from", "l_to")
    val r = mk(150, "R").toDF("k", "rid", "r_from", "r_to0")
      // half-open right intervals; zero-length [x, x) would match nothing,
      // so widen those to [x, x+1)
      .withColumn("r_to", greatest(col("r_to0") + 1, col("r_from") + 1))
      .drop("r_to0")
    val naive = l.join(r, Seq("k"))
      .filter(col("r_from") <= col("l_to") && col("r_to") > col("l_from"))
      .select("lid", "rid").as[(String, String)].collect().toSet
    for (w <- Seq(500L, 7000L, 1000000L)) {
      val banded = IntervalJoin.overlap(l, r, Seq("k"),
          "l_from", "l_to", "r_from", "r_to", bucketMs = w,
          pairId = Seq("lid", "rid"))
        .select("lid", "rid").as[(String, String)].collect().toSet
      assert(banded == naive,
        s"width $w: missing=${naive.diff(banded).take(5)} " +
          s"extra=${banded.diff(naive).take(5)}")
    }
    assert(naive.nonEmpty, "test data produced no overlaps — not probative")
  }
}
