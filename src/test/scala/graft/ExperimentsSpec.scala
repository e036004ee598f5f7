package graft

import java.math.BigDecimal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAb

/** The experiment pack checked two independent ways beyond the DuckDB gate:
  * an in-memory Scala reference model over the collected per-user metrics
  * (sf0.001 is small enough to fold by hand), and the streamed readout
  * converging to exactly the batch ab1 rows under chunked arrival.
  */
class ExperimentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("ab-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  /** Per-user (variant, metric) pairs computed by the reference model:
    * plain Scala over collected events, BigDecimal accumulation.
    */
  private def refUsers(): Map[Long, (Long, BigDecimal)] = {
    import spark.implicits._
    val rows = Tables.load(spark, dir, "events")
      .filter($"ts" >= lit("2024-01-16 00:00:00"))
      .select($"user_id", $"value").as[(Long, Double)].collect()
    rows.groupBy(_._1).map { case (uid, vs) =>
      val variant =
        if (java.lang.Long.remainderUnsigned(uid * 2654435761L, 4294967296L)
          >= 2147483648L) 1L else 0L
      val m = vs.map { case (_, v) =>
        new BigDecimal(v).setScale(6, java.math.RoundingMode.HALF_UP)
      }.foldLeft(BigDecimal.ZERO)(_.add(_))
      uid -> (variant, m)
    }
  }

  test("ab1 means/variances match the in-memory reference model") {
    import spark.implicits._
    val ref = refUsers().values.groupBy(_._1).map { case (variant, ms) =>
      val xs = ms.map(_._2.doubleValue()).toSeq
      val n = xs.size.toDouble
      val mean = xs.sum / n
      val v = (n * xs.map(x => x * x).sum - math.pow(xs.sum, 2)) / (n * (n - 1))
      variant -> (xs.size.toLong, mean, v)
    }
    val got = queries.Experiments.variantMetrics.run(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === 2)
    got.foreach { case (variant, n, mean, varM) =>
      val (rn, rMean, rVar) = ref(variant)
      assert(n === rn, s"variant $variant user count")
      assert(math.abs(mean - rMean) <= 1e-9 * math.abs(rMean),
        s"variant $variant mean: got $mean ref $rMean")
      assert(math.abs(varM - rVar) <= 1e-6 * math.abs(rVar),
        s"variant $variant variance: got $varM ref $rVar")
    }
  }

  test("ab3 SRM chi2 is consistent with the reference counts and un-flagged") {
    import spark.implicits._
    val refCounts = refUsers().values.groupBy(_._1).view.mapValues(_.size)
    // every user with ANY event in the window is in refUsers; ab3 counts all
    // distinct users over the whole table — recompute on the full id set
    val allUsers = Tables.load(spark, dir, "events")
      .select($"user_id").distinct().as[Long].collect()
    val nB = allUsers.count(uid =>
      java.lang.Long.remainderUnsigned(uid * 2654435761L, 4294967296L)
        >= 2147483648L)
    val nA = allUsers.length - nB
    val (gotA, gotB, chi2, flag) = queries.Experiments.srmCheck.run(spark, dir)
      .as[(Long, Long, Double, Boolean)].head()
    assert((gotA, gotB) === (nA.toLong, nB.toLong))
    val exp = (nA + nB) / 2.0
    val refChi2 = (math.pow(nA - exp, 2) + math.pow(nB - exp, 2)) / exp
    assert(math.abs(chi2 - refChi2) <= 1e-9)
    // the Knuth top-bit split is near-50/50 on this generator's id space
    assert(!flag, s"SRM flagged on a designed 50/50 split: chi2=$chi2")
    assert(refCounts.values.sum <= allUsers.length)
  }

  test("streamed per-variant moments == batch ab1 under chunked arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = queries.Experiments.variantMetrics // batch rows for compare
      .run(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSet
    // per-user metric rows from the SAME engine expressions the batch pack
    // uses (string-carried decimals), so the streamed fold sees bit-equal
    // inputs and the Set compare below can demand exact equality
    val userRows = Tables.load(spark, dir, "events")
      .filter($"ts" >= lit("2024-01-16 00:00:00"))
      .groupBy($"user_id")
      .agg(sum($"value".cast("decimal(18,6)"))
        .cast("decimal(18,6)").cast("string").as("m_str"))
      .withColumn("variant",
        when(($"user_id" * 2654435761L) % 4294967296L >= 2147483648L, 1L)
          .otherwise(0L))
      .select($"variant", $"m_str").as[(Long, String)].collect().toSeq
    val feed = MemoryStream[(Long, String)]
    val streamed = StreamingAb.moments(
      feed.toDF.toDF("variant", "m_str")
        .withColumn("m", col("m_str").cast("decimal(18,6)")))
    val q = streamed.writeStream.format("memory").queryName("sab")
      .outputMode("complete").start()
    try {
      userRows.grouped(37).foreach { c =>
        feed.addData(c: _*); q.processAllAvailable()
      }
      val got = spark.table("sab")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(got === users,
        s"streamed readout diverged:\n stream=$got\n batch=$users")
    } finally q.stop()
  }
  test("ab5: required n shrinks quartically-ish in MDE; powered is consistent") {
    val rows = queries.Experiments.powerAnalysis.run(spark, dir)
      .select("mde_pct", "required_n_per_arm", "current_n_min", "powered")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(1L, 2L, 5L, 10L)))
    // n ∝ 1/δ²: doubling the MDE must cut required n by ~4 (ceil slack)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 < lo._2, s"required n must fall as MDE grows: $lo -> $hi")
    }
    val r1 = rows(0)._2.toDouble; val r2 = rows(1)._2.toDouble
    assert(r1 / r2 > 3.9 && r1 / r2 < 4.1, s"1%→2% ratio ${r1 / r2} not ~4")
    rows.foreach { r =>
      assert(r._4 === (r._3 >= r._2), s"powered flag inconsistent: $r")
    }
  }
}
