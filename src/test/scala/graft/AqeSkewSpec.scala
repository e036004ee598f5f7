package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Salt

/** Pins the SCALE.md skew story with executed plans, not prose:
  *
  *  1. AQE's runtime skew-join splitting (on by default in
  *     [[graft.Session]]) actually FIRES on a deliberately skewed
  *     sort-merge join — the finalized adaptive plan carries the
  *     `skew=true` marker and the result is value-identical to the
  *     unskewed computation. This is the mechanism the 100 TB arguments
  *     lean on for every shuffle join whose key distribution we don't
  *     control.
  *  2. `Salt.saltedJoin` — the explicit fallback for the cases AQE can't
  *     rewrite — is value-identical to the plain join while provably
  *     spreading the hot key's rows across shuffle partitions.
  *
  * The skew thresholds are lowered to test scale (the default trigger is
  * a 256 MB partition); the CONFIG KNOBS exercised are exactly the
  * production ones.
  */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Session.builder("skew-test").getOrCreate().newSession()
    // force the shuffle-join path and make the skew detector's byte
    // thresholds reachable at test scale; factor/threshold/advisory-size
    // are the same runtime knobs a 100 TB job would tune
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  /** One hot key carrying ~100× the median partition's bytes, plus a long
    * tail of cold keys — the canonical power-law shuffle input.
    */
  private def skewedLeft() = {
    import spark.implicits._
    val pad = "x" * 64
    val hot = spark.range(30000)
      .select(lit(0L).as("k"), col("id").as("v"), lit(pad).as("pad"))
    val cold = spark.range(1, 101).select(explode(sequence(lit(1), lit(20)))
      .as("i"), col("id"))
      .select(col("id").as("k"), (col("id") * 100 + col("i")).as("v"),
        lit(pad).as("pad"))
    hot.unionByName(cold)
  }

  private def dim() = {
    import spark.implicits._
    spark.range(0, 101).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
  }

  test("AQE splits the skewed partition of a sort-merge join (skew=true)") {
    val joined = skewedLeft().join(dim(), "k")
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val rows = joined.collect()
    // ground truth: hot key contributes 30000 rows, each cold key 20
    assert(rows.length === 101)
    assert(rows.find(_.getString(0) == "dim_0").get.getLong(1) === 30000L)
    assert(rows.count(_.getLong(1) == 20L) === 100)
    // the finalized adaptive plan must have rewritten the join with skew
    // handling: AQEShuffleRead(skewed) feeding SortMergeJoin(skew=true)
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("expected an adaptive plan"))
    val finalPlan = adaptive.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"skew split did not fire; final plan:\n$finalPlan")
  }

  test("Salt.saltedJoin: value-identical, hot key spread across partitions") {
    import spark.implicits._
    val left = skewedLeft().drop("pad")
    val right = dim()
    val plain = left.join(right, "k")
      .select(col("k"), col("v"), col("name"))
    val salted = Salt.saltedJoin(left, right, "k", 8, col("v"))
      .select(col("k"), col("v"), col("name"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt must actually spread the hot key: its rows hash to >1 of
    // the 8 (key, salt) shuffle keys
    val spread = left.filter(col("k") === 0L)
      .select(pmod(hash(col("v")), lit(8)).as("salt"))
      .distinct().count()
    assert(spread > 1, s"hot key landed on $spread salt buckets")
  }
}
