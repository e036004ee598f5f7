package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.RangeJoin]]: the bucketed band join must return every
  * qualifying pair exactly once (including pairs straddling bucket
  * boundaries and exact-tolerance ties) and agree with the naive band
  * predicate on real data.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("range-test").getOrCreate()
  import spark.implicits._

  test("pairs exactly once across bucket boundaries and at the tolerance edge") {
    // tol=10: buckets [0,10) [10,20) ... pairs chosen to straddle boundaries
    val l = Seq(("a", 9L), ("a", 25L), ("b", 100L)).toDF("key", "lus")
      .withColumn("lt", timestamp_micros($"lus"))
    val r = Seq(
      ("a", 19L),  // |9-19|=10 == tol → inclusive match; |25-19|=6 → also l=25
      ("a", 20L),  // |9-20|=11 > tol; |25-20|=5 → matches l=25
      ("a", 36L),  // |25-36|=11 > tol → no match
      ("b", 91L),  // |100-91|=9 → match within adjacent bucket
      ("c", 100L)  // key mismatch
    ).toDF("key", "rus").withColumn("rt", timestamp_micros($"rus"))
    val out = RangeJoin.within(l, r, Seq("key"), "lt", "rt", 10L)
      .select($"key", $"lus", $"rus").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(out === Set(
      ("a", 9L, 19L), ("a", 25L, 19L), ("a", 25L, 20L), ("b", 100L, 91L)))
  }

  test("no duplicate pairs when both sides share a bucket") {
    val l = Seq(("a", 12L)).toDF("key", "lus").withColumn("lt", timestamp_micros($"lus"))
    val r = Seq(("a", 13L)).toDF("key", "rus").withColumn("rt", timestamp_micros($"rus"))
    assert(RangeJoin.within(l, r, Seq("key"), "lt", "rt", 10L).count() === 1L)
  }

  test("agrees with the naive band predicate on events (sf0.001)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val tol = 5L * 60 * 1000 * 1000
    val fast = RangeJoin.within(errors, clicks, Seq("user_id"), "ts", "click_ts", tol)
      .select($"event_id", $"click_id")
    val naive = errors.as("l").join(clicks.as("r"),
        expr(s"l.user_id = r.user_id AND abs(unix_micros(ts) - unix_micros(click_ts)) <= $tol"))
      .select($"event_id", $"click_id")
    assert(fast.count() === naive.count())
    assert(fast.except(naive).count() === 0L)
    assert(naive.except(fast).count() === 0L)
  }

  test("plan shape: hash equi-join on (key, bucket), not nested-loop") {
    val l = Seq(("a", 12L)).toDF("key", "lus").withColumn("lt", timestamp_micros($"lus"))
    val r = Seq(("a", 13L)).toDF("key", "rus").withColumn("rt", timestamp_micros($"rus"))
    val plan = RangeJoin.within(l, r, Seq("key"), "lt", "rt", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested-loop join in:\n$plan")
    assert(plan.contains("HashJoin"), s"expected hash join in:\n$plan")
  }
}
