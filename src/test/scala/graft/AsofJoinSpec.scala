package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.AsofJoin]]: the union+window backward as-of join must
  * agree with the naive (quadratic) range-join-then-prune formulation, and
  * honor tie inclusivity, tolerance, left-outer semantics, and whole-row
  * payload alignment when payload fields are themselves NULL.
  */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("asof-test").getOrCreate()
  import spark.implicits._

  // left: (key, t, lv)   right: (key, rt, a, b)
  private def left: DataFrame = Seq(
    ("k1", 10L, "l1"), ("k1", 20L, "l2"), ("k1", 5L, "l0"),
    ("k2", 7L, "l3"), ("k3", 100L, "l4")
  ).toDF("key", "t", "lv")

  private def right: DataFrame = Seq(
    ("k1", 10L, Some("a10"), Some(1)), ("k1", 15L, None, Some(2)),
    ("k1", 3L, Some("a3"), Some(3)),
    ("k2", 8L, Some("a8"), Some(4))
  ).toDF("key", "rt", "a", "b")

  private def rows(df: DataFrame): Set[(String, Long, String, Option[Long], Option[String], Option[Int])] =
    df.select($"key", $"t", $"lv", $"rt", $"a", $"b").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))
    }.toSet

  test("backward as-of: inclusive ties, left-outer, whole-row payload") {
    val out = rows(AsofJoin.backward(left, right, Seq("key"), "t", "rt"))
    assert(out === Set(
      // t=10 ties rt=10 → included (inclusive default); payload row intact
      ("k1", 10L, "l1", Some(10L), Some("a10"), Some(1)),
      // t=20 → rt=15 whose `a` IS NULL: fields must come from the SAME row
      // (a=None, b=2), not mix a10 from an earlier row
      ("k1", 20L, "l2", Some(15L), None, Some(2)),
      ("k1", 5L, "l0", Some(3L), Some("a3"), Some(3)),
      // k2: t=7 < rt=8 → no match; k3: no right rows at all
      ("k2", 7L, "l3", None, None, None),
      ("k3", 100L, "l4", None, None, None)))
  }

  test("forward as-of: earliest at-or-after, ties, left-outer, tolerance") {
    val out = rows(AsofJoin.forward(left, right, Seq("key"), "t", "rt"))
    assert(out === Set(
      // t=10 ties rt=10 → included; next-at-or-after semantics
      ("k1", 10L, "l1", Some(10L), Some("a10"), Some(1)),
      // t=20: no right row at or after → NULL payload
      ("k1", 20L, "l2", None, None, None),
      // t=5 → earliest rt >= 5 is 10 (not 15, not the stale 3)
      ("k1", 5L, "l0", Some(10L), Some("a10"), Some(1)),
      ("k2", 7L, "l3", Some(8L), Some("a8"), Some(4)),
      ("k3", 100L, "l4", None, None, None)))
    // look-AHEAD tolerance: rt=10 is 5 ticks after t=5 → dropped at tol=4
    val bounded = rows(AsofJoin.forward(left, right, Seq("key"), "t", "rt",
      tolerance = Some(lit(4))))
    assert(bounded.contains(("k1", 5L, "l0", None, None, None)))
    assert(bounded.contains(("k1", 10L, "l1", Some(10L), Some("a10"), Some(1))))
    // exclusive ties: the rt=10 row is invisible to t=10 → next is 15
    val excl = rows(AsofJoin.forward(left, right, Seq("key"), "t", "rt",
      inclusive = false))
    assert(excl.contains(("k1", 10L, "l1", Some(15L), None, Some(2))))
  }

  test("exclusive ties: a right row at exactly t is not visible") {
    val out = rows(AsofJoin.backward(left, right, Seq("key"), "t", "rt",
      inclusive = false))
    assert(out(("k1", 10L, "l1", Some(3L), Some("a3"), Some(3))))
  }

  test("tolerance bounds the lookback") {
    val out = rows(AsofJoin.backward(left, right, Seq("key"), "t", "rt",
      tolerance = Some(lit(2))))
    assert(out === Set(
      ("k1", 10L, "l1", Some(10L), Some("a10"), Some(1)),
      ("k1", 20L, "l2", None, None, None), // 20-15=5 > 2
      ("k1", 5L, "l0", Some(3L), Some("a3"), Some(3)),
      ("k2", 7L, "l3", None, None, None),
      ("k3", 100L, "l4", None, None, None)))
  }

  test("agrees with the naive range-join formulation on events (sf0.001)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val r = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id"))
    val fast = AsofJoin.backward(l, r, Seq("user_id"), "ts", "view_ts")
      .select("event_id", "view_id")
    // naive: all candidate pairs, keep max view_ts per purchase (quadratic —
    // the formulation AsofJoin exists to avoid; fine at fixture scale)
    val naive = l.as("l").join(r.as("r"),
        expr("l.user_id = r.user_id AND r.view_ts <= l.ts"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l.event_id").orderBy($"r.view_ts".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"l.event_id".as("event_id"), $"r.view_id".as("view_id"))
    assert(fast.count() === l.count())
    assert(fast.except(naive).count() === 0L)
    assert(naive.except(fast).count() === 0L)
  }

  test("physical merge as-of: same semantics as backward(), AsofJoinExec plan") {
    val out = AsofJoin.merge(left, right, Seq("key"), "t", "rt")
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"),
      s"expected AsofJoinExec in:\n${out.queryExecution.executedPlan}")
    assert(rows(out) === rows(AsofJoin.backward(left, right, Seq("key"), "t", "rt")))
    val excl = AsofJoin.merge(left, right, Seq("key"), "t", "rt", inclusive = false)
    assert(rows(excl) ===
      rows(AsofJoin.backward(left, right, Seq("key"), "t", "rt", inclusive = false)))
  }

  test("physical merge agrees with backward() on events (sf0.001, self-as-of)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val r = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id"))
    val fast = AsofJoin.merge(l, r, Seq("user_id"), "ts", "view_ts")
      .select("event_id", "view_id", "view_ts")
    val ref = AsofJoin.backward(l, r, Seq("user_id"), "ts", "view_ts")
      .select("event_id", "view_id", "view_ts")
    assert(fast.count() === l.count())
    assert(fast.except(ref).count() === 0L)
    assert(ref.except(fast).count() === 0L)
  }

  test("merge survives multiple right rows per timestamp run and empty sides") {
    import spark.implicits._
    val l2 = Seq(("k", 10L, "x")).toDF("key", "t", "lv")
    val rEmpty = Seq.empty[(String, Long, Option[String], Option[Int])]
      .toDF("key", "rt", "a", "b")
    val out = AsofJoin.merge(l2, rEmpty, Seq("key"), "t", "rt")
    assert(out.count() === 1L && out.select("a").collect()(0).isNullAt(0))
    // several right rows at t<=10: the LAST in (key, time) order wins
    val rMany = Seq(("k", 9L, Some("r1"), Some(1)), ("k", 9L, Some("r2"), Some(2)),
      ("k", 10L, Some("r3"), Some(3))).toDF("key", "rt", "a", "b")
    val got = AsofJoin.merge(l2, rMany, Seq("key"), "t", "rt")
      .select("rt", "a").collect()(0)
    assert(got.getLong(0) === 10L && got.getString(1) === "r3")
  }

  test("plan shape: one shuffle on the key, no join operator") {
    val out = AsofJoin.backward(left, right, Seq("key"), "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected a window operator in:\n$plan")
  }
}
