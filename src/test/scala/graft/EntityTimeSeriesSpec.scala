package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the entity-resolution (er1–er4) and time-series
  * (tsr1–tsr4) packs, beyond the driver's DuckDB hash gate: structural
  * invariants the oracle cannot see (plan shapes, transitive-closure
  * properties) plus in-memory reference recomputations of the windowed ops.
  */
class EntityTimeSeriesSpec extends AnyFunSuite {

  private lazy val spark = Session.builder("er-tsr-spec").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("er1: pairs are canonical, banded, and include the planted variants") {
    val pairs = queries.EntityResolution.candidatePairs.run(spark, dir)
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    // canonical order + band respected
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    assert(rows.forall(r => (0L to 2L).contains(r.getLong(2))))
    // blocking key: both sides share the head noun
    assert(rows.forall(r =>
      r.getString(0).split(" ")(1) == r.getString(1).split(" ")(1)))
    // the generator's planted typo family ("cold X" vs "old X", 1 edit)
    assert(rows.exists(r =>
      r.getString(0) == "cold bolt" && r.getString(1) == "old bolt" &&
        r.getLong(2) == 1L))
  }

  test("er2: clusters are transitively closed and labeled by their min name") {
    val pairs = queries.EntityResolution.candidatePairs.run(spark, dir)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = queries.EntityResolution.entityClusters.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // reference closure: union-find over the collected pair list
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering.String.max(ra, rb)) = // min-label
        math.Ordering.String.min(ra, rb)
    }
    val want = parent.keys ++ pairs.flatMap(p => Seq(p._1, p._2))
    want.toSet.foreach { n: String => assert(got(n) == find(n), n) }
    // every cluster's id is a member, and is its minimum
    got.groupBy(_._2).foreach { case (id, members) =>
      assert(members.keySet.contains(id))
      assert(members.keys.min == id)
    }
  }

  test("er3/er4: totals are preserved across resolution (no row lost/duped)") {
    val parts = Tables.load(spark, dir, "part")
    val golden = queries.EntityResolution.goldenRecords.run(spark, dir)
    assert(golden.agg(sum("n_records")).head.getLong(0) === parts.count())
    val rev = queries.EntityResolution.resolvedRevenue.run(spark, dir)
    val li = Tables.load(spark, dir, "lineitem")
    val want = li
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double")).head.getDouble(0)
    val gotTotal = rev.agg(sum(col("revenue").cast("decimal(18,4)"))
      .cast("double")).head.getDouble(0)
    assert(math.abs(gotTotal - want) < 1e-6, s"$gotTotal vs $want")
    // resolution collapsed variants: fewer entities than distinct names
    assert(rev.count() < parts.select("p_name").distinct().count())
  }

  test("er4: entity map joins are broadcasts; the fact side never nests") {
    val p = queries.EntityResolution.resolvedRevenue.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tsr1: LOCF — grid value equals the last daily close at or before") {
    val out = queries.TimeSeries.dailyFfill.run(spark, dir).collect()
    val users = Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.length === users * 30)
    // reference recompute for one user
    val u = out.map(_.getLong(0)).min
    val evs = Tables.load(spark, dir, "events")
      .filter(col("user_id") === u)
      .select(col("ts"), col("value"), col("event_id")).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1.getTime, t._3))
    out.filter(_.getLong(0) == u).foreach { r =>
      val day = r.getTimestamp(1)
      val endOfDay = day.getTime + 24L * 3600 * 1000
      val before = evs.filter(_._1.getTime < endOfDay)
      if (before.isEmpty) assert(r.isNullAt(2))
      else assert(r.getDouble(2) === before.last._2)
    }
  }

  test("tsr2: interpolation brackets — value between neighbors, exact at obs") {
    val out = queries.TimeSeries.gridInterp.run(spark, dir)
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    // each interpolated value lies within [min, max] of that user's values
    val bounds = evs.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val off = out.join(bounds, "user_id")
      .filter(col("value") < col("lo") - lit(1e-9) ||
        col("value") > col("hi") + lit(1e-9))
    assert(off.count() === 0)
    // a grid point coinciding with an observation reproduces it exactly
    val exact = out.join(evs.withColumnRenamed("value", "obs"),
        Seq("user_id", "ts"))
      .filter(col("value") =!= col("obs"))
    assert(exact.count() === 0)
  }

  test("tsr3: OHLC bars — envelope ordering and conservation of events") {
    val out = queries.TimeSeries.ohlcBars.run(spark, dir)
    assert(out.filter(col("high") < col("low") ||
      col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low")).count() === 0)
    assert(out.agg(sum("n_events")).head.getLong(0) ===
      Tables.load(spark, dir, "events").count())
  }

  test("tsr4: every breakout truly escapes its trailing 20-event channel") {
    val out = queries.TimeSeries.channelBreakout.run(spark, dir).collect()
    assert(out.nonEmpty)
    val byUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2.getTime, t._3)).map(t => (t._3, t._4)))
      .toMap
    out.foreach { r =>
      val (eid, u, v, dirn) =
        (r.getLong(0), r.getLong(1), r.getDouble(3), r.getString(4))
      val series = byUser(u)
      val i = series.indexWhere(_._1 == eid)
      assert(i >= 20, s"breakout $eid fired inside warm-up")
      val win = series.slice(i - 20, i).map(_._2)
      if (dirn == "up") assert(v > win.max) else assert(v < win.min)
    }
  }
}
