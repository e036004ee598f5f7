package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks with PLANTED ground truth: tiny synthetic tables written
  * in the testdata layout (so the queries run unmodified on a temp dir),
  * constructed so the right answer is known in closed form — a 7-day
  * periodic series must backtest with zero error, a step function must
  * change-point at the step, a constant corpus must bootstrap to a
  * zero-width interval, a planted spike must be the only robust outlier.
  * The DuckDB gate proves Spark and DuckDB agree; these prove they agree
  * on the RIGHT thing.
  */
class PlantedSignalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    Session.builder("planted-test").getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Write events/documents parquet in the testdata layout; returns dir. */
  private def plant(
      events: Seq[(Long, Timestamp, Long, String, Double, String)],
      documents: Seq[(Long, String, String, String, Long)] = Nil): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("planted").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    if (documents.nonEmpty)
      documents.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tsr5: a 7-day periodic series backtests with zero MAE and sMAPE") {
    import spark.implicits._
    val pattern = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    val events = (0 until 30).map { d =>
      (d.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"), 1L, "click",
        pattern(d % 7), "{}")
    }
    val got = queries.TimeSeries.seasonalBacktest.run(spark, plant(events))
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (user, nScored, mae, smape) = got.head
    assert(user === 1L)
    assert(nScored === 23L) // 30 grid days minus the 7-day warm-up
    assert(mae === 0.0, s"periodic series must forecast exactly, mae=$mae")
    assert(smape === 0.0)
  }

  test("w21: a planted step function change-points exactly at the step") {
    import spark.implicits._
    val events = (0 until 100).map { i =>
      val v = if (i < 50) 0.0 else 10.0
      (i.toLong, ts(f"2024-01-05 ${i / 60}%02d:${i % 60}%02d:00"), 7L,
        "click", v, "{}")
    }
    val row = queries.Windows.changePoint.run(spark, plant(events))
      .select("user_id", "n_events", "split_pos", "mean_before", "mean_after")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row === ((7L, 100L, 50L, 0.0, 10.0)),
      s"expected the split after event 50, got $row")
  }

  test("samp8: a constant corpus bootstraps to a zero-width interval") {
    import spark.implicits._
    val docs = (0 until 100).map(i =>
      (i.toLong, "aa bb cc", "en", "web", 500L))
    val dir = plant(events = Seq((0L, ts("2024-01-02 00:00:00"), 1L,
      "click", 1.0, "{}")), documents = docs)
    val (lang, nDocs, mean, lo, hi, nRes) =
      queries.Sampling.bootstrapCi.run(spark, dir)
        .as[(String, Long, Double, Double, Double, Long)].head()
    assert((lang, nDocs, mean) === (("en", 100L, 500.0)))
    assert(lo === 500.0 && hi === 500.0,
      s"constant metric must have zero-width CI, got [$lo, $hi]")
    assert(nRes === 32L)
  }

  test("prof10: a planted spike is the only robust outlier") {
    import spark.implicits._
    val events = (1 to 101).map(i =>
      (i.toLong, ts("2024-01-03 00:00:00"), 1L, "click", i.toDouble, "{}")) :+
      ((999L, ts("2024-01-04 00:00:00"), 2L, "click", 1e6, "{}"))
    val (tpe, n, median, mad, nOut, ppm) =
      queries.Profiling.robustOutliers.run(spark, plant(events))
        .as[(String, Long, Double, Double, Long, Long)].head()
    assert((tpe, n) === (("click", 102L)))
    assert(median >= 51.0 && median <= 52.0, s"median=$median")
    assert(mad > 0 && mad < 50, s"mad=$mad")
    assert(nOut === 1L, s"only the planted 1e6 spike should flag, got $nOut")
    assert(ppm === (1000000L / 102L))
  }

  test("g7: a pendant node peels off; the planted triangle is the 2-core") {
    import spark.implicits._
    // Parts 1-2-3 co-occur in two orders (triangle, all weights 2); part 4
    // co-occurs twice with part 1 only — degree 1, so round 1 peels it and
    // the fixed point is the bare triangle with within-core degree 2.
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 4L),
      (13L, 1L), (13L, 4L))
    val dir = Files.createTempDirectory("planted").toString
    li.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = queries.Graph.kcore.run(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 2L)),
      s"expected the triangle at core degree 2, got $got")
  }

  test("cdc7: each diff class captures exactly its planted entity") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), 1L, "click", 1.0, "{}"),   // unchanged
      (2L, ts("2024-01-10 00:00:00"), 2L, "click", 1.0, "{}"),
      (3L, ts("2024-01-20 00:00:00"), 2L, "click", 2.0, "{}"),   // updated
      (4L, ts("2024-01-20 00:00:00"), 3L, "click", 1.0, "{}"),   // inserted
      (5L, ts("2024-01-10 00:00:00"), 4L, "click", 1.0, "{}"),
      (6L, ts("2024-01-20 00:00:00"), 4L, "error", 0.0, "{}"))   // deleted
    val got = queries.Cdc.snapshotDiff.run(spark, plant(events))
      .as[(String, Long)].collect().toMap
    assert(got === Map("unchanged" -> 1L, "updated" -> 1L,
      "inserted" -> 1L, "deleted" -> 1L), s"got $got")
  }

  test("w24: planted gaps yield exact percentiles and the 30-minute split") {
    import spark.implicits._
    // user 1: four events with gaps 60 s, 600 s, 3600 s — one of three
    // gaps (333333 ppm) beyond the 30-minute session cut
    val events = Seq(
      (0L, ts("2024-01-02 00:00:00"), 1L, "click", 1.0, "{}"),
      (1L, ts("2024-01-02 00:01:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-02 00:11:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-02 01:11:00"), 1L, "click", 1.0, "{}"))
    val row = queries.Windows.gapProfile.run(spark, plant(events))
      .as[(Long, Double, Double, Double, Long, Long)].head()
    assert(row._1 === 3L)
    assert(row._2 === 600.0, s"p50 should be the middle gap, got ${row._2}")
    assert(row._5 === 3600L)
    assert(row._6 === 333333L, s"1/3 of gaps over 30m, got ${row._6}")
  }

  test("samp10: the replication decision flips exactly at one epoch") {
    import spark.implicits._
    // masses 10000 and 100 → tempered shares 10:1 over an 11-part budget
    // of 2020 chars: en target 1836 (<1 epoch ⇒ subsample), de target 183
    // (>1 epoch of its 100 chars ⇒ replicate)
    val docs = (0 until 100).map(i => (i.toLong, "x", "en", "web", 100L)) :+
      ((100L, "x", "de", "web", 100L))
    val dir = plant(events = Seq((0L, ts("2024-01-02 00:00:00"), 1L,
      "click", 1.0, "{}")), documents = docs)
    val rows = queries.Sampling.epochPlan.run(spark, dir)
      .select("lang", "target_chars", "epochs_ppm", "plan")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("en")._4 === "subsample")
    assert(rows("de")._4 === "replicate")
    assert(rows("de")._3 > 1000000L && rows("en")._3 < 1000000L)
    // budget conservation: targets sum to ≤ the 20% budget, off by ≤ |sources| floors
    val totalTarget = rows.values.map(_._2).sum
    assert(totalTarget <= 2020L && totalTarget >= 2020L - 2,
      s"targets must tile the budget, got $totalTarget")
  }

  test("prof11: uniform, skewed and constant columns order by entropy") {
    import spark.implicits._
    // lang uniform over 4 values → normalized entropy exactly 1.0;
    // source constant → 0.0; event_type 50/50 over two values → 1.0 bit
    val docs = (0 until 80).map(i =>
      (i.toLong, "x", Seq("en", "de", "es", "fr")(i % 4), "web", 1L))
    val events = (0 until 40).map(i =>
      (i.toLong, ts("2024-01-02 00:00:00"), 1L,
        if (i < 20) "view" else "click", 1.0, "{}"))
    val dir = plant(events, docs)
    val rows = queries.Profiling.entropyProfile.run(spark, dir)
      .select("column_name", "n_distinct", "entropy_bits",
        "normalized_entropy")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the decimal(28,12) per-term quantization (determinism over
    // last-ulp exactness) leaves ~1e-13 residue on irrational log2 terms
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(rows("lang")._2 === 4L)
    assert(close(rows("lang")._3, 2.0) && close(rows("lang")._4, 1.0),
      s"lang: ${rows("lang")}")
    assert(rows("source")._2 === 1L)
    assert(close(rows("source")._3, 0.0) && rows("source")._4 === 0.0,
      s"source: ${rows("source")}")
    assert(rows("event_type")._2 === 2L)
    assert(close(rows("event_type")._3, 1.0) &&
      close(rows("event_type")._4, 1.0), s"event_type: ${rows("event_type")}")
  }

  test("er7: an all-fields-agreeing variant pair scores exactly Σ w_agree") {
    import spark.implicits._
    // "aa alpha" (twice) and "ab alpha" share every attribute; "zz beta" is
    // the disjoint background. Per field: m = 1 (the one same-name pair
    // agrees), u = C(3,2)/C(4,2) = 1/2 → w_agree = log2(2) = 1 exactly, so
    // the single candidate pair scores 3.0 with no float tolerance needed.
    val part = Seq(
      (1L, "aa alpha", "B1", "T1", 1),
      (2L, "aa alpha", "B1", "T1", 1),
      (3L, "ab alpha", "B1", "T1", 1),
      (4L, "zz beta", "B9", "T9", 9))
    val dir = Files.createTempDirectory("planted").toString
    part.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = queries.EntityResolution.reviewQueue.run(spark, dir)
      .as[(String, String, Long, Long, Double, Int)].collect().toSeq
    assert(got === Seq(("aa alpha", "ab alpha", 1L, 3L, 3.0, 1)))
  }

  test("dq7: a volume spike and a silent dropout both flag; on-trend does not") {
    import spark.implicits._
    // one event/day on Jan 1-14, except Jan 12 carries a 5× spike; the
    // feed then goes silent — day 15 is the first zero-volume day
    val events = (1 to 14).flatMap { d =>
      val n = if (d == 12) 5 else 1
      (0 until n).map(i =>
        ((d * 10 + i).toLong, ts(f"2024-01-$d%02d 12:00:00"), 1L,
          "click", 1.0, "{}"))
    }
    val rows = queries.Quality.volumeAnomaly.run(spark, plant(events))
      .select("day", "cnt", "trailing_sum", "ratio_ppm", "anomalous")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("2024-01-08") === (("2024-01-08", 1L, 7L, 1000000L, false)))
    assert(rows("2024-01-12") === (("2024-01-12", 5L, 7L, 5000000L, true)))
    assert(rows("2024-01-15") === (("2024-01-15", 0L, 11L, 0L, true)))
    // once the trailing week is itself empty the ratio is undefined — the
    // day must be absent, not reported as a division artifact
    assert(!rows.contains("2024-01-22"))
  }

  test("samp9: temperature boosts the small source above its natural share") {
    import spark.implicits._
    // 100:1 character mass → natural shares 100/101 vs 1/101; at T=2 the
    // tempered shares are √100:√1 = 10:11 vs 1:11 — exactly representable,
    // so the assertion is equality, not tolerance
    val docs = (0 until 100).map(i => (i.toLong, "x", "en", "web", 100L)) :+
      ((100L, "x", "de", "web", 100L))
    val dir = plant(events = Seq((0L, ts("2024-01-02 00:00:00"), 1L,
      "click", 1.0, "{}")), documents = docs)
    val rowsM = queries.Sampling.temperatureMix.run(spark, dir)
      .select("lang", "nat_share", "temp_share")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(rowsM("en") === ((100.0 / 101.0, 10.0 / 11.0)))
    assert(rowsM("de") === ((1.0 / 101.0, 1.0 / 11.0)))
    assert(rowsM("de")._2 > rowsM("de")._1, "small source must be boosted")
    assert(rowsM("en")._2 < rowsM("en")._1, "large source must be damped")
  }

  test("w22: trailing-7-day WAU counts a user active days earlier") {
    import spark.implicits._
    val events = Seq(
      (0L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (1L, ts("2024-01-03 10:00:00"), 2L, "click", 1.0, "{}"))
    val got = queries.Windows.activeStickiness.run(spark, plant(events))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    // day 1: only user 1 anywhere in its trailing week; day 3: user 2 is
    // the DAU but user 1's Jan-1 activity still counts toward WAU
    assert(got.toSeq === Seq(
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-03", 1L, 2L, 0.5)))
  }

  test("dd17: a shared passage is scrubbed from the later doc only") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta"  // 6 tokens, 2 windows
    val docs = Seq(
      (0L, s"intro one two $passage", "en", "web", 1L),
      (1L, s"$passage tail xx yy zz qq rr", "en", "web", 1L),
      (2L, "totally unrelated words only here now", "en", "web", 1L))
    val dir = plant(events = Seq((0L, ts("2024-01-02 00:00:00"), 1L,
      "click", 1.0, "{}")), documents = docs)
    val got = queries.Dedup.spanScrub.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    def fp(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    // doc 0 is the keeper (min doc_id) — nothing removed; doc 1 loses the
    // 6 passage tokens; doc 2 is untouched
    assert(got(0) === ((0L, 9L, 0L, fp(s"intro one two $passage"))))
    assert(got(1) === ((1L, 12L, 6L, fp("tail xx yy zz qq rr"))))
    assert(got(2) === ((2L, 6L, 0L, fp("totally unrelated words only here now"))))
  }

  test("tx23: a planted dominant pair wins merge rank 1 with exact counts") {
    import spark.implicits._
    // Four word types share the (t,h) prefix pair; "tha" repeats, so its
    // pairs carry word FREQUENCY weight while word_types stays 4.
    val docs = Seq(
      (0L, "tha thb thc", "en", "web", 11L),
      (1L, "tha thd", "en", "web", 7L))
    val dir = plant(events = Seq((0L, ts("2024-01-02 00:00:00"), 1L,
      "click", 1.0, "{}")), documents = docs)
    val top = queries.Text.bpeMergeStats.run(spark, dir)
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    assert(top.head === ((1, "t", "h", 5L, 4L)),
      s"(t,h) spans 4 word types with total frequency 5, got ${top.head}")
    // Every other pair is a distinct (h,x) suffix: ha has wf 2, hb/hc/hd 1.
    assert(top(1) === ((2, "h", "a", 2L, 1L)))
    assert(top.length === 5)
    assert(top.map(_._4).sameElements(top.map(_._4).sorted.reverse),
      "pair_count must be non-increasing in merge_rank")
  }
}
