package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator CDC invariants — the three materializations are views of
  * ONE changelog and must agree with each other, not just with their own
  * oracles.
  */
class CdcSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    Session.builder("cdc-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("snapshot == the open SCD2 version, entity for entity") {
    import spark.implicits._
    val snap = queries.Cdc.latestSnapshot.run(spark, dir)
      .select($"user_id", $"as_of_ms", $"current_value")
      .as[(Long, Long, Double)].collect().toSet
    val open = queries.Cdc.scd2History.run(spark, dir)
      .filter($"is_current")
      .select($"user_id", $"valid_from_ms", $"value")
      .as[(Long, Long, Double)].collect().toSet
    // an entity has an open version iff it is in the snapshot (a delete
    // closes the last version AND removes the key), with identical
    // (timestamp, value)
    assert(snap == open,
      s"snapshot and open-version set diverged:\n snap=$snap\n open=$open")
  }

  test("cdc2 versions tile per-entity time: no overlaps, no gaps") {
    import spark.implicits._
    val bad = queries.Cdc.scd2History.run(spark, dir)
      .withColumn("next_from", lead($"valid_from_ms", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"version_no")))
      .filter($"next_from".isNotNull &&
        ($"valid_to_ms".isNull || $"valid_to_ms" > $"next_from"))
      .count()
    assert(bad == 0, s"$bad versions overlap their successor")
  }

  test("snapshot matches an independent in-memory fold of the changelog") {
    import spark.implicits._
    // third computation path (Spark plan and DuckDB oracle are the other
    // two): a plain Scala fold over the collected log
    val log = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", expr("unix_millis(ts)").as("ms"),
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    val expected = log.groupBy(_._1).flatMap { case (uid, rows) =>
      val last = rows.maxBy(r => (r._3, r._2))
      if (last._4 == "error") None
      else Some((uid, last._3, last._5, rows.length.toLong))
    }.toSet
    val got = queries.Cdc.latestSnapshot.run(spark, dir)
      .select($"user_id", $"as_of_ms", $"current_value", $"n_changes")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("w19 TWAP matches an independent in-memory integration") {
    import spark.implicits._
    val log = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", expr("unix_millis(ts)").as("ms"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val expected = log.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val pairs = sorted.zip(sorted.tail)
      if (pairs.isEmpty) None else {
        val durs = pairs.map { case (a, b) => b._3 - a._3 }
        val wsum = pairs.zip(durs).map { case ((a, _), d) =>
          BigInt(a._4) * BigInt(d) }.sum
        val dsum = durs.map(BigInt(_)).sum
        Some((uid, pairs.length.toLong, dsum.toLong,
          (wsum * 1000 / dsum).toLong))
      }
    }.toSet
    val got = queries.Windows.timeWeightedAvg.run(spark, dir)
      .select($"user_id", $"n_intervals", $"total_dur_ms", $"twap_millicents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("cdc3 net concurrency equals the open-version count") {
    import spark.implicits._
    // the final running total of (opened - closed) must equal the number
    // of versions still open at the end of the log
    val lastActive = queries.Cdc.concurrencyProfile.run(spark, dir)
      .orderBy($"hour".desc).select($"n_active_eoh")
      .as[Long].head()
    val openCount = queries.Cdc.scd2History.run(spark, dir)
      .filter($"is_current").count()
    assert(lastActive == openCount,
      s"sweep-line ended at $lastActive but $openCount versions are open")
  }
}
