package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ContractMonitor

/** The streamed contract monitor must converge to exactly the batch dq1
  * counters for the shared rules, regardless of batching — same
  * expressions, same numbers, batch or stream.
  */
class ContractMonitorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Session.builder("cmon-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.streams.active.foreach(_.stop())

  test("streamed cumulative counters == batch dq1 rows for the shared rules") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.load(spark, dir, "lineitem")
      .select($"l_quantity", $"l_discount", $"l_extendedprice",
        expr("unix_millis(cast(l_shipdate as timestamp))").as("ship_ms"))
      .as[(Double, Double, Double, Long)].collect().toSeq

    val feed = MemoryStream[(Double, Double, Double, Long)]
    val df = feed.toDF
      .toDF("l_quantity", "l_discount", "l_extendedprice", "ship_ms")
      .withColumn("l_shipdate", expr("timestamp_millis(ship_ms)"))
    val q = ContractMonitor.summary(df, ContractMonitor.lineitemRules)
      .writeStream.format("memory").queryName("cmon")
      .outputMode("complete").start()
    try {
      rows.grouped(1700).foreach { c =>
        feed.addData(c: _*); q.processAllAvailable()
      }
      val streamed = spark.table("cmon")
        .select($"rule", $"n_checked", $"n_violations", $"violation_ppm")
        .as[(String, Long, Long, Long)].collect().toSet
      val batch = queries.Quality.contractSummary.run(spark, dir)
        .filter($"rule".startsWith("lineitem.") &&
          !$"rule".contains("fk"))
        .select($"rule", $"n_checked", $"n_violations", $"violation_ppm")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"monitor diverged from dq1:\n stream=$streamed\n batch=$batch")
      assert(batch.exists(_._3 > 0), "no firing rule — not probative")
    } finally q.stop()
  }
}
