package graft

import org.apache.spark.sql.SparkSession

/** The bench book's host-calibration micro-workloads — ONE definition
  * shared by [[Bench]] (in-sweep calibration) and [[HostProbe]] (the
  * standalone quiet-check), so the two stay comparable by construction:
  * SCALE.md pins the idle costs against these exact shapes, and a change
  * to any constant here invalidates the pins in BOTH tools at once
  * (re-measure and re-pin below if one ever changes).
  *
  * Three axes, because the host's co-tenant phases steal two different
  * resources (SCALE.md "What we measure", r14 taxonomy):
  *   - spin    = pure CPU slices (codegen'd xxhash64 over range, 32-way,
  *               no exchange, no I/O);
  *   - shuffle = memory/shuffle bandwidth (full-data repartition by hash —
  *               deliberately NOT a partial-agg groupBy, whose map-side
  *               combine would shrink the exchange to the key count and
  *               measure CPU again);
  *   - latency = scheduler/driver round-trip (median of [[LatJobs]]
  *               trivial 32-task jobs) — the axis the sub-second sf0.1
  *               query inventory actually binds on; a latency phase reads
  *               ~idle on the two throughput probes.
  *
  * Every entry point catches Throwable and returns -1: probes exist to
  * diagnose sick hosts and must never crash on one.
  */
object Probes {
  val SpinRows = 4000000000L
  val ShufRows = 24000000L
  val LatJobs = 31
  val IdleSpinSec = 1.45 // pinned 2026-08-16, near-idle host (SCALE.md)
  val IdleShufSec = 1.70
  /** NOT yet pinned (-1 disables the latency axis in Bench's dilation):
    * the latency probe was authored INSIDE a latency phase reading
    * ~190 ms medians; pin from the first run whose query median sits
    * ~1.0× vs the idle snapshot (expected ~10-40 ms) — a phase-inflated
    * pin would normalize every future loaded run against a sick baseline.
    */
  val IdleLatMs = -1.0

  def loadAvg: Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Seconds for the CPU-slice workload; -1 on failure. */
  def spinSec(spark: SparkSession): Double =
    try {
      val t0 = System.nanoTime()
      spark.range(0L, SpinRows, 1L, 32)
        .selectExpr("max(xxhash64(id, id + 1L)) as m").collect()
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }

  /** Seconds for the full-data-exchange workload; -1 on failure. */
  def shuffleSec(spark: SparkSession): Double =
    try {
      val t0 = System.nanoTime()
      spark.range(0L, ShufRows, 1L, 32)
        .selectExpr("id", "xxhash64(id) as h")
        .repartition(32, org.apache.spark.sql.functions.col("h"))
        .selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }

  /** Median milliseconds of [[LatJobs]] trivial 32-task jobs (robust to a
    * straggling GC pause); -1 on failure.
    */
  def latMedianMs(spark: SparkSession): Double =
    try {
      val ts = (1 to LatJobs).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 64L, 1L, 32).selectExpr("count(1)").collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(LatJobs / 2)
    } catch { case _: Throwable => -1.0 }

  /** Warm the probes' own codegen/exchange/scheduler paths at small scale
    * so the first measured reading is steady-state (the first calibration
    * run measured probe-before 2.5× probe-after purely from first-plan
    * codegen + first-exchange init).
    */
  def warm(spark: SparkSession): Unit =
    try {
      spark.range(0L, SpinRows / 100, 1L, 32)
        .selectExpr("max(xxhash64(id, id + 1L)) as m").collect()
      spark.range(0L, ShufRows / 100, 1L, 32)
        .selectExpr("id", "xxhash64(id) as h")
        .repartition(32, org.apache.spark.sql.functions.col("h"))
        .selectExpr("sum(id)").collect()
      (1 to 8).foreach { _ =>
        spark.range(0L, 64L, 1L, 32).selectExpr("count(1)").collect()
      }
    } catch { case _: Throwable => () }

  /** One reading of all three axes: (spinSec, shuffleSec, latencyMs). */
  def all(spark: SparkSession): (Double, Double, Double) =
    (spinSec(spark), shuffleSec(spark), latMedianMs(spark))
}
