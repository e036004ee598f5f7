package graft

/** Standalone host quiet-check for the bench book (SCALE.md "What we
  * measure"): one JSON line with the same spin/latency micro-workloads the
  * Bench calibration probe runs, so a session can test for a co-tenant
  * phase — either kind — in ~1 minute before spending a 7-minute sweep.
  * Healthy on this host: spin ≈ 1.4-1.7 s, tiny-job median ≈ 10-40 ms.
  * A latency phase reads ~idle spin with a 100+ ms tiny-job median; a
  * bandwidth phase inflates spin (and the Bench shuffle probe) directly.
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("graft-host-probe")
    def spin(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 4000000000L, 1L, 32)
        .selectExpr("max(xxhash64(id, id + 1L)) as m").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def latMedian(): Double = {
      val ts = (1 to 31).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 64L, 1L, 32).selectExpr("count(1)").collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(15)
    }
    // warm codegen + scheduler paths so the readings are steady-state
    spark.range(0L, 40000000L, 1L, 32)
      .selectExpr("max(xxhash64(id, id + 1L)) as m").collect()
    (1 to 8).foreach(_ =>
      spark.range(0L, 64L, 1L, 32).selectExpr("count(1)").collect())
    val s1 = spin(); val l1 = latMedian()
    val s2 = spin(); val l2 = latMedian()
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(
      s"""{"metric":"host_probe","spin_sec":[$s1,$s2],""" +
        s""""tiny_job_median_ms":[$l1,$l2],"load_1m":$load,""" +
        s""""healthy_spin_sec":"1.4-1.7","healthy_latency_ms":"10-40"}""")
    spark.stop()
  }
}
