package graft

/** Standalone host quiet-check for the bench book (SCALE.md "What we
  * measure"): one JSON line with two readings of each [[Probes]] axis, so
  * a session can test for a co-tenant phase — EITHER kind — in ~1 minute
  * before spending a 7-minute sweep. Healthy on this host: spin ≈
  * 1.4-1.7 s, shuffle ≈ 1.4-1.9 s, tiny-job median ≈ 10-40 ms. A latency
  * phase reads ~idle spin/shuffle with a 100+ ms tiny-job median; a
  * bandwidth phase inflates the shuffle probe first (it stole 5× while
  * spin stole 1.8× in the measured attempt-1 phase, so spin alone is NOT
  * a sufficient green light). The workloads and healthy bands are defined
  * once in [[Probes]] — this main adds nothing but the double reading.
  * Probe failures read -1 (never a stack trace: this tool targets sick
  * hosts).
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("graft-host-probe")
    try {
      Probes.warm(spark)
      val (s1, h1, l1) = Probes.all(spark)
      val (s2, h2, l2) = Probes.all(spark)
      println(
        s"""{"metric":"host_probe","spin_sec":[$s1,$s2],""" +
          s""""shuffle_sec":[$h1,$h2],"tiny_job_median_ms":[$l1,$l2],""" +
          s""""load_1m":${Probes.loadAvg},""" +
          s""""idle_spin_sec":${Probes.IdleSpinSec},""" +
          s""""idle_shuffle_sec":${Probes.IdleShufSec},""" +
          s""""healthy_latency_ms":"10-40"}""")
    } finally spark.stop()
  }
}
