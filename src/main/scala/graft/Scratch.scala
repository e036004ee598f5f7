package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Temporary diagnostic main (r15): run one query with a listener counting
  * jobs/stages/tasks and per-stage task histograms, to localize where the
  * task-count overhead lives. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.isEmpty) Array("sim17_knn_ivfpq") else args
    val spark = Session.get("graft-scratch")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo
        stageLog.add(f"${i.stageId}%4d ${i.numTasks}%5d tasks  ${i.name.take(60)}")
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      }
    })
    // warm like Bench does
    try {
      spark.range(16).selectExpr("sum(id)").count()
      Tables.load(spark, sfDir, "documents").limit(1).count()
    } catch { case _: Throwable => () }
    for (name <- names) {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); stageLog.clear()
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftCaches.sweepExcept(spark,
        graft.blocks.FixtureSource.cachedFrames)
      println(s"=== $name rows=$n wall=${f"$dt%.2f"}s jobs=${jobs.get} " +
        s"stages=${stages.get} tasks=${tasks.get} taskTime=${taskTimeMs.get / 1000.0}s")
      import scala.jdk.CollectionConverters._
      stageLog.asScala.toSeq.sortBy(_.trim.split(" ")(0).toInt)
        .foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
