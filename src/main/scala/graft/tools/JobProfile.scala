package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.SparkEntry

/** Dev profiling harness (r14 optimization round): run declared queries
  * by name and report the DRIVER-SIDE job structure — number of Spark
  * jobs, per-job wall time, total task time vs wall time — the numbers
  * that separate "this query is slow because it computes a lot" from
  * "this query is slow because it launches 25 sequential jobs of 60 ms
  * fixed overhead each" (guide §1: measure first; §2.6 stragglers/idle).
  *
  *   runMain graft.tools.JobProfile <q1,q2,...> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <q1,q2,...> [sfDir] [reps]")
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local(cpus, appName = "jobprofile")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobs = Vector.empty[(Int, Double)] // (jobId, sec)
    @volatile var taskTimeMs = 0L
    @volatile var stages = 0
    @volatile var stageNames = Vector.empty[String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        if (t0 != 0L)
          jobs :+= (je.jobId, (System.nanoTime() - t0) / 1e9)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
        stageNames :+= sc.stageInfo.name.takeWhile(_ != '\n').take(90)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { r =>
        spark.catalog.clearCache()
        jobs = Vector.empty; taskTimeMs = 0L; stages = 0
        stageNames = Vector.empty
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // let listener events drain
        Thread.sleep(200)
        (wall, jobs, taskTimeMs, stages)
      }
      val best = times.minBy(_._1)
      val (wall, js, tt, st) = best
      println(f"$name%-28s wall=${wall}%6.2f s  jobs=${js.size}%3d  stages=$st%4d  taskTime=${tt / 1000.0}%7.2f s  (reps: ${times.map(t => f"${t._1}%.2f").mkString(", ")})")
      val slow = js.sortBy(-_._2).take(8)
      println("   slowest jobs: " + slow.map { case (id, s) => f"#$id:${s}%.2f" }.mkString("  "))
      if (sys.env.contains("JOBPROFILE_NAMES"))
        stageNames.groupBy(identity).toSeq.sortBy(-_._2.size)
          .take(20).foreach { case (n, g) => println(f"   ${g.size}%3d x $n") }
    }
    spark.stop()
  }
}
