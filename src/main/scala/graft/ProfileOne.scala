package graft

import graft.spark.GraftSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Diagnostic harness (guide §1: measure first): run ONE named query a few
  * times with a stage-level listener and print where the wall-clock goes —
  * per-job durations with the active job group/description, and the top
  * stages by duration with task counts and shuffle bytes. Not part of the
  * driver contract; `Bench` stays the canonical timing artifact.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileOne <query> [reps]"
  */
object ProfileOne {
  final case class StageRow(id: Int, name: String, tasks: Int, durMs: Long,
                            runMs: Long, gcMs: Long, cpuMs: Long,
                            shufWrite: Long, shufRead: Long)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Int)] // id, durMs, nStages
    val jobStart = mutable.Map.empty[Int, (Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (System.nanoTime(), e.stageIds.size)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, n) =>
          jobs += ((e.jobId, (System.nanoTime() - t0) / 1000000L, n))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        val scopes = si.rddInfos.sortBy(_.id).map(_.name).distinct.mkString(">")
        stages += StageRow(si.stageId, scopes.take(110),
          si.numTasks, dur, si.taskMetrics.executorRunTime,
          si.taskMetrics.jvmGCTime, si.taskMetrics.executorCpuTime / 1000000L,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })

    val fn = SparkEntry.queries(name)
    (0 until reps).foreach { i =>
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events arrive asynchronously; give the bus a moment to
      // drain before reading/clearing the buffers (diagnostic tool — a
      // short settle beats depending on private listener-bus APIs)
      Thread.sleep(300)
      println(f"== $name rep $i: $secs%.3f s, $rows rows, ${jobs.size} jobs, ${stages.size} stages ==")
      if (i == reps - 1 || i == 0) {
        println("  jobs (ms): " + jobs.map(j => s"${j._2}(${j._3}st)").mkString(" "))
        stages.sortBy(-_.durMs).take(18).foreach { s =>
          println(f"  stage ${s.id}%4d ${s.durMs}%6d ms run=${s.runMs}%7d gc=${s.gcMs}%5d cpu=${s.cpuMs}%7d tasks=${s.tasks}%3d " +
            f"sw=${s.shufWrite}%9d sr=${s.shufRead}%9d  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
