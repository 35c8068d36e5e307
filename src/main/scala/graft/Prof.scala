package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Builder-side profiling main (guide §1: measure first). For each
  * named query: one untimed warm run (codegen/JIT), then one timed
  * run under a stage listener, printing per-stage task counts and
  * executor-time sums so serial map stages (numTasks = 1), shuffle
  * counts, and job fan-out are visible without the UI (disabled in
  * the bench session).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Prof /root/testdata/sf0.1 q175_hll_growth,q52_ngram_jaccard"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = GraftSession.local("graft-prof")
    val stages = mutable.ArrayBuffer.empty[(Int, Int, Long, Long, String)]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    val jobStart = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val run = i.taskMetrics.executorRunTime
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, i.numTasks, wall, run, i.name.takeWhile(_ != '\n').take(60)))
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.synchronized { jobStart(e.jobId) = e.time }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs += ((e.jobId, e.time - jobStart.getOrElse(e.jobId, e.time))) }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm (codegen + any session-scoped memoized frames)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      stages.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain (listenerBus is private)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name wall=$wall%.3f s jobs=${jobs.size} stages=${stages.size}")
      jobs.toSeq.sortBy(_._1).foreach { case (id, ms) => println(f"  job $id%3d  ${ms / 1000.0}%6.3f s") }
      stages.toSeq.sortBy(_._1).foreach { case (id, n, w, r, nm) =>
        println(f"  stage $id%4d tasks=$n%3d wall=${w / 1000.0}%6.3f s exec=${r / 1000.0}%7.3f s  $nm")
      }
    }
    spark.stop()
  }
}
