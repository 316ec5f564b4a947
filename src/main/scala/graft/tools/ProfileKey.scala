package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-key job/stage profiler for the optimization loop: runs each named
  * query cold then warm and prints, for the WARM run, every Spark job with
  * its wall time, stage names, task counts and shuffle bytes — the
  * local-mode stand-in for the Spark UI (disabled in [[LocalSession]]).
  * A key dominated by many short driver-sequential jobs shows up here as a
  * long job list; one dominated by a single heavy stage shows the stage.
  * Diagnostic only — never on a query path. */
object ProfileKey {

  private class Recorder extends SparkListener {
    case class StageRec(name: String, tasks: Int, ms: Long,
        shufRead: Long, shufWrite: Long)
    case class JobRec(id: Int, desc: String, start: Long,
        var end: Long = 0L,
        stages: mutable.ArrayBuffer[StageRec] = mutable.ArrayBuffer())
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    var enabled = false
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs.synchronized {
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled)
      jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (enabled) {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(0L)
        val tm = si.taskMetrics
        val rec = StageRec(si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, ms,
          if (tm != null) tm.shuffleReadMetrics.totalBytesRead else 0L,
          if (tm != null) tm.shuffleWriteMetrics.bytesWritten else 0L)
        jobs.synchronized {
          stageToJob.get(si.stageId)
            .flatMap(jobs.get).foreach(_.stages += rec)
        }
      }
    def reset(): Unit = jobs.synchronized { jobs.clear(); stageToJob.clear() }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: ProfileKey <query> [query...]")
    val unknown = args.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = LocalSession.build(cpus)
    spark.read.parquet(s"$dir/lineitem.parquet").limit(100).count()
    val rec = new Recorder
    spark.sparkContext.addSparkListener(rec)
    def runPlan(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold run (unprofiled): JIT, codegen, fixture builds
      val tc0 = System.nanoTime()
      runPlan(fn(spark, dir))
      val coldS = (System.nanoTime() - tc0) / 1e9
      cleanup()
      // warm run, profiled
      rec.reset(); rec.enabled = true
      val t0 = System.nanoTime()
      runPlan(fn(spark, dir))
      val warmS = (System.nanoTime() - t0) / 1e9
      rec.enabled = false
      Thread.sleep(300) // let the listener bus drain the last events
      println(f"\n===== $name cold=$coldS%.2fs warm=$warmS%.2fs " +
        f"jobs=${rec.jobs.size} =====")
      var prevEnd = 0L
      rec.jobs.values.foreach { j =>
        val gap = if (prevEnd > 0) j.start - prevEnd else 0L
        prevEnd = math.max(prevEnd, j.end)
        val dur = (j.end - j.start) / 1000.0
        println(f"  job ${j.id}%4d ${dur}%7.3fs (+${gap / 1000.0}%6.3fs gap) " +
          f"${j.desc.take(60)}")
        j.stages.foreach { s =>
          println(f"    stage ${s.ms / 1000.0}%7.3fs tasks=${s.tasks}%4d " +
            f"sr=${s.shufRead / 1048576.0}%8.2fMB sw=${s.shufWrite / 1048576.0}%8.2fMB ${s.name}")
        }
      }
      cleanup()
    }
    spark.stop()
  }
}
