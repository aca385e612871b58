package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock decomposition (guide §1: measure first; §7.1 UI
  * breakdown, headless spelling): run one declared query under a
  * SparkListener and split its wall time into
  *
  *   - per-job spans (first stage submitted → job end), with task time,
  *     task count, and shuffle bytes per job;
  *   - DRIVER GAPS — wall time between consecutive jobs where no job
  *     runs: plan/optimize/codegen, collect-based decisions (counts,
  *     centroid tables), checkpoint bookkeeping. At sf0.1 on local[32]
  *     this is where iterative operators hide their cost.
  *
  * Usage: runMain graft.tools.Profile q37_dedup_clusters [q44_...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  * One untimed warmup, then one instrumented run per query.
  */
object Profile {
  private class Rec extends SparkListener {
    case class Job(id: Int, var start: Long = 0L, var end: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   var taskTimeMs: Long = 0L, var shufRead: Long = 0L,
                   var shufWrite: Long = 0L, var desc: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    private val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val j = new Job(e.jobId); j.start = e.time
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
        j.stages += 1
        j.tasks += si.numTasks
        j.taskTimeMs += si.taskMetrics.executorRunTime
        j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup (JIT, footer cache) — exactly Bench's discipline
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.gc()
      val rec = new Rec
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // listenerBus is private[spark]; a short settle sleep drains the
      // queue reliably at this event volume
      Thread.sleep(800)
      spark.sparkContext.removeSparkListener(rec)
      val js = rec.jobs.values.toVector.sortBy(_.start)
      var prevEnd = 0L
      var gapMs = 0L
      var jobMs = 0L
      println(f"== $name wall ${wallMs / 1000}%.3f s, ${js.size} jobs ==")
      js.foreach { j =>
        val gap = if (prevEnd == 0) 0 else math.max(0L, j.start - prevEnd)
        gapMs += gap
        jobMs += (j.end - j.start)
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%3d +${gap}%4d ms gap | ${j.end - j.start}%5d ms, " +
          f"${j.stages}%2d stages ${j.tasks}%4d tasks, taskTime ${j.taskTimeMs}%6d ms, " +
          f"shuf r/w ${j.shufRead / 1024}%6d/${j.shufWrite / 1024}%-6d KiB | ${j.desc.take(60)}")
      }
      println(f"  TOTAL: jobs ${jobMs / 1000.0}%.3f s, inter-job driver gaps ${gapMs / 1000.0}%.3f s, " +
        f"outside-jobs ${(wallMs - jobMs - gapMs) / 1000.0}%.3f s (pre-first/post-last/plan)")
    }
    spark.stop()
  }
}
