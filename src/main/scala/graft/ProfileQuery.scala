package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run declared queries under a SparkListener and print where the
  * wall time goes — one line per JOB (duration, stage count, task time,
  * shuffle bytes), so an iterative operator's per-round cost and a DAG
  * query's dominant stage are visible without the (disabled) UI. Usage:
  *
  *   runMain graft.ProfileQuery <sfDir> <q1,q2,...> [runs]
  *
  * Mirrors Bench's session conf and its best-of-N `count()` methodology;
  * jobs are listed for the LAST run (steady state — codegen/footer costs
  * paid by the earlier runs). The builder itself may run jobs eagerly
  * (tier dispatch counts, pins); those appear in the job list too, which
  * is the point. */
object ProfileQuery {

  private final class JobTimer extends SparkListener {
    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L, var stages: Int = 0,
                      var taskTimeMs: Long = 0L,
                      var shufWrite: Long = 0L, var shufRead: Long = 0L,
                      var spill: Long = 0L,
                      var outRows: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      val r = JobRec(e.jobId, desc, e.time)
      r.stages = e.stageIds.size
      jobs.put(e.jobId, r)
      e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      Option(stageToJob.get(si.stageId)).flatMap(j => Option(jobs.get(j)))
        .foreach { r =>
          val m = si.taskMetrics
          if (m != null) {
            r.taskTimeMs += m.executorRunTime
            r.shufWrite += m.shuffleWriteMetrics.bytesWritten
            r.shufRead += m.shuffleReadMetrics.totalBytesRead
            r.spill += m.diskBytesSpilled
          }
        }
    }
    def reset(): Unit = { jobs.clear(); stageToJob.clear() }
    def report(): String = {
      import scala.jdk.CollectionConverters._
      val rs = jobs.values().asScala.toSeq.sortBy(_.id)
      val total = rs.map(r => (r.end - r.start).max(0L)).sum
      val lines = rs.map { r =>
        f"  job ${r.id}%4d ${(r.end - r.start) / 1000.0}%7.3fs " +
          f"stages=${r.stages}%2d task=${r.taskTimeMs / 1000.0}%8.2fs " +
          f"sw=${r.shufWrite / 1e6}%8.1fMB sr=${r.shufRead / 1e6}%8.1fMB " +
          f"spill=${r.spill / 1e6}%6.1fMB  ${r.desc.take(90)}"
      }
      (lines :+ f"  JOB-WALL SUM ${total / 1000.0}%7.3fs over ${rs.size} jobs").mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <sfDir> <q1,q2,...> [runs]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val nRuns = if (args.length >= 3) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only experiment knob: decouple shuffle-partition count from core
    // count to attribute per-round cost (task-launch overhead vs compute).
    // Bench never reads this; its session stays partitions == cpus.
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    val qs = SparkEntry.queries
    // same warmup as Bench
    try {
      qs("q01_pricing_summary")(spark, sfDir).count()
      qs("q46_token_count")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    names.foreach { name =>
      val walls = (1 to nRuns).map { i =>
        timer.reset()
        val t0 = System.nanoTime()
        val n = qs(name)(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[$name] run $i: $w%.3f s ($n rows)")
        w
      }
      // report jobs of the LAST run (timer was reset before it)
      println(s"[$name] last-run job breakdown:")
      println(timer.report())
      println(f"[$name] best-of-$nRuns: ${walls.min}%.3f s")
    }
    spark.stop()
  }
}
