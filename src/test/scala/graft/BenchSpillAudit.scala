package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Registry-wide scale-hygiene census (dev main, not a test): runs every
  * SparkEntry query at SPARK_GRAFT_SF_DIR under local[32] and reports, per
  * query, the task-metric signals that flag 100×-scale problems long before
  * walls do — spill (memory pressure that becomes the bottleneck at real
  * partition sizes), max task result (driver-collect mass), and shuffle
  * volume. A query that spills at sf0.1 on 32 threads is a red flag; the
  * clean queries become a certified "zero spill across the registry" claim.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "Test/runMain graft.BenchSpillAudit [spillOnly]"
  */
object BenchSpillAudit {
  private final class PerQuery extends SparkListener {
    val phase = new AtomicReference[String]("init")
    val spill = new ConcurrentHashMap[String, LongAdder]()
    val maxResult = new ConcurrentHashMap[String, AtomicLong]()
    val shuffleW = new ConcurrentHashMap[String, LongAdder]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        val p = phase.get
        spill.computeIfAbsent(p, _ => new LongAdder)
          .add(m.memoryBytesSpilled + m.diskBytesSpilled)
        maxResult.computeIfAbsent(p, _ => new AtomicLong)
          .getAndAccumulate(m.resultSize, math.max)
        shuffleW.computeIfAbsent(p, _ => new LongAdder)
          .add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spillOnly = args.contains("spillOnly")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prof = new PerQuery
    spark.sparkContext.addSparkListener(prof)
    val qs = SparkEntry.queries
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      prof.phase.set(name)
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    // listener delivery is async (listenerBus is spark-private) and a
    // fixed sleep can silently drop late task-end events on a loaded host
    // (feeding a wrong "zero spill" claim) — poll until the accumulated
    // census is stable for 4 consecutive 500 ms reads, capped at 30 s
    def digest(): Long = {
      var h = 17L
      def fold(m: java.util.concurrent.ConcurrentHashMap[String, _ <: AnyRef]): Unit = {
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          h = h * 31 + e.getKey.hashCode + e.getValue.toString.hashCode
        }
      }
      fold(prof.spill); fold(prof.maxResult); fold(prof.shuffleW)
      h
    }
    var last = digest()
    var stable = 0
    var waited = 0
    while (stable < 4 && waited < 30000) {
      Thread.sleep(500); waited += 500
      val d = digest()
      if (d == last) stable += 1 else { stable = 0; last = d }
    }
    if (stable < 4)
      println("[audit] WARNING: listener counts still changing after 30 s " +
        "— totals below may undercount late task-end events")
    var nSpill = 0
    qs.keys.toSeq.sorted.foreach { name =>
      val sp = Option(prof.spill.get(name)).map(_.sum).getOrElse(0L)
      val mr = Option(prof.maxResult.get(name)).map(_.get).getOrElse(0L)
      val sw = Option(prof.shuffleW.get(name)).map(_.sum).getOrElse(0L)
      if (sp > 0) nSpill += 1
      if (sp > 0 || !spillOnly)
        println(f"[audit] $name%-42s spill ${sp / 1e9}%8.3f GB  " +
          f"maxResult ${mr / 1024.0}%9.0f KiB  shuffleW ${sw / 1e9}%8.3f GB")
    }
    println(s"[audit] queries with nonzero spill: $nSpill / ${qs.size}")
    spark.stop()
  }
}
