package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak for the round-10 stateful streaming operators (dev main, not a
  * test): drives `session_window` sessionization (q103's shape) and the
  * stream-stream interval join (q104's shape) at volume — synthetic events
  * across many users — and measures the state behavior the sf-scale oracle
  * rows can't: spill, driver materialization, and batch equivalence of the
  * session count.
  *
  * Run: sbt "Test/runMain graft.streaming.SessionSoak [nUsers] [nEvents]"
  */
object SessionSoak {

  def main(args: Array[String]): Unit = {
    val nUsers = if (args.length > 0) args(0).toInt else 100000
    val nEvents = if (args.length > 1) args(1).toLong else 20000000L
    // at soak volume the shuffle parallelism matters more than commit
    // fan-out (same trade as StreamSoak)
    sys.props("spark.graft.stream.parts") = "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxResultBytes = new AtomicLong(0)
    val spill = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          maxResultBytes.getAndAccumulate(m.resultSize, math.max)
          spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sessoak] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[sessoak] $nEvents events across $nUsers users")

    // synthetic: per-user event times stride ~17 min with a deterministic
    // jitter, so >30 min gaps (session breaks) occur regularly; micros ts
    val dir = java.nio.file.Files.createTempDirectory("session_soak").toString
    StreamingOps.deleteOnExit(java.nio.file.Paths.get(dir))
    time("generate events parquet") {
      spark.range(nEvents)
        .select(
          col("id").as("event_id"),
          timestamp_micros((col("id") / nUsers).cast("long") * 1020000000L +
            (pmod(xxhash64(col("id")), lit(1200)) * 1000000L)).as("ts"),
          pmod(col("id"), lit(nUsers)).as("user_id"),
          when(pmod(xxhash64(col("id"), lit(1)), lit(5)) === 0, "click")
            .when(pmod(xxhash64(col("id"), lit(1)), lit(5)) === 1, "error")
            .otherwise("view").as("event_type"),
          (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 10.0).as("value"))
        .write.mode("overwrite").parquet(dir)
    }

    // --- q103 shape: session_window sessionization ---
    val sessions = time("streaming session_window -> parquet sink") {
      StreamingOps.runToParquet(spark, dir, "session_soak",
        df => df
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withColumn("vmilli", round(col("value") * 1000).cast("long"))
          .withWatermark("event_time", "1 hour")
          .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("vmilli").as("vmilli")))
    }
    val nStreamed = time("count streamed sessions")(sessions.count())

    // batch gap-merge over the same data; the streamed (watermark-closed)
    // set must be a prefix of it — and at least the conservative prefix
    import org.apache.spark.sql.expressions.Window
    val gapU = 1800000000L
    val batchSessions = time("batch gap-merge count") {
      val e = graft.model.Frames.normalizeTsNanos(spark.read.parquet(dir))
        .select(col("user_id"), expr("ts div 1000").as("us"))
      val w = Window.partitionBy("user_id").orderBy("us")
      e.withColumn("prev", lag("us", 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("us") - col("prev") >= gapU, 1L).otherwise(0L))
        .agg(sum("brk")).head().getLong(0)
    }
    println(s"[sessoak] sessions: streamed=$nStreamed batch=$batchSessions " +
      s"(streamed excludes the watermark-open tail)")

    // --- q104 shape: stream-stream interval join ---
    def src() = StreamingOps.eventsStream(spark, dir)
    val errors = src().filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        timestamp_micros(expr("ts div 1000")).as("et"))
      .withWatermark("et", "1 hour")
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        timestamp_micros(expr("ts div 1000")).as("ct"))
      .withWatermark("ct", "4 hours")
    val joined = time("stream-stream interval join -> parquet sink") {
      StreamingOps.runStreamToParquet(spark,
        errors.join(clicks,
          col("user_id") === col("c_user_id") &&
            col("ct") >= col("et") - expr("INTERVAL 2 HOURS") &&
            col("ct") < col("et")),
        "session_soak_join")
    }
    val nJoined = time("count joined matches")(joined.count())
    println(s"[sessoak] interval-join matches: $nJoined")

    println(f"[sessoak] max task result -> driver: ${maxResultBytes.get / 1024.0}%.0f KiB; " +
      f"spill ${spill.sum / 1e9}%.2f GB")
    assert(maxResultBytes.get < 64L * 1024 * 1024, "driver materialization leak")
    assert(nStreamed > 0 && nJoined > 0)
    spark.stop()
  }
}
