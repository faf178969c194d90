package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming soak (dev main, not a test): drives the streaming ingest at
  * volume — synthetic events parquet -> readStream ->
  * `windowedSegmentsStream` (crossfade context) -> parquet append sink
  * under AvailableNow -> `stitchTimeWindows` identity round trip — and
  * measures the state-store and stitch behavior the toy-scale specs only
  * check for correctness. The window-state aggregation is `assemble_timed`
  * (packed triple buffers), so streaming state is packed arrays, not boxed
  * sample rows; the stitch ships array-level block slices.
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.streaming.StreamSoak
  *   [nChannels] [nSamplesPerChannel]"
  */
object StreamSoak {

  def main(args: Array[String]): Unit = {
    // the soak shuffles tens of millions of samples through the windowed
    // assembly: full parallelism matters more than state-commit fan-out
    // (the opposite trade from the tiny staged bench streams)
    sys.props("spark.graft.stream.parts") = "32"
    val nCh = if (args.length > 0) args(0).toInt else 8
    val nSamples = if (args.length > 1) args(1).toLong else 2000000L
    val rate = 1000.0 // 1 kHz -> 1 ms = 1e6 ns between samples
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxTaskMs = new AtomicLong(0)
    val maxResultBytes = new AtomicLong(0)
    val shuffleWrite = new LongAdder
    val spill = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          maxTaskMs.getAndAccumulate(m.executorRunTime, math.max)
          maxResultBytes.getAndAccumulate(m.resultSize, math.max)
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
          spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ssoak] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[ssoak] $nCh ch x $nSamples samples = ${nCh * nSamples / 1e6} M points")

    // synthetic events: channel-interleaved, strictly increasing per-channel
    // event time at 1 kHz; value encodes (channel, t) for the round-trip sum.
    // ts is written as a real TIMESTAMP(MICROS) column — the harness's
    // current physical type — so the soak exercises the normalizeTsNanos
    // ingestion path, not the legacy long-nanos one
    val dir = java.nio.file.Files.createTempDirectory("stream_soak").toString
    StreamingOps.deleteOnExit(java.nio.file.Paths.get(dir))
    time("generate events parquet") {
      spark.range(nCh * nSamples)
        .select(
          col("id").as("event_id"),
          timestamp_micros((col("id") / nCh).cast("long") * 1000L).as("ts"),
          (col("id") % nCh).as("user_id"),
          (sin(col("id") / nCh / 100.0) +
            (pmod(xxhash64(col("id")), lit(1000)) / 1000.0 - 0.5) * 0.1).as("value"))
        .write.mode("overwrite").parquet(dir)
    }

    // 64-second core windows (~65k samples), 1 s crossfade context;
    // watermark > windowDur as the context shift requires
    val sinkDf = time("streaming windows -> parquet sink (AvailableNow)") {
      StreamingOps.runToParquet(spark, dir, "stream_soak",
        df => StreamingOps.windowedSegmentsStream(df, nCh, rate,
          windowDur = "64 seconds", watermark = "130 seconds",
          contextDur = "1 second"))
    }
    val nWindows = time("count sink windows") { sinkDf.count() }
    println(s"[ssoak]   -> $nWindows window rows")

    // identity round trip over the conservatively-closed prefix (q37's
    // arithmetic): the watermark holds the last ~2 windows open at stream
    // end, and stitch block w needs windows w-1..w+1, so blocks
    // 0..maxKeep-1 must come back complete — every sample exactly once
    val winU = 64000000L
    val delayU = 130000000L
    val maxTu = (nSamples - 1) * 1000L
    val maxKeep = (maxTu - delayU) / winU - 2
    val winSamples = 64000L
    val stitched = StreamingOps.stitchTimeWindows(sinkDf, "64 seconds", "1 second")
      .filter(col("win_idx") <= maxKeep - 1)
    val total = time("crossfade stitch -> blocks") {
      stitched.select(sum(size(col("values")))).head().getLong(0)
    }
    val expected = nCh * maxKeep * winSamples
    println(s"[ssoak] stitched samples in closed blocks: $total (expect $expected)")
    println(f"[ssoak] max task: ${maxTaskMs.get / 1000.0}%.1f s; " +
      f"max task result -> driver: ${maxResultBytes.get / 1024.0}%.0f KiB; " +
      f"shuffle write ${shuffleWrite.sum / 1e9}%.2f GB; " +
      f"spill ${spill.sum / 1e9}%.2f GB")
    assert(total == expected, s"lost samples: $total != $expected")
    assert(maxResultBytes.get < 64L * 1024 * 1024, "driver materialization leak")
    spark.stop()
  }
}
