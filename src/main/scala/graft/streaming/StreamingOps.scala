package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the reference is strictly batch (its
  * chunked iterator is bounded-memory batch execution, SURVEY.md §2.8), but
  * its folder driver (ST3) is naturally a file-source stream, and a
  * production deployment of this engine ingests events continuously. These
  * operators run identically under `readStream` and `read`.
  */
object StreamingOps {

  /** Event-time windowed aggregation with a watermark: per (window,
    * event_type) counts and sums. `tsNanos` is the long-nanos ts column. */
  def windowedEventAgg(events: DataFrame, window: String = "5 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  final case class ChannelState(n: Long, mean: Double, m2: Double)
  final case class ChannelEvent(channel: Int, value: Double)
  final case class ChannelStats(channel: Int, n: Long, mean: Double, std: Double)

  /** Custom streaming state: running per-channel Welford mean/std via
    * mapGroupsWithState — the streaming twin of the baseline z-score stats
    * (A3). Emits updated stats per channel per micro-batch. */
  def runningChannelStats(events: Dataset[ChannelEvent]): Dataset[ChannelStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.channel)
      .mapGroupsWithState[ChannelState, ChannelStats](GroupStateTimeout.NoTimeout) {
        (channel, rows, state: GroupState[ChannelState]) =>
          var s = state.getOption.getOrElse(ChannelState(0L, 0.0, 0.0))
          for (r <- rows) {
            val n1 = s.n + 1
            val d = r.value - s.mean
            val mean1 = s.mean + d / n1
            val m21 = s.m2 + d * (r.value - mean1)
            s = ChannelState(n1, mean1, m21)
          }
          state.update(s)
          ChannelStats(channel, s.n, s.mean,
            if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0)
      }
  }

  /** Streaming windowed DSP ingest: events stream -> bounded SegmentFrame
    * rows, one per (channel, event-time window). The watermark + append mode
    * emit a window's row only once it is complete, so each emitted row is a
    * finished bounded segment — exactly the unit the batch spectral
    * operators consume. Downstream, `DspOperators.resample/applyLinenoiseNotch/
    * waveletTransform` apply UNCHANGED to the streaming DataFrame (they are
    * narrow per-row UDFs), making the full preprocessing pipeline a
    * continuous query: readStream -> windowed segments -> notch -> wavelet
    * -> writeStream. This is the streaming twin of `operators.Windowing`
    * (context-0 form; crossfaded context would arrive with a second
    * overlapping window spec).
    *
    * Samples are ordered by event time inside each window; `rate` is the
    * declared uniform rate (SURVEY.md §1.1 data model). startingTime is the
    * window start in epoch seconds. */
  def windowedSegmentsStream(events: DataFrame, nChannels: Int, rate: Double,
                             windowDur: String = "1 minute",
                             watermark: String = "2 minutes",
                             series: String = "events"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withColumn("channel", pmod(col("user_id"), lit(nChannels)).cast("int"))
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), windowDur),
        col("channel"))
      .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
        s => s.getField("value").cast("double")).as("values"))
      .select(lit(series).as("series"), col("channel"),
        lit(null).cast("int").as("band"), lit(rate).as("rate"),
        (unix_timestamp(col("window.start"))).cast("double").as("startingTime"),
        col("values"))

  /** Drive a streaming query from a static events directory to a memory
    * sink (availableNow semantics) and return the result table. */
  def runToMemory(spark: SparkSession, eventsDir: String, queryName: String,
                  transform: DataFrame => DataFrame,
                  outputMode: OutputMode = OutputMode.Append): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
