package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The engine's two layouts for multichannel uniformly-sampled time series
  * (SURVEY.md §1.4), with lossless converters.
  *
  * - **SegmentFrame** — one row per channel(-band) trace:
  *   `(series string, channel int, band int?, rate double, startingTime
  *   double, values array<double>)`. The unit of DSP work: every FFT operator
  *   is a narrow per-row map, so Spark parallelizes across channels exactly
  *   like the reference's chunked iterator
  *   (/root/reference/src/process_nwb/wavelet_transform.py:142-235) but
  *   concurrently instead of serially.
  *
  * - **LongFrame** — one row per sample:
  *   `(series, t_idx long, channel, band?, rate, startingTime, value double)`.
  *   The relational layout: CAR is a groupBy(t_idx), z-score a broadcast
  *   join, electrode metadata an equi-join.
  *
  * At 100 TB, segments cap a row at one channel's trace; long recordings
  * should be windowed into bounded segments upstream (series name encodes the
  * window). All operators here are per-segment and don't care.
  */
object Frames {

  val SegmentCols = Seq("series", "channel", "band", "rate", "startingTime", "values")

  /** SegmentFrame -> LongFrame. Narrow (no shuffle): posexplode. */
  def toLong(segments: DataFrame): DataFrame =
    segments.select(
      col("series"), col("channel"), col("band"), col("rate"), col("startingTime"),
      posexplode(col("values")).as(Seq("t_idx", "value")))

  /** LongFrame -> SegmentFrame. One shuffle on the segment key; values are
    * re-ordered by t_idx inside the aggregation, so input order is free. */
  def toSegments(long: DataFrame): DataFrame =
    long.groupBy("series", "channel", "band", "rate", "startingTime")
      .agg(transform(array_sort(collect_list(struct(col("t_idx"), col("value")))),
        s => s.getField("value")).as("values"))

  /** Adapt the harness `events` table (event_id, ts, user_id, event_type,
    * value, props) into a LongFrame: user buckets become channels, per-channel
    * row order becomes t_idx (deterministic: ordered by ts then event_id).
    * `rate` is a declared nominal rate — the reference's model is "uniform
    * sampling declared by metadata", see SURVEY.md §1.1. */
  def eventsToLong(events: DataFrame, nChannels: Int, rate: Double,
                   series: String = "events"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("channel")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("channel", pmod(col("user_id"), lit(nChannels)).cast("int"))
      .withColumn("t_idx", (row_number().over(w) - 1).cast("long"))
      .select(lit(series).as("series"), col("channel"), lit(null).cast("int").as("band"),
        lit(rate).as("rate"), lit(0.0).as("startingTime"), col("t_idx"),
        col("value").cast("double").as("value"))
  }

  /** Per-channel trace count must be equal for a rectangular (n_time, n_ch)
    * matrix; trims every channel to the global minimum length. */
  def rectangularize(long: DataFrame): DataFrame = {
    val minLen = long.groupBy("series", "channel").count()
      .agg(min("count")).first().getLong(0)
    long.filter(col("t_idx") < minLen)
  }

  /** The electrodes dimension (FIXTURES.md §4): id, x, y, z, imp, location,
    * filtering, group — the reference's only relational object
    * (/root/reference/src/process_nwb/utils.py:245-251). */
  def electrodes(spark: org.apache.spark.sql.SparkSession, nChannels: Int): DataFrame = {
    import spark.implicits._
    (0 until nChannels).map(i =>
      (i, 1.0, 2.0, 3.0, -i.toDouble, "cortex", "none", "Grid"))
      .toDF("id", "x", "y", "z", "imp", "location", "filtering", "group")
  }

  /** Attach electrode metadata to a frame keyed by channel: the classic
    * small-dimension broadcast join (SURVEY.md J2). */
  def withElectrodes(df: DataFrame, electrodes: DataFrame): DataFrame =
    df.join(broadcast(electrodes.withColumnRenamed("id", "channel")), Seq("channel"))

  /** Band metadata dimension for a wavelet output (SURVEY.md J3). */
  def bandDimension(spark: org.apache.spark.sql.SparkSession,
                    cfs: Array[Double], sds: Array[Double]): DataFrame = {
    import spark.implicits._
    cfs.indices.map(i => (i, cfs(i), sds(i))).toDF("band", "cf", "sd")
  }
}
