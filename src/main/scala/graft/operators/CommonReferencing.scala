package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Common average referencing — the engine's flagship cross-channel
  * aggregate, in pure Spark SQL (no UDF, fully codegen-able).
  *
  * Semantics (ref /root/reference/src/process_nwb/common_referencing.py:11-68):
  * per time point, sort the channel values, drop
  * `nExclude = ceil(nChannels*(1-meanFrac)/2)` from each end, average the
  * middle; `meanFrac = 1` degenerates to the plain mean. Nulls are skipped
  * like np.nanmean. The subtraction broadcasts the per-time aggregate back
  * onto every channel row.
  *
  * Scale shape: one shuffle on (series, t_idx) for the aggregate; the
  * add-back join shuffles the long frame once more unless AQE broadcasts the
  * (n_time-rows) CAR side, which it will whenever n_time is modest. This is
  * the reference's only cross-channel reduction (SURVEY.md §1.3), so the
  * pipeline pays for time-axis partitioning exactly once.
  */
object CommonReferencing {

  /** Trimmed-mean aggregation column over a grouped `value`. */
  def trimmedMeanAgg(nChannels: Int, meanFrac: Double = 0.95): Column = {
    if (meanFrac == 1.0) avg(col("value"))
    else {
      val nExclude = math.ceil(nChannels * (1.0 - meanFrac) / 2.0).toInt
      require(2 * nExclude < nChannels,
        s"meanFrac=$meanFrac excludes all $nChannels channels")
      val kept = slice(sort_array(collect_list(col("value"))),
        nExclude + 1, nChannels - 2 * nExclude)
      aggregate(kept, lit(0.0), (a, x) => a + x) / size(kept)
    }
  }

  /** Per-(series, t_idx) CAR frame: columns (series, t_idx, car). */
  def car(long: DataFrame, nChannels: Int, meanFrac: Double = 0.95): DataFrame =
    long.groupBy("series", "t_idx")
      .agg(trimmedMeanAgg(nChannels, meanFrac).as("car"))

  /** Subtract the CAR from every channel sample of a LongFrame. */
  def subtractCar(long: DataFrame, nChannels: Int, meanFrac: Double = 0.95): DataFrame =
    long.join(car(long, nChannels, meanFrac), Seq("series", "t_idx"))
      .withColumn("value", col("value") - col("car"))
      .drop("car")

  /** Convenience: subtract CAR on a SegmentFrame (explode -> subtract ->
    * re-segment; two shuffles, unavoidable for a cross-channel op on
    * channel-partitioned data). */
  def subtractCarSegments(segments: DataFrame, nChannels: Int,
                          meanFrac: Double = 0.95): DataFrame = {
    import graft.model.Frames
    Frames.toSegments(subtractCar(Frames.toLong(segments), nChannels, meanFrac))
  }
}
