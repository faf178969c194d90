package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense time-grid gap fill: turn a sparse event stream into a
  * regular per-key time series (the feature-pipeline step before any
  * rolling/ML consumer that assumes one row per tick — a missing hour
  * must be an explicit zero row, not an absent one).
  *
  * Shape: per-key span agg → `sequence(h0, h1)` explode builds the dense
  * grid; per-(key, tick) counts left-join onto it; missing ticks fill 0.
  * All integer math (`ts div tick` — never a double division near 2^60
  * nanos, where doubles lose ulps).
  *
  * Scale: the grid explode is bounded by each key's span/tick — rows per
  * key = O(span), independent of event count; both the span agg and the
  * count agg shuffle once on the key family, and the grid↔counts join is
  * co-partitioned on (key, tick). A key with a pathological span (years of
  * ticks) bounds its own explode, not the stage: AQE splits oversized
  * partitions. For truly unbounded spans, window the input first and
  * gap-fill per window.
  */
object GapFill {

  /** Per-(key, hour) dense grid with zero-filled event counts. `tsCol`
    * must be long nanos (the engine's normalized contract). */
  def hourlyGrid(events: DataFrame, keyCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    val tick = 3600000000000L // nanos per hour
    val hours = events.withColumn("_hour", expr(s"$tsCol div $tick"))
    val span = hours.groupBy(keyCol)
      .agg(min("_hour").as("_h0"), max("_hour").as("_h1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("_h0"), col("_h1"))).as("hour"))
    val counts = hours.groupBy(col(keyCol), col("_hour").as("hour"))
      .agg(count(lit(1)).as("n"))
    grid.join(counts, Seq(keyCol, "hour"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Gap census over the filled grid: per key, grid length, active ticks,
    * total events, and the longest run of empty ticks.
    *
    * ONE pass over the grid: a running active-tick counter (`seg`) tags
    * every empty tick with the active tick it follows, so a zero run is
    * exactly a (key, seg) group — no second grid computation for the gap
    * side (the naive filter-then-rank formulation plans the whole
    * span+grid+join subtree twice; this shape plans it once, then one
    * window sort and two category-bounded aggregates). Exact integers
    * throughout. */
  def gapCensus(events: DataFrame, keyCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val grid = hourlyGrid(events, keyCol, tsCol)
    val w = Window.partitionBy(keyCol).orderBy("hour")
    grid
      .withColumn("_seg",
        sum(when(col("n") > 0L, 1L).otherwise(0L)).over(w))
      .groupBy(col(keyCol), col("_seg"))
      .agg(count(lit(1)).as("_ticks"),
        sum(when(col("n") > 0L, 1L).otherwise(0L)).as("_active"),
        sum("n").as("_events"),
        sum(when(col("n") === 0L, 1L).otherwise(0L)).as("_zeros"))
      .groupBy(keyCol)
      .agg(sum("_ticks").as("n_hours"),
        sum("_active").as("active_hours"),
        sum("_events").as("n_events"),
        max("_zeros").as("max_gap"))
      .orderBy(keyCol)
  }
}
