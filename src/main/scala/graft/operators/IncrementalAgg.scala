package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) aggregate maintenance: algebraic
  * aggregate STATES (n, sum, min, max) that merge without rescanning the
  * data they summarize.
  *
  * The 100 TB shape this enables: keep per-partition-unit states (e.g. per
  * day) materialized; when a new day lands, aggregate ONLY that day and
  * merge its states into the rollup — the historical corpus is never read
  * again. Correctness rests on the aggregates being commutative monoids:
  * (n, sum) add, (min, max) lattice-join, so any merge tree over any
  * slicing yields the same state as a direct aggregation (certified by
  * q158's oracle, which IS the direct aggregation). Averages and other
  * derived values are computed from merged states at read-out, never
  * stored (a stored avg doesn't merge).
  */
object IncrementalAgg {

  /** Aggregate `df` to mergeable states per `keys`:
    * (st_n, st_sum, st_min, st_max) over `valueCol`. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(valueCol).as("st_n"), sum(valueCol).as("st_sum"),
        min(valueCol).as("st_min"), max(valueCol).as("st_max"))

  /** Re-aggregate a state table to coarser `keys` (drop grouping columns):
    * the rollup step of incremental maintenance. */
  def rollupStates(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*)
      .agg(sum("st_n").as("st_n"), sum("st_sum").as("st_sum"),
        min("st_min").as("st_min"), max("st_max").as("st_max"))

  /** Merge two state tables with the same keys — the delta-apply step. */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    rollupStates(a.unionByName(b), keys)
}
