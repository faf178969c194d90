package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capped sessionization: idle-gap sessions with a hard duration cap.
  *
  * Plain gap sessionization is window-expressible (the island trick —
  * q314/q103 use it), but a DURATION CAP is not: a session restarts its
  * clock at the first event past the cap, so each boundary depends on the
  * previous boundary — an inherently sequential recurrence with no
  * window/island rewrite. The classic telemetry semantics (e.g. a 30-min
  * idle timeout plus a hard 4-hour session ceiling) is exactly this shape.
  *
  * Scale shape: the recurrence runs per key over the SORTED per-key
  * timestamp list — one shuffle on the key, then a codegen'd `aggregate`
  * HOF fold whose state is six BIGINTs riding a comma-string accumulator
  * (the q299 Holt idiom, replayable verbatim by DuckDB `list_reduce`).
  * Per-key memory is the key's event-timestamp array — the same bound
  * every per-key window pass in the engine already carries; there is no
  * driver-side loop and no per-event shuffle.
  */
object Sessionize {

  /** Per-key session statistics under (gap, cap) splitting.
    *
    * A new session starts at event `y` when
    *   - `y - last_ts > gapNs` (idle timeout), or
    *   - `y - sess_start > capNs` (duration ceiling — the clock restarts
    *     at `y`, it does not align to fixed cap-width buckets).
    *
    * Returns one row per key: (key, n_events, n_sessions, n_cap_splits,
    * max_sess_events) where `n_cap_splits` counts session starts forced by
    * the cap alone (idle gap still within `gapNs`) — the metric a cap
    * rollout needs (how many sessions exist only because of the ceiling).
    *
    * `orderCol` breaks timestamp ties deterministically. */
  def cappedSessionStats(events: DataFrame, keyCol: String, tsCol: String,
                         orderCol: String, gapNs: Long, capNs: Long): DataFrame = {
    require(gapNs > 0 && capNs > 0, s"need positive gap/cap (got $gapNs, $capNs)")
    // state "n_sessions,sess_start,last_ts,cur_n,max_n,n_cap"
    def f(i: Int) = s"CAST(element_at(split(acc, ','), $i) AS BIGINT)"
    val gap = s"CAST($gapNs AS BIGINT)"
    val cap = s"CAST($capNs AS BIGINT)"
    val fold =
      s"""aggregate(
         |  slice(ser, 2, size(ser) - 1),
         |  concat('1,', CAST(element_at(ser, 1) AS STRING), ',',
         |    CAST(element_at(ser, 1) AS STRING), ',1,1,0'),
         |  (acc, y) -> CASE
         |    WHEN y - ${f(3)} > $gap OR y - ${f(2)} > $cap THEN concat(
         |      CAST(${f(1)} + 1 AS STRING), ',',
         |      CAST(y AS STRING), ',', CAST(y AS STRING), ',1,',
         |      CAST(${f(5)} AS STRING), ',',
         |      CAST(${f(6)} + CASE WHEN y - ${f(3)} <= $gap THEN 1 ELSE 0 END
         |        AS STRING))
         |    ELSE concat(
         |      CAST(${f(1)} AS STRING), ',',
         |      CAST(${f(2)} AS STRING), ',', CAST(y AS STRING), ',',
         |      CAST(${f(4)} + 1 AS STRING), ',',
         |      CAST(greatest(${f(5)}, ${f(4)} + 1) AS STRING), ',',
         |      CAST(${f(6)} AS STRING))
         |  END)""".stripMargin
    // The O(n)-per-key fold is evaluated ONCE into a state column, then a
    // follow-up projection splits out the three stat fields. CollapseProject
    // will not inline a non-cheap expression into multiple consumers, so the
    // fold cannot silently run 3x on the interpreted HOF path.
    events
      .groupBy(col(keyCol))
      .agg(expr(s"transform(sort_array(collect_list(struct(" +
        s"CAST($tsCol AS BIGINT) AS t, $orderCol AS o))), x -> x.t)").as("ser"))
      .select(col(keyCol), size(col("ser")).cast("long").as("n_events"),
        expr(s"split($fold, ',')").as("st"))
      .select(col(keyCol), col("n_events"),
        expr("CAST(element_at(st, 1) AS BIGINT)").as("n_sessions"),
        expr("CAST(element_at(st, 6) AS BIGINT)").as("n_cap_splits"),
        expr("CAST(element_at(st, 5) AS BIGINT)").as("max_sess_events"))
  }
}
