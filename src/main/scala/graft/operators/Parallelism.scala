package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Scan-stage parallelism repair for CPU-heavy per-row operators.
  *
  * The bench/verify inputs are single-file, single-ROW-GROUP parquet
  * tables, so a scan is at most ONE task whatever
  * `spark.sql.files.maxPartitionBytes` says (a row group is the atomic
  * parquet read unit) — and Spark fuses per-row work (shingling, hashing,
  * regex, levenshtein prep) into the scan stage, serializing it on one
  * core of a 32-core session. Profiled: q41's shingle explode 4.2 s in one
  * task, q96's quantile sampling pass 2.4 s in one task, q231's quadratic
  * levenshtein 2.7 s in one task.
  *
  * [[fanOutScan]] repairs exactly that case and no other: a frame is
  * round-robin repartitioned to the session's shuffle-partition count ONLY
  * when (a) it is batch, (b) its plan is scan-shaped (no join/aggregate/
  * window/sort/repartition — those already introduce exchanges whose
  * downstream side is parallel), and (c) its actual scan parallelism is
  * below the session's shuffle-partition count. On a production corpus the
  * scan has thousands of splits, (c) is false, and this is a no-op — the
  * same size-based dispatch family as `Graph.localEdgeCap`. The extra
  * exchange moves the pre-explosion bytes (the cheapest place to move
  * them, per the optimization-guide rule: move heavy work's INPUT once,
  * small and early).
  *
  * Determinism: round-robin repartition sorts locally before assigning
  * (spark.sql.execution.sortBeforeRepartition, default on), and every
  * caller is partitioning-invariant (group-bys, joins, global-rank
  * selection) — certified by the order-invariance sweep (CPUS 3 vs 13).
  */
object Parallelism {

  def fanOutScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val scanShaped = !df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort |
           _: RepartitionOperation | _: GlobalLimit => true
      case _ => false
    }
    // .rdd is lazy (no job) for scan-shaped plans: no exchange means no
    // adaptive wrapping, so partitions come straight from the file index
    if (scanShaped && df.rdd.getNumPartitions < n) df.repartition(n) else df
  }
}
