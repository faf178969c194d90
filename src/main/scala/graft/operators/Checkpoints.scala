package graft.operators

import org.apache.spark.sql.Dataset

/** Lineage-truncation policy for the iterative operators (graph rounds,
  * label propagation, Lloyd iterations, chunked ingest): each round must
  * pin its state so the plan does not grow unboundedly round-over-round.
  *
  * Two pinning modes, selected by runtime conf — the OPERATOR code is
  * identical either way:
  *
  *  - default: `localCheckpoint(eager = true)` — blocks are stored on the
  *    executors that computed them. Fastest (no DFS round-trip) and exactly
  *    right for `local[n]`, but on a multi-executor cluster a lost executor
  *    forces a full recompute of the whole iteration history (the lineage
  *    was truncated, so there is nothing to replay from).
  *  - `spark.conf.set(Checkpoints.DirKey, "hdfs://.../ckpt")`: RELIABLE
  *    checkpointing — each pinned round is materialized to the shared
  *    checkpoint directory, so executor loss costs one round re-read, not a
  *    cascade. This is the 100 TB/1000-executor setting; the conf is read
  *    per call so a session can flip it between jobs.
  *
  * The pinned result is byte-identical under both modes (checkpointing only
  * changes WHERE the blocks live), so correctness certification at local
  * scale carries over to the reliable path — one spec runs the same
  * operator under both and asserts equality.
  */
object Checkpoints {

  /** Conf key: set to a durable directory (HDFS/S3A/local path) to switch
    * every `pin` from executor-memory localCheckpoint to reliable
    * checkpointing into that directory. Unset or empty = localCheckpoint. */
  val DirKey = "graft.checkpoint.dir"

  // setCheckpointDir QUALIFIES the path (scheme + a generated UUID subdir),
  // so the context's current dir cannot be string-compared against the conf
  // value. Remember, per SparkContext, the exact conf string that produced
  // the current checkpoint dir and re-set only when the conf value changes.
  private val appliedDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** RDD-level twin of [[Pinnable.pin]] for helpers that construct their
    * pinned frame manually (Graph.pinByKey via the LogicalRDD shim): the
    * same conf-selected policy — localCheckpoint by default, reliable
    * checkpointing into [[DirKey]] when set — applied to a raw RDD. The
    * call is EAGER (runs one count action) and returns once the blocks /
    * checkpoint files exist. */
  def pinRdd(spark: org.apache.spark.sql.SparkSession,
             rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        val key = sc.applicationId
        if (Checkpoints.appliedDir.get(key) != dir ||
            sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          Checkpoints.appliedDir.put(key, dir)
        }
        // same recompute-avoidance as the Dataset path: cache across the
        // action job and the checkpoint-write job, then release
        if (rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE) {
          rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
          try { rdd.checkpoint(); rdd.count() }
          finally rdd.unpersist(blocking = false)
        } else { rdd.checkpoint(); rdd.count() }
      case None =>
        rdd.localCheckpoint()
        rdd.count()
    }
  }

  implicit final class Pinnable[T](private val ds: Dataset[T]) extends AnyVal {

    /** Truncate lineage eagerly under the session's configured policy. */
    def pin: Dataset[T] = {
      val spark = ds.sparkSession
      spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          val key = sc.applicationId
          if (Checkpoints.appliedDir.get(key) != dir ||
              sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            Checkpoints.appliedDir.put(key, dir)
          }
          // RDD.checkpoint's write job RECOMPUTES the lineage past the
          // last shuffle boundary (Spark's scaladoc: "strongly recommended
          // that this RDD is persisted in memory, otherwise saving it on a
          // file will require recomputation") — the eager action pays the
          // result stage twice. Cache across the two jobs, then release;
          // skipped when the caller already persisted (their cache, their
          // lifecycle).
          if (ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
            ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            try ds.checkpoint(eager = true)
            finally ds.unpersist(blocking = false)
          } else ds.checkpoint(eager = true)
        case None =>
          ds.localCheckpoint(eager = true)
      }
    }

  }

  // A serialized-storage variant (`localCheckpoint(eager, MEMORY_AND_DISK_SER)`)
  // was trialled for q306's pair/item frames (r18): it neither narrowed the
  // wall band nor beat simply DROPPING the pins — q306 is a DAG, not a loop,
  // so AQE exchange reuse shares the repeated subtrees within the single
  // action and the eager checkpoint writes were pure overhead (quiet walls
  // 8.7/9.3/6.5 s pinned vs 5.9/7.4/6.5 s unpinned, NOTES r18). Pinning is
  // for ITERATIVE operators whose lineage would otherwise grow per round.
}
