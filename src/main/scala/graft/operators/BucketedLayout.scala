package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: the write-time answer to repeated large-scale
  * equi-joins and aggregations on the same key.
  *
  * A shuffle join on two 100 TB fact tables exchanges BOTH sides every
  * time the join runs. Bucketing moves that exchange to WRITE time, once:
  * `bucketBy(n, key)` hash-partitions rows into a fixed number of
  * per-file buckets (plus `sortBy` for sorted runs inside each bucket), so
  * a later SortMergeJoin of two tables bucketed the same way on the same
  * key reads co-located buckets and needs NO Exchange on either side —
  * the plan's join children are bare bucketed scans (spec-certified: zero
  * `Exchange` nodes under the join). Aggregations on the bucket key skip
  * their exchange the same way.
  *
  * This is the engine's data-layout primitive for curated corpora that are
  * joined repeatedly (doc↔metadata, doc↔dedup-cluster, fact↔fact): pay one
  * organized write, then every downstream run saves its largest shuffle.
  * The bucket count is a layout-time choice: at 100 TB pick
  * `buckets ≈ table_bytes / target_bucket_file_bytes` (and both tables
  * MUST agree on it — Spark only elides the exchange when bucket counts
  * match).
  */
object BucketedLayout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * in the session catalog at `path`. Overwrites any previous layout of
    * the same name (idempotent re-layout). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // repartition on the bucket column to the bucket count BEFORE the
    // write: repartition's HashPartitioning and the bucket-id expression
    // are the same Murmur3+pmod, so each task holds exactly one bucket —
    // the sort+encode parallelizes across `buckets` tasks and each bucket
    // stays one file (an under-parallel input otherwise writes and sorts
    // all buckets in its own few tasks: profiled 3.0 s in ONE task on the
    // single-split bench scan). This is the write-side distribution the
    // layout wants at any scale — the same move as a warehouse's
    // hash-distributed write mode.
    df.repartition(buckets, df.col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(tableName)
  }

  /** Inner equi-join of two same-bucketed catalog tables, pinned to the
    * merge-join path (the broadcast path would hide the layout's point at
    * test scale). With matching bucket layouts Catalyst plans this with
    * zero exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, leftKey: String,
                   rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
