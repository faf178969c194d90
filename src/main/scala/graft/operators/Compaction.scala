package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Changelog compaction: reduce an append-only change stream to its
  * latest state per key, with tombstone deletes — the CDC/upsert
  * materialization step between a log-structured ingest and a queryable
  * snapshot.
  *
  * Scale shape: ONE shuffle, and it is an aggregate, not a sort —
  * `max(struct(version..., payload...))` compacts every partition to one
  * candidate row per key map-side, so the exchange carries keys, not
  * versions (a `row_number` window formulation shuffles every version of
  * every key and sorts them per key before discarding all but one; a
  * hot key with millions of updates would own a task). Version columns
  * must totally order a key's updates (a unique sequence/offset as the
  * last column guarantees it).
  */
object Compaction {

  /** Latest row per `keys` by the lexicographic `version` order, dropping
    * keys whose winning row matches `tombstone` (evaluated on the packed
    * `last.<col>` struct fields). Adds `n_versions` = total updates seen
    * per key (tombstones included). */
  def compactLatest(log: DataFrame, keys: Seq[String], version: Seq[String],
                    payload: Seq[String], tombstone: Column): DataFrame = {
    val packed = log.groupBy(keys.map(col): _*)
      .agg(max(struct((version ++ payload).map(col): _*)).as("last"),
        count(lit(1)).as("n_versions"))
    // three-valued logic guard: a tombstone predicate that evaluates to
    // NULL (e.g. a null op column) means "not a delete" — without the
    // coalesce, filter(!NULL) would silently DROP such keys from the
    // snapshot
    packed.filter(!coalesce(tombstone, lit(false)))
  }

  /** SCD Type-2 validity intervals from a change log: each key's updates,
    * totally ordered by (`orderCol`, `tieCol`), become rows valid over
    * [valid_from, valid_to) with the latest version open
    * (valid_to = null, is_current = 1).
    *
    * Scale shape: ONE key shuffle + a per-key sort — the irreducible shape
    * for interval construction (each version needs its successor). Unlike
    * [[compactLatest]] nothing collapses map-side: a key's full history
    * crosses the wire, so version-skewed keys are the operator's honest
    * cost; histories live in the window frame one key at a time, never in
    * a collected buffer. */
  def scdType2(log: DataFrame, keys: Seq[String], orderCol: String,
               tieCol: String, payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    log.select((keys ++ Seq(orderCol, tieCol) ++ payload).map(col): _*)
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }

  /** MERGE INTO semantics: apply a compacted delta to a snapshot.
    * Both frames carry `keys` ++ `payload` columns; `isDelete` is evaluated
    * on the delta. Per key:
    *   delta delete          -> row dropped
    *   delta upsert, no base -> inserted (delta payload)
    *   delta upsert + base   -> updated  (delta payload wins)
    *   no delta              -> kept     (snapshot payload)
    * Returns the merged snapshot plus an `action` column
    * (inserted/updated/kept).
    *
    * Scale shape: one full-outer shuffle join on the key — the
    * merge-on-read shape. A full outer can never broadcast, so at scale
    * pair this with write-time bucketing on the key ([[BucketedLayout]]):
    * co-bucketed snapshot and delta merge with zero exchanges. */
  def mergeUpsert(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                  isDelete: Column, payload: Seq[String]): DataFrame = {
    val s = snapshot.select((keys ++ payload).map(col): _*)
      .withColumn("_s", lit(1))
    val d = delta.withColumn("_del", coalesce(isDelete, lit(false)))
      .select(keys.map(col) ++ Seq(col("_del"), lit(1).as("_d")) ++
        payload.map(c => col(c).as(s"_d_$c")): _*)
    s.join(d, keys, "full_outer")
      .filter(!coalesce(col("_del"), lit(false)))
      .select(keys.map(col) ++
        payload.map(c => coalesce(col(s"_d_$c"), col(c)).as(c)) :+
        when(col("_d").isNull, lit("kept"))
          .when(col("_s").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"): _*)
  }
}
