package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
