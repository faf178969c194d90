package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted shuffle equi-join.
  *
  * A shuffle join on a skewed key puts every row of a hot key through ONE
  * reducer — the 100 TB failure mode where a handful of straggler tasks
  * own terabytes (a `documents JOIN per_source_stats` on `source` sends
  * whole sources to single tasks). When the small side fits in memory the
  * answer is `broadcast()`; when it doesn't (or deterministic partitioning
  * is required and AQE's runtime skew split can't apply, e.g. bucketed
  * inputs or a streaming sink), salting restores parallelism:
  *
  *  - every LEFT row gets a salt in [0, saltFactor) derived from a
  *    deterministic well-distributed expression over its own columns
  *    (pmod(hash(saltSrc), saltFactor)), splitting each hot key's rows
  *    across saltFactor sub-buckets;
  *  - the RIGHT side is replicated saltFactor times (explode of a
  *    sequence — cost saltFactor × |right|, the price of the technique,
  *    which is why it fits a BIG-left / small-but-unbroadcastable-right
  *    shape);
  *  - the equi-join runs on keys :+ salt, so each (key, salt) bucket is
  *    1/saltFactor of the hot key's rows.
  *
  * The result is row-for-row the plain inner equi-join on `keys` — the
  * salt never changes which pairs match, only how they distribute
  * (spec-certified equal; q93 oracle-certified against a plain SQL join).
  */
object SkewJoin {

  /** Inner equi-join on `keys` with left-side salting and right-side
    * replication. `saltSrc` must be deterministic per left row (a unique
    * id column is ideal; any column works — correctness never depends on
    * the salt's distribution, only evenness does). `forceShuffle` pins the
    * shuffle-join path (merge hint) so the salted plan is actually
    * exercised where the optimizer would otherwise broadcast. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      saltSrc: Column, saltFactor: Int,
                      forceShuffle: Boolean = false): DataFrame = {
    require(saltFactor > 0, s"need saltFactor>0; got $saltFactor")
    require(keys.nonEmpty, "need at least one join key")
    val l = left.withColumn("_salt", pmod(hash(saltSrc), lit(saltFactor)))
    val r0 = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val r = if (forceShuffle) r0.hint("merge") else r0
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
