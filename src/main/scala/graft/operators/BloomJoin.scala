package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Semi-join reduction: prune the BIG side of an equi-join with a
  * broadcast Bloom filter of the small side's keys BEFORE the join's
  * shuffle.
  *
  * At 100 TB the expensive part of `fact ⋈ dim-subset` is shuffling the
  * fact side; when the dim subset matches only a fraction of fact rows,
  * most of that exchange is wasted on rows the join will drop. A Bloom
  * bitset of the dim keys (mBits/8 bytes, built with the same
  * partition-OR + treeReduce pass as the q81 decontamination filter —
  * the driver never sees a key list) broadcasts to every task and
  * filters fact rows during the SCAN, so the shuffle carries only
  * probable matches.
  *
  * Correctness is layout- and parameter-independent: the filter has no
  * false negatives (every true match survives) and the join itself drops
  * the false positives, so the result EQUALS the plain join for any
  * (mBits, kHashes) — which is exactly how q125's oracle certifies it.
  * Spark's own runtime row-group bloom pushdown covers simple cases;
  * this operator makes the reduction explicit, tunable, and usable where
  * AQE can't see it (pre-shuffle in a multi-stage pipeline).
  */
object BloomJoin {

  /** Inner equi-join `big ⋈ small` on big(`bigKey`) = small(`smallKey`)
    * with the big side Bloom-pruned before the shuffle.
    *
    * Broadcast lifetime: the bitset broadcast is referenced only by the
    * returned plan's probe UDF; when the caller drops the DataFrame,
    * Spark's ContextCleaner reclaims it with the closure. Callers looping
    * over MANY large bitsets in one long-lived session should hold the
    * results no longer than needed (each pins mBits/8 bytes until
    * collected). */
  def bloomPrunedEquiJoin(big: DataFrame, small: DataFrame,
                          bigKey: String, smallKey: String,
                          mBits: Int = 1 << 20,
                          kHashes: Int = 3): DataFrame = {
    require(mBits > 0 && kHashes > 0, s"need mBits>0, kHashes>0; got $mBits, $kHashes")
    val spark = big.sparkSession
    val nWords = (mBits + 63) >>> 6
    val posUdf = udf((s: String) =>
      Array.tabulate(kHashes)(j => (TextOps.hash60(s, j) % mBits).toInt))
    val partials = small
      .select(col(smallKey).cast("string").as("_k")).distinct()
      .select(explode(posUdf(col("_k"))).as("pos"))
      .as[Int](org.apache.spark.sql.Encoders.scalaInt)
      .rdd
      .mapPartitions { it =>
        val w = new Array[Long](nWords)
        while (it.hasNext) { val p = it.next(); w(p >>> 6) |= 1L << (p & 63) }
        Iterator.single(w)
      }
    val bitWords =
      if (partials.getNumPartitions == 0) new Array[Long](nWords)
      else partials.treeReduce({ (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }, depth = 2)
    val bits = spark.sparkContext.broadcast(bitWords)
    val mightContain = udf { (s: String) =>
      if (s == null) false
      else {
        val w = bits.value
        var hit = true
        var j = 0
        while (hit && j < kHashes) {
          val p = (TextOps.hash60(s, j) % mBits).toInt
          if ((w(p >>> 6) & (1L << (p & 63))) == 0L) hit = false
          j += 1
        }
        hit
      }
    }
    big.filter(mightContain(col(bigKey).cast("string")))
      .join(small, big(bigKey) === small(smallKey))
  }
}
