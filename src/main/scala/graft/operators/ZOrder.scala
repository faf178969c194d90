package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: multi-dimensional data clustering for
  * scan pruning.
  *
  * Range-partitioning 100 TB by ONE column prunes scans on that column
  * only; filters on a second dimension still read everything. Interleaving
  * the bits of two dimensions into one Morton key and range-partitioning
  * on THAT gives every file a small bounding box in BOTH dimensions, so
  * min/max file statistics prune scans for predicates on either one — the
  * layout trick behind Delta/Iceberg `ZORDER BY`, built here from stock
  * Spark: a pure-codegen bit-interleave expression + `repartitionByRange`
  * + `sortWithinPartitions` (one exchange at layout time, zero runtime
  * machinery).
  *
  * The z-value expression is a fold of shift/and/or ops — whole-stage
  * codegen, no UDF — and deterministic in any engine (integer bit math).
  */
object ZOrder {

  /** Morton key: interleave the low `bits` bits of two non-negative
    * integer columns (`x` at even positions, `y` at odd). Inputs must fit
    * in `bits` bits — mask/bucket them first (locality only needs a
    * bounded grid, not full precision). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Re-layout `df` along the Morton curve of (`x`, `y`): range-partition
    * into `partitions` z-ranges and sort rows inside each, so written
    * files carry tight min/max bounds on both source dimensions. The one
    * shuffle here is the layout's entire cost. */
  def layoutByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                partitions: Int): DataFrame =
    df.withColumn("_z", zValue(x, y, bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
