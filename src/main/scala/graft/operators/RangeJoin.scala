package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — left rows matched to right rows whose order key
  * falls in [left.ord + lower, left.ord + upper], per equi-key. Spark
  * plans a raw range predicate as a nested-loop or a sort-merge with
  * per-row rescans; this composition turns it into a plain HASH join:
  *
  * bin the ord dimension at width = (upper - lower); the left row explodes
  * to the (at most two) adjacent bins its window can touch, the right row
  * keeps its own bin, the join runs on (keys, bin) — a codegen'd hash
  * join on an equi-key — and the exact range predicate filters inside the
  * join. Duplication is bounded at 2× the left side (never
  * data-dependent), every true match shares a (key, bin) with its left
  * row, and skew follows the equi-key like any hash join (AQE skew-join
  * applies). Binning is exact integer floor-division, so nano-scale longs
  * never round through a double.
  */
object RangeJoin {

  /** floor(a / b) for LONG columns, exact at any magnitude: subtract the
    * non-negative pmod remainder, then divide as DECIMAL — exact rational
    * arithmetic, never a double (long `Column.divide` detours through a
    * double and can truncate to q-1 on nano-scale values). */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** @param lower,upper window relative to left.ord (both inclusive)
    * @param rightPayload right columns carried onto matches (as `r_<name>`)
    * @param ordCol LONG order column on both sides */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                ordCol: String, lower: Long, upper: Long,
                rightPayload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equi-key")
    require(lower <= upper, s"empty window: [$lower, $upper]")
    val width = math.max(1L, upper - lower)
    val lP = left.select(
      struct(left.columns.map(col): _*).as("_lp") +:
        keys.map(k => col(k).as(s"_lk_$k")) :+
        col(ordCol).cast("long").as("_lord"): _*)
      .withColumn("_bin", explode(sequence(
        floorDiv(col("_lord") + lit(lower), width),
        floorDiv(col("_lord") + lit(upper), width))))
    val rP = right.select(
      keys.map(k => col(k).as(s"_rk_$k")) ++ Seq(
        col(ordCol).cast("long").as("_rord"),
        struct(rightPayload.map(col): _*).as("_rp")): _*)
      .withColumn("_rbin", floorDiv(col("_rord"), width))
    val cond = keys.map(k => col(s"_lk_$k") === col(s"_rk_$k"))
      .reduce(_ && _) &&
      col("_bin") === col("_rbin") &&
      col("_rord").between(col("_lord") + lit(lower), col("_lord") + lit(upper))
    val out = left.columns.toSeq.map(c => col(s"_lp.$c").as(c)) ++
      rightPayload.map(c => col(s"_rp.$c").as(s"r_$c"))
    lP.join(rP, cond).select(out: _*)
  }
}
