package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — each left row matched to the LATEST right row whose order
  * key is <= the left row's, per equi-key. The operator Spark lacks
  * natively (and the brief's canonical custom-operator example),
  * re-expressed Spark-first by COMPOSITION instead of a custom physical
  * operator:
  *
  * union both sides into one stream → ONE hash shuffle on the equi-key →
  * per-key sort on (ord, side, tie) → `last(right-payload, ignoreNulls)`
  * over the unbounded-preceding frame carries the most recent right row
  * forward → keep left rows. The inequality dimension resolves inside the
  * sort, so there is no join operator at all: no range-join explosion, no
  * per-row subquery, and both inputs cross the wire exactly once. At
  * cluster scale the single exchange is the theoretical minimum for an
  * un-bucketed as-of; with both sides bucketed by the key even that
  * disappears.
  *
  * Determinism: ties on `ordCol` order right-before-left (a right row at
  * exactly the left's timestamp matches), and among right rows by
  * `tieCol` — the last in that order wins, so results are independent of
  * partitioning and arrival order.
  */
object AsOf {

  /** @param rightPayload right columns to carry onto matched left rows
    *                     (emitted as `asof_<name>`, null when no match)
    * @param keys equi-join columns present on both sides
    * @param ordCol the as-of dimension (numeric/orderable), both sides
    * @param tieCol deterministic tie-break column, both sides */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ordCol: String, tieCol: String,
               rightPayload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val lSchema = org.apache.spark.sql.types.StructType(
      left.schema.fields.map(_.copy(nullable = true)))
    val rSchema = org.apache.spark.sql.types.StructType(
      right.select(rightPayload.map(col): _*).schema.fields
        .map(_.copy(nullable = true)))
    val lT = left.select(
      keys.map(col) ++ Seq(col(ordCol).as("_ord"), col(tieCol).as("_tie"),
        lit(1).as("_side"),
        struct(leftCols.map(col): _*).cast(lSchema).as("_lp"),
        lit(null).cast(rSchema).as("_rp")): _*)
    val rT = right.select(
      keys.map(col) ++ Seq(col(ordCol).as("_ord"), col(tieCol).as("_tie"),
        lit(0).as("_side"), lit(null).cast(lSchema).as("_lp"),
        struct(rightPayload.map(col): _*).cast(rSchema).as("_rp")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lT.unionByName(rT)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = leftCols.map(c => col(s"_lp.$c").as(c)) ++
      rightPayload.map(c => col(s"_asof.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }
}
