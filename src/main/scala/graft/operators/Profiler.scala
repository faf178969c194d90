package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators: referential-integrity audits and per-column
  * table profiles — the checks a pipeline runs on every ingested
  * partition before anything downstream trusts it.
  *
  * Both report on a canonical LONG grid (ints as-is, doubles
  * floor(×1000), strings by length, event time as nanos): cross-engine
  * string formatting of doubles is not stable, integer grids are — the
  * same contract every oracle-checked operator here uses.
  */
object Profiler {

  /** One row per (child key → parent key) relationship: child rows,
    * orphan rows (no parent), orphan fraction.
    *
    * One scan per relationship: a left join against the DISTINCT parent
    * keys plus a null-count — never a per-orphan materialization. Dim
    * parents broadcast; fact→fact audits shuffle once on the key. */
  def fkAudit(rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(rels.nonEmpty, "fkAudit needs at least one relationship")
    rels.map { case (name, child, childKey, parent, parentKey) =>
      val hits = parent.select(col(parentKey).as("_pk")).distinct()
        .withColumn("_hit", lit(1))
      child.select(col(childKey).as("_ck"))
        .join(hits, col("_ck") === col("_pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_child").cast("double"),
            6).as("orphan_frac"))
    }.reduce(_ union _).orderBy("relationship")
  }

  /** Per-column profile: rows, nulls, distinct non-null values, min/max
    * on the canonical grid. `cols` maps output column names to their
    * canonical long expressions.
    *
    * One column-pruned scan per column (total bytes = the table read
    * once), each a two-level aggregate — values collapse map-side to
    * the column's distinct set, so no countDistinct pair expansion and
    * no whole-column funnel through one task. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { case (name, canon) =>
      df.select(canon.cast("long").as("_v"))
        .groupBy("_v").agg(count(lit(1)).as("_cnt"))
        .agg(sum("_cnt").as("n"),
          coalesce(sum(when(col("_v").isNull, col("_cnt"))), lit(0L))
            .as("n_null"),
          count(when(col("_v").isNotNull, 1)).as("n_distinct"),
          min("_v").as("min_scaled"), max("_v").as("max_scaled"))
        .select(lit(name).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_scaled"), col("max_scaled"))
    }.reduce(_ union _).orderBy("col_name")
  }
}
