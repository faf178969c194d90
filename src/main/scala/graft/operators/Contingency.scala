package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pearson chi-square test of independence between two categorical
  * columns — the "is this metadata dimension correlated with that one"
  * screen a curation pipeline runs before trusting a stratification
  * (e.g. does quality bucket depend on source, does event type depend on
  * device class).
  *
  * Scale shape: ONE data-sized aggregate (the (a, b) cell counts, map-side
  * partials collapsing to the contingency table's cardinality per
  * partition); everything after runs on category-bounded frames — row and
  * column marginals BROADCAST back onto the cells, the statistic is a sum
  * over |A|×|B| rows. At 100 TB the cost is the one cell shuffle.
  *
  * Determinism contract: observed/marginal counts are exact longs;
  * each cell's (o−e)²/e is one identical IEEE double chain and is floored
  * to a 1e-6 integer grid before summing, so cell order can't move an
  * ulp (the q67/q79 idiom). */
object Contingency {

  /** One-row result: n, table dims, degrees of freedom, chi-square
    * statistic (1e-6 grid).
    *
    * The data is scanned ONCE (the cell agg); marginals, the grand total,
    * and the table dims all come from windows over the cell frame itself —
    * a lazy `cells` referenced from separate marginal subtrees would
    * re-run the data-sized aggregate per reference (the NOTES multi-subtree
    * trap: six scans in the naive formulation). The window stage is
    * single-task by construction, which is exactly right for a frame
    * bounded by |A|×|B|. */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w0 = Window.partitionBy()
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
      .withColumn("rt", sum("o").over(Window.partitionBy("a")))
      .withColumn("ct", sum("o").over(Window.partitionBy("b")))
      .withColumn("n", sum("o").over(w0))
      // collect_set drops NULLs, but a NULL category's cells ARE summed
      // into n and chi2 — count it explicitly so dof stays consistent
      // with the statistic
      .withColumn("n_rows", (size(collect_set("a").over(w0)) +
        max(when(col("a").isNull, 1).otherwise(0)).over(w0)).cast("long"))
      .withColumn("n_cols", (size(collect_set("b").over(w0)) +
        max(when(col("b").isNull, 1).otherwise(0)).over(w0)).cast("long"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val d = col("o").cast("double") - e
    val contribE6 = floor(d * d / e * lit(1e6)).cast("long")
    cells
      .agg(max("n").as("n"), max("n_rows").as("n_rows"),
        max("n_cols").as("n_cols"), sum(contribE6).as("chi2_e6"))
      .select(col("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
        round(col("chi2_e6").cast("double") / lit(1e6), 6).as("chi2"))
  }
}
