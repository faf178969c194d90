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
    * statistic (1e-6 grid). */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("b").agg(sum("o").as("ct"))
    val dims = rowTot.agg(count(lit(1)).as("n_rows"))
      .crossJoin(colTot.agg(count(lit(1)).as("n_cols")))
    val tot = cells.agg(sum("o").as("n"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val d = col("o").cast("double") - e
    val contribE6 = floor(d * d / e * lit(1e6)).cast("long")
    cells.join(broadcast(rowTot), "a")
      .join(broadcast(colTot), "b")
      .crossJoin(broadcast(tot))
      .agg(max("n").as("n"), sum(contribE6).as("chi2_e6"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
        round(col("chi2_e6").cast("double") / lit(1e6), 6).as("chi2"))
  }
}
