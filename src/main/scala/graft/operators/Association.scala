package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining: co-occurrence counts and lift for
  * item pairs inside baskets — the recommendation/affinity primitive.
  *
  * Scale shape: the pair self-join is co-partitioned on the basket key,
  * so each basket's quadratic is bounded by its own size (order baskets
  * are small; a pathological mega-basket bounds its own task, the
  * blocked-pairs contract). The marginal subtrees (item counts ×2 join
  * sides, basket count) re-derive the distinct frame — plan-audited:
  * column pruning specializes each subtree's scan, so Catalyst does NOT
  * reuse the exchange — but every one of those scans is pruned to the
  * two key columns, so the extra passes read keys, never the fact
  * payload; the expensive products (distinct pairs, pair counts) are
  * each computed once. Lift ranks on a PURE INTEGER grid:
  * floor(c_ab·n·10⁶ / (c_a·c_b)) — no doubles anywhere, so no engine
  * can disagree on the ranking.
  */
object Association {

  /** Top-`topK` item pairs by lift (then pair id) among pairs co-occurring
    * in at least `minPairCount` baskets. Output: item_a < item_b,
    * n_baskets, c_a, c_b, c_ab, lift_e6. */
  def liftPairs(baskets: DataFrame, basketCol: Column, itemCol: Column,
                minPairCount: Long, topK: Int): DataFrame = {
    val items = baskets.select(basketCol.as("b"), itemCol.as("i")).distinct()
    val l = items.select(col("b"), col("i").as("item_a"))
    val r = items.select(col("b"), col("i").as("item_b"))
    val pairCounts = l.join(r, Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
    val itemCounts = items.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val nBaskets = items.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairCounts
      .join(broadcast(itemCounts.select(col("i").as("item_a"),
        col("c").as("c_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("i").as("item_b"),
        col("c").as("c_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      // the numerator c_ab*n*1e6 passes 2^63 once baskets reach billions:
      // compute the integer division on DECIMAL(38,0) (exact to 38 digits,
      // matching the oracle's HUGEINT) so the grid survives at scale
      // instead of wrapping
      .withColumn("lift_e6",
        expr("""CAST(CAST(c_ab AS DECIMAL(38,0)) * CAST(n_baskets AS DECIMAL(38,0))
               | * 1000000 div (CAST(c_a AS DECIMAL(38,0)) * CAST(c_b AS DECIMAL(38,0)))
               | AS BIGINT)""".stripMargin.replace("\n", " ")))
      .select(col("item_a"), col("item_b"), col("n_baskets"), col("c_a"),
        col("c_b"), col("c_ab"), col("lift_e6"))
      .orderBy(col("lift_e6").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
