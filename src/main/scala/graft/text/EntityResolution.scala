package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — the entity-resolution primitive: candidate
  * pairs are generated ONLY inside blocks (a cheap deterministic key both
  * spellings of an entity agree on), then scored with edit distance.
  *
  * The scale contract is the same as the MinHash/LSH dedup family's:
  * never a global all-pairs — the self-join is equi-keyed on the block, so
  * each block's pair quadratic is bounded by its own size and the shuffle
  * is one block-keyed exchange. Block choice is the recall/cost dial
  * (here: a token of the string; in production: phonetic key, sorted
  * n-gram, or an LSH bucket for longer strings).
  */
object EntityResolution {

  /** Distinct close pairs (dist ≤ maxDist) of `strCol` values sharing
    * `blockCol`: (block, left, right, dist) with left < right. */
  def blockedFuzzyPairs(df: DataFrame, blockCol: Column, strCol: Column,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val names = df.select(blockCol.as("block"), strCol.as("name")).distinct()
    val l = names.select(col("block"), col("name").as("left"))
    val r = names.select(col("block"), col("name").as("right"))
    l.join(r, Seq("block"))
      .filter(col("left") < col("right"))
      .withColumn("dist", levenshtein(col("left"), col("right")))
      .filter(col("dist") <= maxDist)
  }

  /** Per-block match census over [[blockedFuzzyPairs]]: distinct names,
    * close pairs, minimum observed distance. */
  def blockedFuzzyCensus(df: DataFrame, blockCol: Column, strCol: Column,
                         maxDist: Int): DataFrame = {
    val names = df.select(blockCol.as("block"), strCol.as("name")).distinct()
      .groupBy("block").agg(count(lit(1)).as("n_names"))
    val pairs = blockedFuzzyPairs(df, blockCol, strCol, maxDist)
      .groupBy("block")
      .agg(count(lit(1)).as("n_close_pairs"), min("dist").as("min_dist"))
    names.join(pairs, Seq("block"), "left")
      .select(col("block"), col("n_names"),
        coalesce(col("n_close_pairs"), lit(0L)).as("n_close_pairs"),
        coalesce(col("min_dist"), lit(-1)).cast("long").as("min_dist"))
      .orderBy("block")
  }

  /** Sorted-neighborhood candidate pairs: rank rows inside each block by
    * (`order`, id) and pair every row with its next `window` successors —
    * the classic SNM alternative to the block-quadratic
    * [[blockedFuzzyPairs]] when blocks can be large: candidates are
    * window·n instead of sum-of-block-size², at the cost of missing pairs
    * more than `window` ranks apart under the chosen sort key.
    *
    * Scale shape: ONE block-keyed shuffle shared by the rank window and
    * the partner equi-join (rank+1..rank+window exploded on the left —
    * bounded fan-out `window`, never a range join). Per-block sorts
    * parallelize across blocks; nothing is global.
    *
    * Returns (block, id_a, id_b, gap) with id_a ranked before id_b and
    * gap = rank_b − rank_a ∈ [1, window]. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: Column, block: Column,
                              order: Column, window: Int): DataFrame = {
    require(window >= 1 && window <= 64, s"window in [1,64]: $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("block").orderBy(col("ord"), col("id"))
    val ranked = df.select(idCol.as("id"), block.as("block"), order.as("ord"))
      .withColumn("rank", row_number().over(w))
    val probes = ranked.select(col("block"), col("id").as("id_a"),
        col("rank").as("rank_a"),
        explode(sequence(col("rank") + 1, col("rank") + window)).as("rank_b"))
    probes.join(ranked.select(col("block"), col("id").as("id_b"),
          col("rank").as("rank_b")),
        Seq("block", "rank_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        (col("rank_b") - col("rank_a")).as("gap"))
  }
}
