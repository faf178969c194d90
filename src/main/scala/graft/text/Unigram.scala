package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (the SentencePiece unigram algorithm,
  * Kudo 2018, in its deterministic hard-EM form) — the third member of the
  * tokenizer family next to fixed-merge-table BPE (q76) and BPE merge
  * LEARNING (q279):
  *
  *  1. candidate vocabulary = all substrings (length ≤ 4) of the corpus
  *     words with weighted count ≥ `minCount`, plus every single char
  *     (segmentability guarantee); piece costs −ln(count/total) on the e6
  *     integer grid;
  *  2. E-step: each distinct word segments by VITERBI under the current
  *     costs — the DP is pure BIGINT arithmetic (val = cost·64 + 1 packs
  *     (cost, piece-count) lexicographically; ties break to the smallest
  *     split point), so a SQL replica agrees bit-for-bit;
  *  3. M-step: piece counts from the best paths re-normalize into new
  *     costs (add-one smoothing over the fixed vocabulary);
  *  4. after `rounds` E/M passes, report the top pieces by final usage.
  *
  * Scale shape: the corpus is touched once (word census); everything after
  * runs on the DISTINCT-WORD frame weighted by counts — segmenting a word
  * twice is free. The vocabulary (bounded by `minCount`) broadcasts to a
  * narrow Viterbi pass; the only driver state is that vocab cost table —
  * at 100 TB a tokenizer trains on a bounded sample anyway, like every
  * published pipeline. The e6 micro-grid absorbs cross-engine libm `ln`
  * differences (the q258 idiom); every comparison after the grid is
  * integer-exact. */
object Unigram {

  val MaxWordLen = 10
  val MaxPieceLen = 4

  /** Viterbi best segmentation under integer piece costs. dp packs
    * (total cost, piece count) as cost·64 + 1 per piece (words are ≤ 10
    * chars, so the low bits never carry); scanning split points in
    * ascending order with a strict `<` keeps the SMALLEST split on ties —
    * the SQL replica's `ORDER BY val, j` argmin. Single chars are always
    * in vocab, so dp is total. */
  private[text] def viterbi(w: String,
                            cost: scala.collection.Map[String, Long]): Array[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MaxValue)
    val bp = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (dp(j) != Long.MaxValue) {
          val c = cost.getOrElse(w.substring(j, i), -1L)
          if (c >= 0L) {
            val v = dp(j) + c * 64L + 1L
            if (v < dp(i)) { dp(i) = v; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { val j = bp(k); out += w.substring(j, k); k = j }
    out.reverseIterator.toArray
  }

  /** The corpus word census: lowercase-alpha whitespace tokens truncated
    * to [[MaxWordLen]], with weights. One corpus scan; all later passes
    * run on this distinct frame. */
  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$"))
      .select(substring(col("tok"), 1, MaxWordLen).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("c_w"))

  /** Train `rounds` hard-EM passes and report the `topK` pieces by final
    * usage: (piece, n_uses, cost_e6) — cost_e6 is the cost table the final
    * segmentation ran under. */
  def topPieces(docs: DataFrame, minCount: Long = 40L, topK: Int = 25,
                rounds: Int = 2, textCol: String = "text"): DataFrame = {
    require(rounds >= 1, "need at least one E/M round")
    val spark = docs.sparkSession
    import graft.operators.Checkpoints.Pinnable
    val ws = words(docs, textCol).pin // consumers: pieces + every E-step

    val pieceCols = ws
      .select(col("w"), col("c_w"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("c_w"), col("p"),
        explode(array((1 to MaxPieceLen).map(lit): _*)).as("L"))
      .filter(col("p") + col("L") - 1 <= length(col("w")))
      .select(expr("substring(w, p, L)").as("piece"), col("c_w"))
    val vocab = pieceCols.groupBy("piece")
      .agg(sum("c_w").cast("long").as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minCount)
      .pin // consumers: total, cost0, every M-step join
    val total0 = vocab.agg(sum("cnt").cast("long")).head().getLong(0)
    val vSize = vocab.count()

    def collectCosts(costDf: DataFrame): Map[String, Long] =
      costDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // round-0 costs straight from candidate counts
    var costDf = vocab.select(col("piece"),
      expr(s"CAST(floor((-ln(CAST(cnt AS DOUBLE) / CAST($total0 AS DOUBLE)) " +
        "* 1e6) + 0.5) AS BIGINT)").as("cost_e6")).pin

    var nUses: DataFrame = null
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(collectCosts(costDf))
      val encU = udf((w: String) => viterbi(w, bc.value))
      nUses = ws.select(explode(encU(col("w"))).as("piece"), col("c_w"))
        .groupBy("piece").agg(sum("c_w").cast("long").as("n_uses"))
        .pin // consumers: total + the M-step join (and the final report)
      r += 1
      if (r < rounds) {
        val totalR = nUses.agg(sum("n_uses").cast("long")).head().getLong(0)
        costDf = vocab.select(col("piece")).join(nUses, Seq("piece"), "left")
          .select(col("piece"),
            expr(s"CAST(floor((-ln(CAST(coalesce(n_uses, 0) + 1 AS DOUBLE) " +
              s"/ CAST(${totalR + vSize} AS DOUBLE)) * 1e6) + 0.5) AS BIGINT)")
              .as("cost_e6")).pin
      }
    }

    nUses.join(costDf, "piece")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_uses").desc, col("piece"))))
      .filter(col("rk") <= topK)
      .select(col("piece"), col("n_uses"), col("cost_e6"))
      .orderBy(col("n_uses").desc, col("piece"))
  }
}
