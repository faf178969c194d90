package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Per-document word/n-gram repetition counts produced by one narrow pass
  * (public so Catalyst codegen can construct it — see NOTES.md). */
case class RepetitionCounts(
  n_words: Long,
  top_word_count: Long,
  n_distinct_words: Long,
  n_2grams: Long,
  n_distinct_2grams: Long)

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination (n-gram overlap against an eval set), Gopher-style
  * repetition metrics, and deterministic hash-based mixture sampling.
  *
  * Scale shapes (the 100 TB contract):
  *  - decontamination: the eval/benchmark side is benchmark-sized (MBs-GBs),
  *    so its distinct n-gram set broadcasts; the corpus side is one narrow
  *    scan + explode into a broadcast hash join, then a per-doc count whose
  *    partial aggregation runs map-side — the only shuffle carries tiny
  *    (doc_id, two counts) rows.
  *  - repetition: per-document metrics need NO shuffle at all — one UDF pass
  *    per doc builds the counts in a local hash map (explode+groupBy would
  *    pay two corpus-sized shuffles for the same answer).
  *  - mixture sampling: a pure codegen'd Catalyst filter (md5-derived
  *    uniform vs a per-group integer threshold) — sampling stays a narrow
  *    scan, no shuffle, and the same doc set is kept on any cluster layout.
  */
object Curation {

  // --- benchmark decontamination ------------------------------------------

  /** Per-training-doc n-gram overlap with an eval/benchmark set.
    *
    * Output: (idCol, n_ngrams, n_shared, contamination) — one row per train
    * doc with at least `n` words; `contamination` = shared distinct n-grams /
    * distinct n-grams, rounded to 6.
    *
    * Mirrors the n-gram-overlap decontamination used for LM training sets
    * (cf. the 13-gram eval-overlap filter in the GPT-3 appendix); `n` is a
    * parameter because harness docs are 25-100 words.
    */
  def decontaminationReport(train: DataFrame, eval: DataFrame, n: Int,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val shingles = udf((t: String) => TextOps.shingleArray(t, n))
    val trainG = train.select(col(idCol), explode(shingles(col(textCol))).as("_shingle"))
    val evalG = eval.select(explode(shingles(col(textCol))).as("_shingle"))
      .distinct()
      .withColumn("_hit", lit(1))
    trainG
      .join(broadcast(evalG), Seq("_shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("_hit")).as("n_shared"))
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_ngrams"), 6))
  }

  // --- repetition metrics (Gopher-style quality rules) ---------------------

  private val repetitionCountsUdf = udf { (text: String) =>
    val words = if (text == null || text.isEmpty) Array.empty[String] else text.split(" ")
    val nWords = words.length.toLong
    val wc = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < words.length) {
      wc.put(words(i), wc.getOrDefault(words(i), 0L) + 1L)
      i += 1
    }
    var top = 0L
    val it = wc.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > top) top = v }
    val n2 = math.max(0L, nWords - 1)
    val g2 = new java.util.HashSet[String]()
    i = 0
    while (i < words.length - 1) { g2.add(words(i) + " " + words(i + 1)); i += 1 }
    RepetitionCounts(nWords, top, wc.size.toLong, n2, g2.size.toLong)
  }

  /** Gopher-style repetition metrics per document, one narrow UDF pass:
    * top_word_frac (most frequent word's share), dup_word_frac
    * (1 - distinct/total words), dup_2gram_frac (1 - distinct/total
    * word 2-grams), and a 0/1 `repetitive` flag on the ROUNDED fractions
    * (both engines compare identical 6-digit values, so the flag can't
    * straddle a float boundary).
    */
  def withRepetitionMetrics(docs: DataFrame,
                            topWordFracMax: Double = 0.12,
                            dup2gramFracMax: Double = 0.05,
                            textCol: String = "text"): DataFrame = {
    val c = repetitionCountsUdf(col(textCol))
    val twf = round(col("top_word_count").cast("double") / col("n_words"), 6)
    val dwf = round(lit(1.0) - col("n_distinct_words").cast("double") / col("n_words"), 6)
    val d2f = round(
      when(col("n_2grams") > 0,
        lit(1.0) - col("n_distinct_2grams").cast("double") / col("n_2grams"))
        .otherwise(lit(0.0)), 6)
    docs
      .withColumn("_rep", c)
      .select(col("*"), col("_rep.*"))
      .drop("_rep")
      .withColumn("top_word_frac", twf)
      .withColumn("dup_word_frac", dwf)
      .withColumn("dup_2gram_frac", d2f)
      .withColumn("repetitive",
        (col("top_word_frac") >= topWordFracMax ||
          col("dup_2gram_frac") >= dup2gramFracMax).cast("int"))
  }

  // --- deterministic mixture sampling --------------------------------------

  /** 60-bit md5-derived uniform for a document id: first 15 hex chars of
    * md5("mix:<id>") as an integer — the TextOps.hash60 derivation, built
    * from codegen'd Catalyst string functions so a DuckDB oracle reproduces
    * it bit-for-bit (`('0x' || substr(md5('mix:' || doc_id), 1, 15))::UBIGINT`).
    */
  def sampleHash(idCol: Column): Column =
    conv(substring(md5(concat(lit("mix:"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Threshold for rate r: keep iff sampleHash < floor(r * 2^60). Selection
    * compares INTEGERS, never floats, so engines can't disagree at the
    * boundary. */
  def rateThreshold(rate: Double): Long =
    math.floor(rate * 1152921504606846976.0 /* 2^60 */).toLong

  /** Deterministic domain-mixture sampling: keep each doc iff its md5-derived
    * uniform falls under its group's rate. Docs whose group has no configured
    * rate get `defaultRate`. Pure narrow filter — the 100 TB shape for
    * corpus re-weighting (no shuffle, reproducible on any cluster layout,
    * stable under re-runs and re-partitioning).
    */
  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
                    defaultRate: Double = 0.0,
                    groupCol: String = "lang",
                    idCol: String = "doc_id"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(rateThreshold(r))).otherwise(acc)
    }
    docs.filter(sampleHash(col(idCol)) < threshold)
  }
}
