package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Text analysis operators — language ID, quality scoring, token counting,
  * fingerprinting — expressed in pure Catalyst string expressions (codegen'd,
  * no UDF) so they both scale and stay DuckDB-oracle-expressible.
  */
object TextAnalysis {

  /** Occurrences of `needle` as a standalone word in `textCol` (padded
    * non-overlapping replace-count — identical semantics in any engine). */
  def wordCount(textCol: Column, needle: String): Column = {
    val padded = concat(lit(" "), textCol, lit(" "))
    val token = s" $needle "
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(token), ""))) /
      token.length).cast("long")
  }

  /** Plain substring replace-count (no regex). */
  def substrCount(textCol: Column, needle: String): Column =
    ((length(textCol) - length(replace(textCol, lit(needle), lit("")))) / needle.length)
      .cast("long")

  /** Stopword inventories per language for the n-gram-heuristic language ID. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "les", "des"),
    "de" -> Seq("der", "und", "das"),
    "zh" -> Seq("的", "了", "是"))

  /** Language scores + argmax prediction (deterministic first-wins
    * tie-break in Stopwords order). */
  def withLanguageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(col(textCol))
    val scored = Stopwords.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang",
        words.map(w => substrCount(concat(lit(" "), t, lit(" ")), s" $w ")).reduce(_ + _))
    }
    val langs = Stopwords.map(_._1)
    val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    val predicted = langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // reverse fold => earlier languages win ties (en before es before fr ...)
    scored.withColumn("predicted_lang", predicted)
  }

  /** Token/char statistics and a deterministic quality score. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    docs
      .withColumn("n_tokens", size(words).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(words)).cast("long"))
      .withColumn("text_chars", length(col(textCol)).cast("long"))
      .withColumn("mean_token_len",
        round((col("text_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"), 4))
      .withColumn("distinct_ratio",
        round(col("n_distinct_tokens").cast("double") / col("n_tokens"), 4))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens").cast("double") / 64) * col("distinct_ratio"), 4))
  }

  /** Content fingerprint: 16-hex-char prefix of md5 of the
    * whitespace-normalized lowercase text. */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint", substring(md5(lower(col(textCol))), 1, 16))
}
