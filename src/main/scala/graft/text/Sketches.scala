package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deterministic frequency sketches for corpus-scale counting.
  *
  * The count-min sketch here is the 100 TB answer to "how often does each
  * word/token occur": exact counting shuffles a VOCABULARY-sized key space
  * (the q61 `vocabulary` cost), while the sketch's cell table is bounded at
  * d×m rows no matter the corpus — partial aggregation collapses every
  * partition to at most d×m cells map-side, so the only shuffle is
  * fixed-size. Estimates are one-sided (always >= the true count, over by
  * at most ~e·N/m with probability 1-e^-d, N = total occurrences).
  *
  * Determinism contract: cell (j, pos) for word w sits at pos =
  * md5("j:w") hex 1-15 mod m — the hash60 grid (TextOps.scala:49) expressed
  * as the same pure-codegen conv(substring(md5)) column `sampleHash` uses,
  * so DuckDB replays every cell and estimate exactly (no library sketch
  * with engine-private hashing could be oracle-checked).
  */
object Sketches {

  /** Cell position of `word` in sketch row j: md5("j:word") hex 1-15 as a
    * 60-bit integer mod m — pure codegen, no UDF. */
  private def cellPos(word: Column, j: Int, mCols: Int): Column =
    (conv(substring(md5(concat(lit(s"$j:"), word)), 1, 15), 16, 10)
      .cast("long") % mCols).cast("int")

  /** Build the d×m count-min cell table (j, pos, cnt) over whitespace
    * words. One explode + one FIXED-SIZE shuffle (<= d*m distinct keys, so
    * map-side partials collapse to a bounded table per partition). */
  def countMinCells(docs: DataFrame, d: Int = 3, mCols: Int = 1 << 12,
                    textCol: String = "text"): DataFrame = {
    require(d > 0 && mCols > 0, s"need d>0, mCols>0; got $d, $mCols")
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .select(posexplode(array((0 until d).map(j =>
        cellPos(col("word"), j, mCols)): _*)).as(Seq("j", "pos")))
      .groupBy(col("j"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-min estimates for `words` (small — candidate heavy hitters):
    * min over the d cells each `wordCol` value hashes to. Every other
    * column of `words` passes through (so callers join nothing back —
    * a single reference to an expensive candidate aggregate; `words` must
    * not already have j/pos/cnt columns). The cell table is bounded at
    * d×m rows, so it BROADCASTS — the probe is a map-side join however
    * large the corpus that built it was. Missing cells count 0 (a word
    * the sketch never saw estimates 0, not the min of its present cells). */
  def countMinEstimate(cells: DataFrame, words: DataFrame,
                       d: Int = 3, mCols: Int = 1 << 12,
                       wordCol: String = "word"): DataFrame = {
    require(d > 0 && mCols > 0, s"need d>0, mCols>0; got $d, $mCols")
    val keep = words.columns.toSeq.map(col)
    words
      .select(keep :+ posexplode(array((0 until d).map(j =>
        cellPos(col(wordCol), j, mCols)): _*)).as(Seq("j", "pos")): _*)
      .join(broadcast(cells), Seq("j", "pos"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
