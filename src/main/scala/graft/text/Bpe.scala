package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Deterministic byte-pair encoding with a FIXED public merge table — the
  * standard iterative BPE algorithm (Sennrich et al. 2016; the GPT-2
  * tokenizer applies the same merge loop) over a hand-written rank list
  * rather than corpus-learned merges, so an independent SQL oracle can
  * replay the exact merge sequence and hash-match full tokenizations.
  *
  * Algorithm (per word): start from single characters; repeatedly find the
  * adjacent token pair with the LOWEST merge rank (leftmost occurrence on
  * ties) and merge it; stop when no adjacent pair is in the table. Merging
  * one leftmost-best pair at a time is the reference formulation and is
  * what the DuckDB recursive-CTE oracle replays step for step.
  *
  * Scale shape (the 100 TB contract): tokenization is a NARROW one-pass
  * map — no shuffle, no driver state; the merge table rides the closure.
  * Per-task word memoization exploits the Zipf word-frequency law: almost
  * every word repeats, so the merge loop runs once per distinct word per
  * task, not once per occurrence (the same reason HF tokenizers keep an
  * LRU word cache). The alternative plan — distinct words, tokenize,
  * broadcast-join back — pays a corpus-wide shuffle for the same hit rate
  * the local cache gets for free.
  */
object Bpe {

  /** Ordered merge table; rank = index (lower merges first). Chains like
    * t+a→ta, b+le→ble, ta+ble→table exercise multi-level merges and make
    * priority order observable: "scan" must merge a+n (rank 3) BEFORE s+c
    * (rank 24) to reach sc+an. */
  val Merges: Vector[(String, String)] = Vector(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "a" -> "t", "s" -> "t", "e" -> "n",
    "o" -> "r", "l" -> "e", "a" -> "r", "o" -> "l", "o" -> "u",
    "in" -> "g", "an" -> "d", "i" -> "t", "e" -> "s", "a" -> "l",
    "t" -> "a", "b" -> "le", "ta" -> "ble", "c" -> "ol", "s" -> "c",
    "sc" -> "an", "d" -> "at", "dat" -> "a", "q" -> "u", "v" -> "al",
    "u" -> "e", "val" -> "ue")

  private val rank: Map[(String, String), Int] = Merges.zipWithIndex.toMap

  /** Tokenize one word: chars → iterated leftmost-lowest-rank merges. */
  def encodeWord(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var c = 0
    while (c < w.length) { toks += String.valueOf(w.charAt(c)); c += 1 }
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        rank.get((toks(i), toks(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _ =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        toks(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
        toks.remove(bestIdx + 1)
      }
    }
    toks.toArray
  }

  /** (token count, full token stream) for a document: words split on single
    * space (split limit -1: the corpus tokenization idiom — trailing empties
    * kept, matching string_split), each word's tokens joined by ' ', words
    * joined by ' | ' so the stream (and its md5) pins the exact tokenization
    * including word boundaries. `memo` is the per-task word cache. */
  private def encodeDoc(text: String,
                        memo: java.util.HashMap[String, Array[String]]): (Long, String) = {
    if (text == null) return (0L, "")
    val words = text.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.length * 2)
    var n = 0L
    var wi = 0
    while (wi < words.length) {
      var toks = memo.get(words(wi))
      if (toks == null) { toks = encodeWord(words(wi)); memo.put(words(wi), toks) }
      if (wi > 0) sb.append(" | ")
      var ti = 0
      while (ti < toks.length) {
        if (ti > 0) sb.append(' ')
        sb.append(toks(ti))
        ti += 1
      }
      n += toks.length
      wi += 1
    }
    (n, sb.toString)
  }

  /** text → (n_bpe_tokens, token_stream). The memo HashMap is captured in
    * the closure OUTSIDE the lambda: it serializes empty with the task
    * binary and every task deserializes its OWN copy — a per-task word
    * cache with no shared mutable state (a map allocated inside the lambda
    * would be per-row, defeating memoization entirely). */
  def tokenizeUdf: UserDefinedFunction = {
    val memo = new java.util.HashMap[String, Array[String]]()
    udf { (text: String) => encodeDoc(text, memo) }
  }

  /** text → BPE token count only (for budget-shaped operators: packing,
    * mixture weights). Same per-task cache discipline as tokenizeUdf. */
  def tokenCount(text: Column): Column = {
    val memo = new java.util.HashMap[String, Array[String]]()
    val f = udf { (t: String) =>
      if (t == null) 0L
      else {
        val words = t.split(" ", -1)
        var n = 0L
        var wi = 0
        while (wi < words.length) {
          var toks = memo.get(words(wi))
          if (toks == null) { toks = encodeWord(words(wi)); memo.put(words(wi), toks) }
          n += toks.length
          wi += 1
        }
        n
      }
    }
    f(text)
  }

  /** Corpus-learned BPE merges — the TRAINING side of the tokenizer
    * (Sennrich et al. 2016 `learn_bpe`), distributed the way the published
    * algorithm already is: ONE corpus scan builds the (word, count) vocab
    * table, and every merge round runs over that bounded table, never the
    * corpus. Per round: adjacent-symbol pair counts weighted by word count
    * (map-combined aggregation), argmax by (weight DESC, pair ASC) — a
    * 1-row driver fetch — then a NARROW greedy left-to-right merge rewrite
    * of the vocab rows that contain the pair, lineage pinned per round.
    * Words are unit-separator-joined symbol strings (chr(31) between
    * symbols, chr(30) inside emitted pair keys) so the identical fold is
    * replayable in DuckDB via `list_reduce`. Returns one row per round:
    * (round, left_sym, right_sym, pair_weight).
    *
    * 100 TB shape: corpus → vocab is the only corpus-wide shuffle; rounds
    * cost O(|vocab|) narrow work + one bounded shuffle each, and the
    * per-round driver state is a single merge pair. */
  def learnMerges(documents: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.Checkpoints.Pinnable
    val sep = "\u001f" // unit separator: between symbols
    val sp = documents.sparkSession
    require(rounds >= 1 && rounds <= 32, s"rounds out of range: $rounds")
    // vocab: word -> count, word pre-split into the symbol string.
    // chr(31)/chr(30) inside a word would corrupt the encoding; drop such
    // words (none exist in this corpus — the filter is the contract).
    var vocab = documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains(sep) && !col("word").contains("\u001e")) // record sep: inside pair keys
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(
        expr(s"substr(regexp_replace(word, '(.)', '$$1' || chr(31)), " +
          "1, 2 * length(word) - 1)").as("cur"),
        col("cnt"))
      .pin
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab
        .select(split(col("cur"), sep).as("segs"), col("cnt"))
        .filter(size(col("segs")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(segs) - 1), " +
            "i -> concat(element_at(segs, i), chr(30), " +
            "element_at(segs, i + 1)))")).as("pr"), col("cnt"))
        .groupBy("pr").agg(sum("cnt").as("w"))
        .select(expr("split_part(pr, chr(30), 1)").as("l"),
          expr("split_part(pr, chr(30), 2)").as("r2"), col("w"))
        .orderBy(col("w").desc, col("l"), col("r2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r2, w) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((r, l, r2, w))
        val lLit = lit(l)
        val rLit = lit(r2)
        // greedy left-to-right merge of (l, r2) adjacencies: identical to
        // DuckDB's list_reduce over the same segment list (empty-string
        // init replicates reduce-from-first-element semantics; symbols are
        // never empty). The contains() guard skips untouched words — a
        // false positive (substring match across a symbol boundary) just
        // runs the identity fold.
        vocab = vocab.select(
          when(!col("cur").contains(concat(lLit, lit(sep), rLit)), col("cur"))
            .otherwise(aggregate(
              split(col("cur"), sep), lit(""),
              (acc, s) => when(acc === "", s)
                .when((acc === lLit ||
                  acc.endsWith(concat(lit(sep), lLit))) && s === rLit,
                  concat(substring_index_len(acc, lLit), lLit, rLit))
                .otherwise(concat(acc, lit(sep), s))))
            .as("cur"),
          col("cnt")).pin
        r += 1
      }
    }
    import sp.implicits._
    merges.result()
      .toDF("round", "left_sym", "right_sym", "pair_weight")
      .select(col("round").cast("int").as("round"), col("left_sym"),
        col("right_sym"), col("pair_weight"))
      .orderBy("round")
  }

  /** acc minus its trailing `l` symbol: substr(acc, 1, len(acc) - len(l)).
    * (Named helper because the Column form appears mid-fold.) */
  private def substring_index_len(acc: Column, l: Column): Column = {
    import org.apache.spark.sql.functions._
    acc.substr(lit(1), length(acc) - length(l))
  }
}
