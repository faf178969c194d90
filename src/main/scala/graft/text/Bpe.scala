package graft.text

import org.apache.spark.sql.Column
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
}
