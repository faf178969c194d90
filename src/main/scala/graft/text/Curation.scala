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
    // null-tolerant like repetitionCountsUdf: a null text doc in either
    // corpus contributes no shingles instead of NPE-ing the whole job
    val shingles = udf((t: String) =>
      if (t == null) Array.empty[String] else TextOps.shingleArray(t, n))
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

  /** Bloom-filter decontamination — the scale tier between q57's exact
    * broadcast set and q66's MinHash band-join: when the eval side's
    * distinct n-gram STRINGS are too big to broadcast (100 M 13-grams
    * ≈ 5 GB) but a bitset is not (10 bits/element ≈ 125 MB), probe a
    * broadcast Bloom filter instead. No false negatives — every truly
    * shared n-gram is flagged — so `contamination_ub` is a sound UPPER
    * bound on q57's exact `contamination` (conservative for dropping);
    * false positives inflate it by ~(1-e^(-kn/m))^k.
    *
    * Determinism contract: bit j of shingle s sits at hash60(s, j) mod
    * mBits — md5-derived, so DuckDB replays every position and the q81
    * oracle hash-matches the flag counts exactly (the filter itself is a
    * pure function of the eval set, not of partitioning or arrival order).
    *
    * Scale shape: the eval side is one explode → distinct → per-partition
    * bitset OR → treeReduce OR, so what moves is mBits/8-byte ARRAYS
    * (32 MiB at 2^28), never a position list — bounded by the filter
    * size at every hop including the driver; the bitset then broadcasts
    * once. The train side is ONE narrow scan with a per-doc probe UDF —
    * zero shuffle, no explode, no join. Output rows are one per train
    * doc with >= n words, matching q57's row universe. Size m at ~10
    * bits per expected distinct eval n-gram: an overloaded filter
    * degrades toward flagging everything (soak-measured at 4 bits/elem:
    * fp ≈ 0.94). */
  def bloomDecontaminationReport(train: DataFrame, eval: DataFrame, n: Int,
                                 mBits: Int = 1 << 20, kHashes: Int = 3,
                                 textCol: String = "text",
                                 idCol: String = "doc_id"): DataFrame = {
    require(mBits > 0 && kHashes > 0, s"need mBits>0, kHashes>0; got $mBits, $kHashes")
    val spark = train.sparkSession
    val shingles = udf((t: String) =>
      if (t == null) Array.empty[String] else TextOps.shingleArray(t, n))
    val posUdf = udf((s: String) =>
      Array.tabulate(kHashes)(j => (TextOps.hash60(s, j) % mBits).toInt))
    // distributed bitset build: each partition ORs its positions into a
    // local mBits-bit array, treeReduce ORs the partials off-driver — the
    // driver receives ~depth-many mBits/8-byte arrays (32 MiB at 2^28),
    // never a position list (a row collect at 10-bits/element capacity
    // would be tens of millions of driver-side Rows)
    val nWords = (mBits + 63) >>> 6
    val posPartials = eval
      .select(explode(shingles(col(textCol))).as("_sh")).distinct()
      .select(explode(posUdf(col("_sh"))).as("pos"))
      .as[Int](org.apache.spark.sql.Encoders.scalaInt)
      .rdd
      .mapPartitions { it =>
        val w = new Array[Long](nWords)
        while (it.hasNext) { val p = it.next(); w(p >>> 6) |= 1L << (p & 63) }
        Iterator.single(w)
      }
    val bitWords =
      if (posPartials.getNumPartitions == 0) new Array[Long](nWords)
      else posPartials.treeReduce({ (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }, depth = 2)
    val bits = spark.sparkContext.broadcast(bitWords)
    val probe = udf { (t: String) =>
      val sh = if (t == null) Array.empty[String] else TextOps.shingleArray(t, n)
      val w = bits.value
      var flagged = 0L
      var i = 0
      while (i < sh.length) {
        var hit = true
        var j = 0
        while (hit && j < kHashes) {
          val p = (TextOps.hash60(sh(i), j) % mBits).toInt
          if ((w(p >>> 6) & (1L << (p & 63))) == 0L) hit = false
          j += 1
        }
        if (hit) flagged += 1
        i += 1
      }
      (sh.length.toLong, flagged)
    }
    train
      .select(col(idCol), probe(col(textCol)).as("_p"))
      .select(col(idCol), col("_p._1").as("n_ngrams"), col("_p._2").as("n_flagged"))
      .filter(col("n_ngrams") > 0)
      .withColumn("contamination_ub",
        round(col("n_flagged").cast("double") / col("n_ngrams"), 6))
  }

  // --- repetition metrics (Gopher-style quality rules) ---------------------

  private val repetitionCountsUdf = udf { (text: String) =>
    // split limit -1 keeps trailing empty tokens — the same tokenization as
    // Spark's split()/DuckDB's string_split used by withQuality and the
    // oracles (Java's default split drops trailing empties, which would put
    // n_words and withQuality's n_tokens on different counts for dirty text)
    val words = if (text == null) Array.empty[String] else text.split(" ", -1)
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
    * md5("<salt>:<id>") as an integer — the TextOps.hash60 derivation, built
    * from codegen'd Catalyst string functions so a DuckDB oracle reproduces
    * it bit-for-bit (`('0x' || substr(md5('mix:' || doc_id), 1, 15))::UBIGINT`).
    *
    * Every sampling operator gets its OWN salt: if the stratified sampler
    * ranked on the same uniform the mixture sampler thresholds on, a
    * stratified eval subset would sit entirely inside any mixture keep-set
    * (both prefer small hashes) — maximal train/eval contamination by
    * construction. Distinct salts make the operators' draws independent. */
  def sampleHash(idCol: Column, salt: String = "mix"): Column =
    conv(substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 15), 16, 10)
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

  /** Deterministic holdout split: label every doc `train`/`val`/`test`
    * (any fraction list summing to 1) from its own "split"-salted
    * md5-uniform vs cumulative integer thresholds — the train/eval split
    * op every corpus pipeline needs before packing.
    *
    * Properties the hash idiom buys (same contract as [[mixtureSample]]):
    * pure narrow codegen filter (zero shuffle at 100 TB), reproducible on
    * any cluster layout, stable under re-runs/re-partitioning/appends (a
    * doc's split never changes when other docs arrive), and independent
    * of the other samplers' draws (distinct salt — see [[sampleHash]]).
    * Thresholds compare INTEGERS on the u60 grid; the last split absorbs
    * the remainder so fractions always partition exactly. */
  def splitLabel(id: Column, fractions: Seq[(String, Double)],
                 salt: String = "split"): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = sampleHash(id, salt)
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.init.zip(cums.init).reverse
      .foldLeft(lit(fractions.last._1): Column) {
        case (acc, ((name, _), cum)) =>
          when(u < lit(rateThreshold(cum)), lit(name)).otherwise(acc)
      }
  }

  /** [[splitLabel]] attached as a `split` column. */
  def splitAssign(docs: DataFrame, fractions: Seq[(String, Double)],
                  salt: String = "split",
                  idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split", splitLabel(col(idCol), fractions, salt))

  // --- stratified exact sampling --------------------------------------------

  /** Exactly `perGroup` documents per group, chosen uniformly and
    * deterministically: rank within each group by the md5-derived uniform
    * (id tie-break) and keep the first `perGroup`. The balanced-eval-subset
    * op ("100 docs per language").
    *
    * Scale: the rank filter compiles to Spark's WindowGroupLimit, which
    * keeps a per-group top-`perGroup` heap MAP-SIDE before the group
    * shuffle — the shuffle carries at most perGroup rows per group per
    * input partition, not the corpus.
    *
    * Ranks on the "strat"-salted uniform, NOT mixtureSample's "mix" salt —
    * see sampleHash on why sharing the salt would maximally contaminate a
    * stratified eval subset with any mixture-sampled training set. */
  def stratifiedSample(docs: DataFrame, perGroup: Int,
                       groupCol: String = "lang",
                       idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sampleHash(col(idCol), "strat").asc, col(idCol).asc)
    docs.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perGroup)
  }

  // --- deterministic weighted sampling --------------------------------------

  /** Exactly `perGroup` docs per group, drawn with inclusion probability
    * increasing in `weightCol` (weighted priority sampling): each doc gets an
    * integer priority u60 div weight — the Efraimidis-Spirakis weighted-key
    * scheme with the exponential key replaced by the integer ratio, which
    * keeps P(priority < t) proportional to weight for small t — and the
    * `perGroup` SMALLEST priorities per group win. All arithmetic is exact
    * 64-bit integer (60-bit md5 uniform, `div`), so any engine replays the
    * identical sample: no float pow/log in the key, no boundary straddle.
    *
    * Scale: identical to [[stratifiedSample]] — the rank filter compiles to
    * WindowGroupLimit, so the group shuffle carries at most perGroup rows
    * per group per input partition. Docs with null/non-positive weight are
    * excluded. Salted "wsamp" — independent of the mixture ("mix") and
    * stratified ("strat") draws (see [[sampleHash]]).
    */
  def weightedSample(docs: DataFrame, perGroup: Int, weightCol: String,
                     groupCol: String = "lang",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perGroup > 0, s"need perGroup>0; got $perGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").asc, col(idCol).asc)
    docs
      .filter(col(weightCol).isNotNull && col(weightCol).cast("long") > 0)
      .withColumn("_u", sampleHash(col(idCol), "wsamp"))
      .withColumn("priority", expr(s"_u div CAST(`$weightCol` AS BIGINT)"))
      .drop("_u")
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perGroup)
  }

  // --- token-budget mixture solver ------------------------------------------

  /** One solved group of [[solveTokenBudget]]: `saturated` groups keep all
    * their tokens (their fair share exceeds what they have); the rest keep
    * `rate` of their docs in expectation. */
  case class MixtureBudgetRate(group: String, tokens: Long, parts: Long,
                               saturated: Boolean, rate: Double)

  /** Solve per-group keep rates that hit a global TOKEN budget at target
    * mixture weights — the "mix 50:30:20 into a 1 T-token training set"
    * op. Closed-form water-filling: sort groups by tokens/parts ascending;
    * a group is saturated iff its supply runs out below the fair-share
    * water line, in which case it keeps everything and its budget share is
    * redistributed to the rest BY WEIGHT; unsaturated groups keep
    * rate = t*·parts/tokens where t* = remaining budget / remaining parts.
    * Expected kept tokens = Σ min(tokens_g, t*·parts_g) = budget (when the
    * budget is feasible).
    *
    * Determinism contract (the q82 oracle replays all of it in SQL): the
    * saturation test is EXACT integer arithmetic — tokens·(W−cumw) ≤
    * parts·(B−cumtok), evaluated in BigInt to match the oracle's HUGEINT —
    * never a float comparison; the per-row test is self-consistent with
    * the iterative algorithm because removing a below-water-line group
    * only raises the line and removing an above-line group only lowers
    * it (so the sorted prefix test identifies exactly the saturated set
    * in one pass). `rate` is then the one double expression
    * (B−tokSat)/(W−wSat)·parts/tokens both engines evaluate identically,
    * and selection happens on [[rateThreshold]]'s integer grid.
    *
    * Scale shape: ONE map-side-partial agg over the corpus (groups =
    * mixture components, a handful), a driver solve over that bounded
    * group table (the IVF-centroid precedent), then [[mixtureSample]]'s
    * zero-shuffle codegen filter. Groups absent from `weights` are
    * dropped (rate 0); weights must be positive. */
  def solveTokenBudget(docs: DataFrame, weights: Map[String, Long],
                       budgetTokens: Long,
                       textCol: String = "text",
                       groupCol: String = "lang"): Seq[MixtureBudgetRate] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive: $weights")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0: $budgetTokens")
    val totals = docs
      .filter(col(groupCol).isInCollection(weights.keys.toSeq))
      .groupBy(col(groupCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("tokens"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    waterFill(totals.toSeq, weights, budgetTokens)
  }

  /** The pure closed-form solve over (group, tokens) totals — separated so
    * it can be property-tested against the iterative algorithm without a
    * Spark job. */
  private[text] def waterFill(totals: Seq[(String, Long)],
                              weights: Map[String, Long],
                              budgetTokens: Long): Seq[MixtureBudgetRate] = {
    // sort by water line tokens/parts ascending, group tie-break — the
    // same ORDER BY the oracle uses
    val rows = totals
      .map { case (g, tok) => (g, tok, weights(g)) }
      .sortBy { case (g, tok, parts) => (tok.toDouble / parts.toDouble, g) }
    val wAll = BigInt(rows.map(_._3).sum)
    val budget = BigInt(budgetTokens)
    var cumTok = BigInt(0)
    var cumW = BigInt(0)
    val saturated = rows.map { case (_, tok, parts) =>
      val s = BigInt(tok) * (wAll - cumW) <= BigInt(parts) * (budget - cumTok)
      cumTok += tok
      cumW += parts
      s
    }
    val tokSat = BigInt(rows.zip(saturated).collect { case ((_, t, _), true) => t }.sum)
    val wSat = BigInt(rows.zip(saturated).collect { case ((_, _, p), true) => p }.sum)
    rows.zip(saturated).map { case ((g, tok, parts), isSat) =>
      val rate =
        if (isSat || wSat == wAll) 1.0
        else math.min(1.0,
          (budget - tokSat).toDouble / (wAll - wSat).toDouble
            * parts.toDouble / tok.toDouble)
      MixtureBudgetRate(g, tok, parts, isSat, rate)
    }.sortBy(_.group)
  }

  // --- sequence packing -----------------------------------------------------

  /** Assign each document to a fixed-token-budget training sequence by laying
    * documents end to end in id order within each stream (the document
    * concatenation LM trainers run before batching).
    *
    * Output per doc: (idCol, streamCol, n_tokens, begin_offset, seq_id,
    * straddles) where `begin_offset` is the doc's first token's offset in its
    * stream, `seq_id = begin_offset div seqTokens`, and `straddles` flags docs
    * crossing a sequence boundary (split at training time).
    *
    * The global running sum is computed as a TWO-LEVEL distributed prefix
    * sum — the 100 TB shape for cumulative offsets:
    *  1. per-(stream, shard) token totals (a tiny aggregate: one row per
    *     shard, map-side partials — the only pass over the corpus so far is
    *     narrow);
    *  2. exclusive prefix sum over those shard totals (shard-count rows,
    *     broadcastable) gives each shard's base offset;
    *  3. one partition-local window per (stream, shard) adds in-shard
    *     running sums to the broadcast base.
    * A single global `Window.partitionBy(stream).orderBy(id)` would funnel
    * each stream through ONE task; here parallelism is the shard count and
    * results are bit-identical for any shardSize (spec-verified).
    */
  def packSequences(docs: DataFrame, seqTokens: Long = 2048,
                    shardSize: Long = 1L << 16,
                    textCol: String = "text", idCol: String = "doc_id",
                    streamCol: String = "source"): DataFrame =
    packSequencesBy(docs, size(split(col(textCol), " ")).cast("long"),
      seqTokens, shardSize, idCol, streamCol)

  /** packSequences with a caller-supplied token-count expression — the
    * tokenizer-aware variant (BPE budgets via `Bpe.tokenCount`, or any
    * other per-doc cost column). Same two-level prefix-sum plan; no
    * default args here (Scala allows defaults on one overload only). */
  def packSequencesBy(docs: DataFrame, tokens: Column, seqTokens: Long,
                      shardSize: Long, idCol: String,
                      streamCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col(idCol), col(streamCol),
      tokens.as("n_tokens"),
      expr(s"$idCol div $shardSize").as("_shard"))
    val perShard = t.groupBy(col(streamCol), col("_shard"))
      .agg(sum("n_tokens").as("_shard_tokens"))
    val wBase = Window.partitionBy(streamCol).orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = perShard
      .withColumn("_base", coalesce(sum("_shard_tokens").over(wBase), lit(0L)))
      .select(col(streamCol), col("_shard"), col("_base"))
    val wLocal = Window.partitionBy(col(streamCol), col("_shard")).orderBy(col(idCol))
    t.join(broadcast(bases), Seq(streamCol, "_shard"))
      .withColumn("_cum", col("_base") + sum("n_tokens").over(wLocal))
      .withColumn("begin_offset", col("_cum") - col("n_tokens"))
      .withColumn("seq_id", expr(s"begin_offset div $seqTokens"))
      .withColumn("straddles",
        (expr(s"(_cum - 1) div $seqTokens") > col("seq_id")).cast("int"))
      .select(col(idCol), col(streamCol), col("n_tokens"), col("begin_offset"),
        col("seq_id"), col("straddles"))
  }

  // --- document chunking ----------------------------------------------------

  /** Split each document into fixed-token-budget context windows with a
    * stride (stride < chunkTokens overlaps consecutive chunks — the sliding
    * context-window preparation LM trainers run on long documents; stride ==
    * chunkTokens is disjoint chunking). One chunk starts at every multiple
    * of `stride` below the token count, so the final chunk may be short —
    * the standard contract (a trainer pads or drops it downstream).
    *
    * Output per chunk: (idCol, chunk_idx, start_tok, n_chunk_tokens,
    * chunk_hash). The chunk TEXT is never materialized past the map side:
    * the projection keeps only the md5 of the joined tokens, so the
    * operator is a single narrow scan (no shuffle) whose output rows are
    * ~50 bytes regardless of document size — explode fan-out multiplies
    * row count, not bytes of text. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 16,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"need chunkTokens>0, stride>0; got $chunkTokens, $stride")
    // split limit -1 keeps trailing empties = DuckDB string_split; a null
    // text chunks like the empty string (one chunk of one empty token)
    val toks = split(coalesce(col(textCol), lit("")), " ")
    docs
      .select(col(idCol), toks.as("_t"))
      .select(col(idCol), col("_t"),
        explode(sequence(lit(0), size(col("_t")) - 1, lit(stride)))
          .as("start_tok"))
      .select(col(idCol),
        expr(s"CAST(start_tok div $stride AS INT)").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        slice(col("_t"), col("start_tok") + 1, lit(chunkTokens)).as("_c"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("_c")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("_c"))).as("chunk_hash"))
  }

  // --- corpus vocabulary / document frequency -------------------------------

  /** Top-k corpus vocabulary by document frequency with smoothed IDF
    * (`ln((N+1)/(df+1))`).
    *
    * Doc frequency deliberately avoids `countDistinct(docId)`: its partial
    * aggregate keys on every (word, doc) PAIR, a corpus-sized hash that
    * spills (soak-measured ~10 GB at 60 M tokens). Instead the distinct-ing
    * happens per document (`array_distinct`, bounded by doc length,
    * map-side) and both aggregations are plain counts whose partials
    * collapse to vocabulary size per partition — zero spill at any corpus
    * size. Two scans on purpose: a one-scan variant (raw + distinct words
    * tagged through a single struct generator) was soak-measured 2.5×
    * SLOWER — it doubles the exploded row count and widens each row, and
    * the explode dominates vocabulary's cost, not the scan. The corpus-size
    * scalar rides a broadcast cross join. */
  def vocabulary(docs: DataFrame, topK: Int = 100,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    val tf = docs.select(explode(words).as("word"))
      .groupBy("word").agg(count(lit(1)).as("term_count"))
    val df = docs.select(explode(array_distinct(words)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("doc_freq"))
    val n = docs.agg(count(lit(1)).as("_n_docs"))
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .withColumn("idf",
        graft.functions.GridFunctions.gridRound(log((col("_n_docs") + lit(1.0)) / (col("doc_freq") + lit(1.0))), 6))
      .drop("_n_docs")
      .orderBy(col("doc_freq").desc, col("word"))
      .limit(topK)
  }

  /** Per-document top-`perDoc` TF-IDF terms — keyword extraction against
    * the corpus [[vocabulary]]'s smoothed IDF. Terms outside the
    * top-`vocabTopK` vocabulary are out-of-vocabulary and dropped (the
    * broadcast contract: the IDF table is bounded by vocabTopK however
    * large the corpus).
    *
    * Scale shape: the (doc, word) term-frequency agg is the one
    * corpus-sized shuffle (map-side partials, ~the q61 cost); the IDF
    * side BROADCASTS; per-doc ranking compiles to WindowGroupLimit
    * (map-side top-k per doc). Ties rank deterministically on
    * (score desc, word asc); `score` is rounded to the 1e-6 grid BEFORE
    * ranking so both engines rank the same column they emit. */
  def tfidfTopTerms(docs: DataFrame, vocabTopK: Int = 1000, perDoc: Int = 5,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idf = vocabulary(docs, vocabTopK, textCol, idCol).select("word", "idf")
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("word"))
    tf.join(broadcast(idf), "word")
      .withColumn("score", graft.functions.GridFunctions.gridRound(
        col("tf").cast("double") * col("idf"), 6))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= perDoc)
      .select(col(idCol), col("word"), col("tf"), col("score"), col("term_rank"))
  }

  /** Per-stream Zipf spectrum: least-squares slope/intercept of ln(freq)
    * vs ln(rank) over each stream's top-`topK` words — the "does this
    * source look like natural language" fingerprint (natural text slopes
    * ≈ −1; templated/spammy sources flatten or cliff).
    *
    * Determinism contract: ranks tie-break on (freq desc, word asc); the
    * regression sums run on an integer grid (floor(ln·1e6) per term) so
    * they are order-independent and engine-exact, and the final slope /
    * intercept are computed in double FROM those exact integers — the
    * q67 integer-sum idiom applied to a regression.
    *
    * Scale shape: one explode → (stream, word) count with map-side
    * partials (the only corpus-sized shuffle), then `rank <= topK` over a
    * window — which Spark compiles to WindowGroupLimit (map-side partial
    * top-k per stream, the q63 plan), so no stream's full vocabulary
    * funnels through one task. The regression aggregate sees topK rows
    * per stream. */
  def zipfSpectrum(docs: DataFrame, topK: Int = 100,
                   textCol: String = "text",
                   streamCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(col(streamCol), explode(split(col(textCol), " ")).as("word"))
      .groupBy(col(streamCol), col("word")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(streamCol).orderBy(col("freq").desc, col("word"))
    val g = freq
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(streamCol),
        floor(log(col("rank").cast("double")) * 1e6).cast("long").as("xi"),
        floor(log(col("freq").cast("double")) * 1e6).cast("long").as("yi"))
    val s = g.groupBy(col(streamCol))
      .agg(count(lit(1)).as("n_ranks"),
        sum("xi").as("sx"), sum("yi").as("sy"),
        sum(col("xi") * col("yi")).as("sxy"),
        sum(col("xi") * col("xi")).as("sxx"))
    // exact integer numerator/denominator, then ONE double division. The
    // denominator n·sxx−sx² is ZERO exactly when all xi coincide — a
    // single-rank stream (one word in a source) — which would push NaN
    // into gridRound (0 on Spark, NaN on DuckDB: the non-finite
    // contract); guard on the EXACT INTEGER denominator, NULL fit on
    // both engines.
    val denI = col("n_ranks") * col("sxx") - col("sx") * col("sx")
    val num = (col("n_ranks") * col("sxy") - col("sx") * col("sy")).cast("double")
    val slopeD = num / denI.cast("double")
    val interceptD =
      ((col("sy").cast("double") / 1e6) - slopeD * (col("sx").cast("double") / 1e6)) /
        col("n_ranks")
    s.select(col(streamCol), col("n_ranks"),
      when(denI > 0L,
        graft.functions.GridFunctions.gridRound(slopeD, 6)).as("slope"),
      when(denI > 0L,
        graft.functions.GridFunctions.gridRound(interceptD, 6)).as("intercept"))
  }

  // --- composed curation pipeline -------------------------------------------

  /** One composed keep/drop decision per document: exact-dup keeper,
    * length bounds, language allowlist, repetition rules, quality floor —
    * with a deterministic first-failing `drop_reason`
    * (exact_dup > too_short > too_long > lang_filtered > repetitive >
    * low_quality > kept).
    *
    * Scale shape: every metric is computed in the narrow scan pass, the
    * content hash is taken map-side, and the TEXT COLUMN IS DROPPED before
    * anything shuffles — the whole pipeline is ONE corpus scan plus ONE
    * shuffle of ~60-byte metric rows (the dedup keeper window on the content
    * hash), never document bodies. (A keeper-aggregate + join formulation
    * shuffles the same narrow rows but scans the corpus twice.)
    */
  def curate(docs: DataFrame,
             minTokens: Long = 30, maxTokens: Long = 88,
             qualityMin: Double = 0.25,
             allowedLangs: Seq[String] = Seq("en", "de", "es", "fr"),
             topWordFracMax: Double = 0.12, dup2gramFracMax: Double = 0.05,
             textCol: String = "text", idCol: String = "doc_id",
             langCol: String = "lang",
             keepCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val passthrough = keepCols.map(col)
    val metrics = TextAnalysis.withQuality(
        withRepetitionMetrics(docs, topWordFracMax, dup2gramFracMax, textCol), textCol)
      .withColumn("_h", md5(col(textCol)))
      .select(col(idCol) +: col(langCol) +: passthrough :+ col("n_tokens") :+
        col("quality_score") :+ col("top_word_frac") :+ col("dup_2gram_frac") :+
        col("_h"): _*)
    val reason = when(col("is_dup") === 1, "exact_dup")
      .when(col("n_tokens") < minTokens, "too_short")
      .when(col("n_tokens") > maxTokens, "too_long")
      .when(!col(langCol).isin(allowedLangs: _*), "lang_filtered")
      .when(col("top_word_frac") >= topWordFracMax ||
        col("dup_2gram_frac") >= dup2gramFracMax, "repetitive")
      .when(col("quality_score") < qualityMin, "low_quality")
      .otherwise("kept")
    val w = Window.partitionBy(col("_h")).orderBy(col(idCol))
    metrics
      .withColumn("is_dup", (row_number().over(w) > 1).cast("int"))
      .withColumn("drop_reason", reason)
      .withColumn("keep", (col("drop_reason") === "kept").cast("int"))
      .select(col(idCol) +: col(langCol) +: passthrough :+ col("n_tokens") :+
        col("quality_score") :+ col("top_word_frac") :+ col("dup_2gram_frac") :+
        col("is_dup") :+ col("keep") :+ col("drop_reason"): _*)
  }

  /** Curation yield report: doc/token/quality totals per (group, reason)
    * with ROLLUP subtotals (per-group and grand totals) — the "what did the
    * pipeline drop and why, per source" dashboard query. Null grouping
    * slots from the rollup are labeled 'ALL' so the output is null-free and
    * deterministic. One extra tiny shuffle on top of curate(): the rollup
    * aggregate's partials collapse to (groups × reasons) per partition. */
  def curationReport(docs: DataFrame, groupCol: String = "source"): DataFrame =
    curate(docs, keepCols = Seq(groupCol))
      .rollup(col(groupCol), col("drop_reason"))
      // mean via an exact integer sum (quality is 4-decimal quantized), not
      // avg(): double summation order differs between engines and flips the
      // 6th rounded decimal at .5 boundaries — integer sums are
      // order-independent, so the single final division is bit-stable
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum(round(col("quality_score") * 10000).cast("long")).as("_q4"))
      .select(coalesce(col(groupCol), lit("ALL")).as(groupCol),
        coalesce(col("drop_reason"), lit("ALL")).as("drop_reason"),
        col("n_docs"), col("n_tokens"),
        round(col("_q4").cast("double") / (col("n_docs") * 10000.0), 6)
          .as("avg_quality"))

  /** Cross-corpus n-gram novelty: per doc, how much of its DISTINCT word
    * n-gram shingle set also occurs in at least one OTHER document —
    * `n_shared / n_shingles` shared, `1 − that` novel. The doc-level
    * boilerplate/contamination signal curation pipelines threshold on
    * (a doc whose shingles all appear elsewhere is template or copy).
    *
    * Scale shape: per-shingle document frequency is an explode →
    * map-side-partial aggregate (its exchange carries one row per distinct
    * shingle per partition); the df table then joins back to the shingle
    * stream co-partitioned on the same key. The corpus is deliberately
    * exploded twice (the df side prunes `doc_id`, so the exchanges are not
    * reusable) — the `vocabulary` precedent: a fused single-scan variant
    * doubles the exploded row width/count and soak-measured 2.5× slower,
    * because the explode, not the scan, dominates. A `count OVER
    * (PARTITION BY shingle)` window would be one exchange fewer but
    * buffers every occurrence of a hot shingle in one task; the agg+join
    * shape keeps partial aggregation and lets AQE split skewed join
    * partitions — the 100 TB-safe choice. Docs with < n words have no
    * shingles and are absent (both engines agree by construction). */
  def ngramNovelty(docs: DataFrame, n: Int = 2, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val shinglesU = udf((t: String) =>
      if (t == null) Array.empty[String] else TextOps.shingleArray(t, n))
    val sh = docs.select(col(idCol), explode(shinglesU(col(textCol))).as("shingle"))
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(lit(1.0) - col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
      .orderBy(col(idCol))
  }

  /** Inverted-index construction: per term, document frequency, total term
    * frequency, and the top-`topPostings` posting doc ids (by tf desc, then
    * doc id) as a csv string — the retrieval-index build pass, restricted
    * to terms with df ≥ `minDf` and reported as the top-`topK` terms by
    * (df desc, term).
    *
    * Scale shape: explode → (term, doc) tf agg is the one corpus-sized
    * shuffle (map-side partials). The tf frame then feeds BOTH the per-term
    * stats agg and the posting ranking — identical child exchanges hashed
    * on overlapping keys, so the scan+explode runs once (ReusedExchange).
    * The posting rank filter compiles to WindowGroupLimit (map-side top-k
    * per term — a stopword's millions of postings never funnel through one
    * task before the limit). Postings are ordered INSIDE the row via
    * array_sort on (rank, doc) structs, not agg order, so the csv is
    * deterministic in any engine. Final TakeOrdered is bounded at topK. */
  def invertedIndex(docs: DataFrame, minDf: Long = 5, topPostings: Int = 3,
                    topK: Int = 100, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
    val w = Window.partitionBy(col("term")).orderBy(col("tf").desc, col(idCol))
    val tops = tf
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topPostings)
      .groupBy("term")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col(idCol).as("d")))),
        x => x.getField("d").cast("string")), ",").as("top_docs"))
    stats.join(tops, Seq("term"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("total_tf"), col("top_docs"))
      .orderBy(col("df").desc, col("term"))
      .limit(topK)
  }

  /** BM25 retrieval scoring of every document against a fixed query-term
    * set (Robertson/Spärck Jones probabilistic ranking — the retrieval
    * scorer paired with the [[invertedIndex]] build). Output: the
    * top-`topK` matching docs as (idCol, dl, score) ranked by
    * (score desc, id).
    *
    * Determinism contract (the q67/q79 integer-grid idiom): each term's
    * IDF is `round(ln(1 + (N − df + ½)/(df + ½)), 6)` — rounded BEFORE
    * use so the engines' ln implementations can't disagree past the
    * grid — and each term's contribution is floored to a 1e-6 integer
    * grid; per-doc summation and ranking run on the exact long, so
    * neither addition order nor double comparison can flip a rank.
    * Every other step is a chain of single IEEE double ops written
    * identically in both engines.
    *
    * Scale shape: scoring is a ZERO-SHUFFLE narrow pass — per-term tf is
    * an in-row `filter(words, _ == term)` scan, not an explode+join (for
    * a handful of query terms, q < 10 array scans per doc beat a
    * corpus-sized explode shuffle by orders of magnitude). The only
    * aggregates are one 1-row global stats reduction (N, Σdl, per-term
    * df — map-side partials, broadcast back) and the final bounded
    * TakeOrdered(topK). At 100 TB this is one scan + two tiny exchanges. */
  def bm25Rank(docs: DataFrame, queryTerms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    val words = filter(split(col(textCol), " "), w => length(w) > lit(0))
    def tfCol(t: String): Column =
      size(filter(col("_ws"), w => w === lit(t))).cast("long")
    val base = docs.select(col(idCol), words.as("_ws"))
      .select(col(idCol) +: size(col("_ws")).cast("long").as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"_tf$i") }: _*)
    val statAggs =
      sum(col("dl")).cast("double").as("_total_dl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0L, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = base.agg(count(lit(1)).as("_n"), statAggs: _*)
    val nD = col("_n").cast("double")
    val avgdl = col("_total_dl") / nD
    def contribE6(i: Int): Column = {
      val tf = col(s"_tf$i").cast("double")
      val df = col(s"_df$i").cast("double")
      val idf = graft.functions.GridFunctions.gridRound(log(lit(1.0) + (nD - df + lit(0.5)) / (df + lit(0.5))), 6)
      val norm = tf + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * (col("dl").cast("double") / avgdl))
      when(col(s"_tf$i") > 0L,
        floor(idf * (tf * lit(k1 + 1.0)) / norm * lit(1e6)).cast("long"))
        .otherwise(lit(0L))
    }
    base.crossJoin(broadcast(stats))
      .withColumn("_s_e6",
        queryTerms.indices.map(contribE6).reduce(_ + _))
      .filter(col("_s_e6") > 0L)
      .orderBy(col("_s_e6").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("dl"),
        round(col("_s_e6").cast("double") / lit(1e6), 6).as("score"))
  }
}
