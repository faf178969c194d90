package graft.text

import graft.operators.Checkpoints.Pinnable
import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over document tables: deduplication
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard), text analysis (language
  * ID, quality scoring, token counting, fingerprinting).
  *
  * Scale shape: signatures are narrow per-row maps (one UDF pass per doc);
  * the only shuffles are the LSH band-bucket joins, which is the point of
  * LSH — candidate generation without the O(n²) pairwise compare. Exact-dup
  * and fingerprint are single hash-groupBys.
  *
  * All hashing is md5-derived so a DuckDB oracle reproduces signatures
  * bit-for-bit: `hash60(s, seed)` is the first 15 hex chars of
  * md5("<seed>:<s>") as an unsigned number, i.e. DuckDB's
  * `('0x' || substr(md5(seed || ':' || s), 1, 15))::UBIGINT` (60 bits keeps
  * it positive in a signed Long, so min/compare agree across engines).
  */
object TextOps {

  // --- deterministic md5-derived string hashes (seeded) ---------------------
  private val md5Inst = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Bytes(s: String): Array[Byte] = {
    val d = md5Inst.get()
    d.reset()
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private[text] def md5Hex(s: String): String = {
    val b = md5Bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(b(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** First 15 hex chars (60 bits) of md5("<seed>:<s>") — always >= 0.
    * Shared engine-wide (operators.BloomJoin probes the same grid). */
  private[graft] def hash60(s: String, seed: Int): Long = {
    val b = md5Bytes(s"$seed:$s")
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xFFL); i += 1 }
    (h << 4) | ((b(7) & 0xF0L) >>> 4)
  }

  /** Distinct word n-gram shingles of a text. */
  def shingleArray(text: String, n: Int): Array[String] = {
    val words = text.split(" ")
    if (words.length < n) Array.empty
    else (0 to words.length - n).map(i => words.slice(i, i + n).mkString(" ")).distinct.toArray
  }

  // --- exact dedup ---------------------------------------------------------

  /** Exact dedup groups by content hash: (content_hash, n_copies, keeper). */
  def exactDupGroups(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Keep one row per distinct content (min id wins). */
  def dedupExact(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // --- MinHash + LSH near-dedup -------------------------------------------

  /** Odd multiplier < 2^62 so the DuckDB HUGEINT product of two such values
    * stays inside signed 128 bits; order-scrambling mod 2^64. */
  private val MixM = 0x2545F4914F6CDD1DL

  /** Per-hash xor constants: 60 bits of md5(i), same derivation as the
    * shingle base value so a SQL oracle rebuilds them. */
  private[text] def mixConstant(i: Int): Long = {
    val b = md5Bytes(i.toString)
    var c = 0L
    var k = 0
    while (k < 7) { c = (c << 8) | (b(k) & 0xFFL); k += 1 }
    (c << 4) | ((b(7) & 0xF0L) >>> 4)
  }

  /** Per-doc MinHash signature over word n-gram shingles: one narrow pass,
    * ONE md5 per shingle. The hash family must scramble the ORDER of
    * shingles independently per slot (anything linear in the slot index —
    * e.g. Kirsch-Mitzenmacher h1+i*h2 — keeps the same argmin across slots
    * and wrecks the Jaccard estimate), so slot i is the xor-multiply mix
    * h_i(x) = ((x xor c_i) * M) mod 2^64 >> 4 over the 60-bit base value
    * x = md5(shingle) hex 1-15, with c_i = md5(i) hex 1-15. Multiplication
    * wraps mod 2^64 identically in JVM longs and DuckDB HUGEINT % 2^64, so
    * the oracle reproduces signatures bit-for-bit. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", numHashes: Int = 32,
                        shingleN: Int = 2): DataFrame = {
    val cs = Array.tabulate(numHashes)(mixConstant)
    val sigUdf = udf { (text: String) =>
      val shingles = shingleArray(text, shingleN)
      val out = Array.fill(numHashes)(Long.MaxValue)
      var k = 0
      while (k < shingles.length) {
        val b = md5Bytes(shingles(k))
        var x = 0L
        var i = 0
        while (i < 7) { x = (x << 8) | (b(i) & 0xFFL); i += 1 }
        x = (x << 4) | ((b(7) & 0xF0L) >>> 4)
        i = 0
        while (i < numHashes) {
          val h = ((x ^ cs(i)) * MixM) >>> 4
          if (h < out(i)) out(i) = h
          i += 1
        }
        k += 1
      }
      out
    }
    // one md5 per shingle makes this the pipeline's CPU hot spot — fan the
    // docs out of an under-parallel scan stage first (no-op at scale and
    // on streaming inputs; see Parallelism.fanOutScan)
    graft.operators.Parallelism.fanOutScan(docs)
      .select(col(idCol).as("doc_id"), sigUdf(col(textCol)).as("signature"))
  }

  /** LSH candidate pairs from signatures: `bands` bands of `numHashes/bands`
    * rows; docs sharing any band bucket become candidates; estimated Jaccard
    * = fraction of matching signature slots.
    *
    * Scale shape: the signature frame is scanned ONCE (the signature UDF is
    * the dominant cost — one md5 per shingle — so it must not be in more
    * than one subtree of the plan). Each doc's signature rides through the
    * single (band, bucket) group-shuffle alongside its id (bands copies of
    * numHashes longs per doc — bounded, ~2 KB at the defaults), pairs AND
    * their slot-match estimate are produced inside the bucket row, and only
    * (id, id, estimate) triples exist downstream — never a signature
    * self-join, never an attach join back to the corpus, never a pairwise
    * cross product. `maxBucketSize` caps skew — a bucket holding thousands
    * of boilerplate near-identical docs would otherwise emit O(size²) pairs
    * in one hot task; such floods are exact-dedup's job (q40), so oversized
    * buckets are dropped, trading bounded recall loss for a bounded worst
    * task. */
  /** Stateless (doc_id, band_idx, bucket) band-bucket rows from signatures —
    * the LSH bucketing stage ALONE, without pair generation: shared by the
    * streaming running-bucket state (q78), where per-doc collision flags
    * need bucket membership but never pairs (so no skew cap is needed —
    * state per bucket is a constant-size (count, min) regardless of how hot
    * the bucket is). */
  def bandBuckets(signatures: DataFrame, numHashes: Int = 32,
                  bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, md5Hex(s"$b:${slice.mkString(",")}"))
      }
    }
    signatures
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(bandUdf(col("signature"))).as("band"))
      .select(col("doc_id"), col("band._1").as("band_idx"), col("band._2").as("bucket"))
  }

  def minhashCandidates(signatures: DataFrame, numHashes: Int = 32,
                        bands: Int = 8, threshold: Double = 0.2,
                        maxBucketSize: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, md5Hex(s"$b:${slice.mkString(",")}"))
      }
    }
    val buckets = signatures
      .select(col("doc_id").cast("long").as("doc_id"), col("signature"),
        explode(bandUdf(col("signature"))).as("band"))
      .select(col("doc_id"), col("signature"),
        col("band._1").as("band_idx"), col("band._2").as("bucket"))
    // pairs + slot-match estimate in one pass over the bucket's members
    val pairsUdf = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      val sorted = members.map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).toArray
      for (i <- sorted.indices.toSeq; j <- i + 1 until sorted.length) yield {
        val (ia, sa) = sorted(i)
        val (ib, sb) = sorted(j)
        var eq = 0
        var k = 0
        while (k < sa.length) { if (sa(k) == sb(k)) eq += 1; k += 1 }
        (ia, ib, eq.toDouble / sa.length)
      }
    }
    buckets
      .groupBy("band_idx", "bucket")
      .agg(collect_list(struct(col("doc_id"), col("signature"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(pairsUdf(col("members"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"),
        round(col("p._3"), 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .distinct()
  }

  /** Incremental near-dup candidates for a corpus increment — the
    * daily-crawl ingest shape: the corpus is AT REST as stored MinHash
    * signatures (its text is never rescanned; at 100 TB the signature
    * table is ~1/1000 the corpus), a new batch arrives, and the pairs that
    * matter are exactly those TOUCHING the batch. Semantics are
    * pinned to the batch operator: the result equals
    * `minhashCandidates(corpusSigs UNION newSigs)` restricted to pairs
    * with at least one new-batch side — same combined-occupancy skew cap
    * (a bucket whose corpus+new membership exceeds `maxBucketSize` is
    * dropped), same slot-match estimate, same threshold-after-round.
    * IncrementalDedupSpec asserts that law frame-exactly.
    *
    * Plan shape: new-side band buckets join the combined bucket table once
    * on (band_idx, bucket) — the corpus-side shuffle moves (doc_id,
    * band_idx, bucket) rows, never signatures; estimates come from TWO
    * id-keyed joins against the signature union AFTER the candidate set is
    * known (candidates ≪ corpus, so AQE broadcasts them; a production
    * deployment stores the signature table bucketed by doc_id to make
    * these lookups co-located). The slot-match estimate is pure Catalyst
    * (`zip_with` + `aggregate`), no UDF in the pair path. Corpus and new
    * ids must be disjoint (the caller's ingest contract).
    *
    * The caller owns pinning: pass at-rest frames (parquet-backed scans
    * re-read cheaply); `.pin` DERIVED signature frames first, or the
    * signature UDF re-runs once per subtree (the q42 multi-consumer rule).
    */
  def minhashCandidatesIncremental(corpusSigs: DataFrame, newSigs: DataFrame,
                                   numHashes: Int = 32, bands: Int = 8,
                                   threshold: Double = 0.2,
                                   maxBucketSize: Int = 64): DataFrame = {
    val cb = bandBuckets(corpusSigs, numHashes, bands)
    val nb = bandBuckets(newSigs, numHashes, bands)
    val all = cb.union(nb)
    // combined occupancy — identical cap semantics to the batch operator
    // (production keeps the corpus side's per-bucket counts stored and
    // only adds the batch's, but the count here is over the NARROW bucket
    // table, not the corpus)
    val sized = all.groupBy("band_idx", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucketSize))
    // fresh aliases on BOTH union legs: corpus and batch frames often
    // derive from the same base scan (one table split by an id predicate),
    // and union children sharing attribute exprIds break Catalyst's
    // constraint rewrite
    val sigs = corpusSigs.select(col("doc_id").cast("long").as("doc_id"),
        col("signature").as("signature"))
      .union(newSigs.select(col("doc_id").cast("long").as("doc_id"),
        col("signature").as("signature")))
    sparseCandidates(nb, all, sized, sigs, numHashes, threshold)
  }

  /** [[minhashCandidatesIncremental]] against a STORED corpus bucket
    * table — the deployment shape: ingest writes each doc's (doc_id,
    * band_idx, bucket) rows once (8 rows of ~70 B per doc, ~1/500th of a
    * typical document), and every subsequent batch joins the parquet-backed
    * table directly instead of re-deriving buckets from the signature
    * store (which costs two narrow corpus passes per batch — measured
    * ~60% of the incremental pair stage at 20 M docs). Semantics are
    * identical (spec-pinned): same combined-occupancy cap, estimate,
    * threshold. `corpusBuckets` must be exactly
    * `bandBuckets(corpusSigs)`'s rows at rest. */
  def minhashCandidatesIncrementalStored(corpusBuckets: DataFrame,
                                         corpusSigs: DataFrame,
                                         newSigs: DataFrame,
                                         numHashes: Int = 32, bands: Int = 8,
                                         threshold: Double = 0.2,
                                         maxBucketSize: Int = 64): DataFrame = {
    val cb = corpusBuckets.select(col("doc_id").cast("long").as("doc_id"),
      col("band_idx"), col("bucket"))
    val nb = bandBuckets(newSigs, numHashes, bands)
    val all = cb.union(nb.select(col("doc_id"), col("band_idx"), col("bucket")))
    val sized = all.groupBy("band_idx", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucketSize))
    val sigs = corpusSigs.select(col("doc_id").cast("long").as("doc_id"),
        col("signature").as("signature"))
      .union(newSigs.select(col("doc_id").cast("long").as("doc_id"),
        col("signature").as("signature")))
    sparseCandidates(nb, all, sized, sigs, numHashes, threshold)
  }

  /** LSH candidate pairs for corpora whose SIGNATURE payload dominates the
    * band-bucket shuffle — the sparse (ids-through-the-shuffle)
    * architecture [[minhashCandidatesIncremental]] uses, as a batch
    * operator: bucket rows carry only (doc_id, band_idx, bucket), pairs
    * form in a capped self-join, and signatures attach by id AFTER the
    * pair set is known, with the slot-match estimate a pure Catalyst
    * zip_with/aggregate. Result-identical to [[minhashCandidates]] (same
    * cap, estimate, threshold-after-round; spec-pinned and A/B-certified
    * at 20 M docs in NearDupMegaSoak).
    *
    * Crossover: [[minhashCandidates]] moves bands x signature longs per doc
    * through ONE shuffle (no joins back); this variant moves ~70 B per
    * bucket row plus two id-keyed signature joins sized by the PAIR count.
    * At driver-bench corpus sizes (thousands of docs) the dense form's
    * single shuffle wins on job count; at tens of millions of docs the
    * signature payload is the bottleneck (measured at 20 M docs / 3 M
    * pairs in the mega-soak) and this form wins. Both stay available —
    * the dispatch is a data-shape call the caller owns. */
  def minhashCandidatesAtScale(signatures: DataFrame, numHashes: Int = 32,
                               bands: Int = 8, threshold: Double = 0.2,
                               maxBucketSize: Int = 64): DataFrame = {
    val b = bandBuckets(signatures, numHashes, bands)
    val sized = b.groupBy("band_idx", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucketSize))
    val sigs = signatures.select(col("doc_id").cast("long").as("doc_id"),
      col("signature").as("signature"))
    sparseCandidates(b, b, sized, sigs, numHashes, threshold)
  }

  /** Shared core of the sparse LSH-pair architecture: `left` bucket rows
    * join the cap-filtered `all` bucket rows on (band_idx, bucket), pairs
    * normalize to (min, max) and dedup, then signatures attach by id for
    * the slot-match estimate. */
  private def sparseCandidates(left: DataFrame, all: DataFrame,
                               sized: DataFrame, sigs: DataFrame,
                               numHashes: Int, threshold: Double): DataFrame = {
    val cand = left.select(col("band_idx"), col("bucket"), col("doc_id").as("nid"))
      .join(sized.select("band_idx", "bucket"), Seq("band_idx", "bucket"))
      .join(all.select(col("band_idx"), col("bucket"), col("doc_id").as("mid")),
        Seq("band_idx", "bucket"))
      .filter(col("nid") =!= col("mid"))
      .select(least(col("nid"), col("mid")).as("doc_a"),
        greatest(col("nid"), col("mid")).as("doc_b"))
      .distinct()
    val est = round(
      aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / numHashes, 6)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("signature").as("sig_a")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("signature").as("sig_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Conf key: undirected-edge count at or below which
    * [[connectedComponents]] runs its single-task union-find tier instead
    * of the iterative distributed loop. Default 2,000,000 edges (≤4 M
    * parent-map entries ≈ a few hundred MB in one task). Set to 0 to force
    * the distributed path (the specs do, to certify both tiers). */
  val CcLocalEdgeCapKey = "graft.cc.localEdgeCap"

  /** Connected components over an undirected candidate-pair edge list —
    * the transitive-closure step of near-dedup: LSH emits PAIRS, but
    * keeping one doc per near-dup CLUSTER needs components (a~b, b~c =>
    * {a,b,c} even if (a,c) never collided). Returns (node, component) with
    * component = min node id in the component.
    *
    * Two tiers, dispatched on the measured edge count (the same
    * size-based dispatch Spark itself uses for broadcast-vs-shuffle
    * joins), because the near-dup graph is structurally TINY next to the
    * corpus — pair emission is capped per bucket, so even a 100 TB corpus
    * yields an edge list millions, not billions, deep:
    *
    *  - edges ≤ `graft.cc.localEdgeCap` (default 2 M): ship the edge list
    *    to ONE task and run path-compressed union-find with min-root
    *    unions — a single pass, exact, memory-bounded by the cap. This is
    *    executor-side `mapPartitions`, not a driver collect. Motivation is
    *    measured: min-label propagation walks a k-node CHAIN one hop per
    *    Spark round (join+agg+action each ≈ 1 s of job overhead), so a
    *    30-long chain of 233 edges cost 24 s; union-find does it in one.
    *  - above the cap: iterative min-label propagation — each round every
    *    node adopts the minimum label among itself and its neighbors; one
    *    aggregate-shuffle per round over the edge list; each round's label
    *    frame is persisted and the previous unpersisted, so lineage stays
    *    bounded no matter the iteration count (the classic Spark iterative
    *    pattern). Dense near-dup graphs (diameter 2-3) converge in a few
    *    relax rounds; from round 3 on, each round also POINTER-JUMPS
    *    (label := current label of the node the label names — a
    *    name-keyed self-join, so chains collapse in halving hops and a
    *    k-chain needs O(log k) rounds, not k). The jump only runs when a
    *    graph is still unconverged after the dense-case rounds, so the
    *    common case never pays for it. Throws if maxIter rounds don't
    *    converge. */
  def connectedComponents(edges: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    // persist the casted pair list BEFORE counting: edges is often an
    // expensive lazy frame (an LSH bucket join) and the count must not
    // re-run it for the tier that consumes it next
    val und = edges.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = und.count()
    val cap = spark.conf.getOption(CcLocalEdgeCapKey).map(_.toLong)
      .getOrElse(2000000L)
    val result =
      if (nEdges <= cap) ccUnionFind(und)
      else ccLabelPropagation(und, maxIter, nEdges)
    und.unpersist()
    result
  }

  /** Small-graph tier: all edges into one task, path-compressed union-find
    * with min-root unions (the root of every set is its minimum node id,
    * so find() IS the component label). One shuffle, one pass. */
  private def ccUnionFind(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    und.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      parent.keys.toArray.iterator.map(n => (n, find(n)))
    }.toDF("node", "component").pin
  }

  /** Large-graph tier: iterative min-label propagation (see
    * [[connectedComponents]] scaladoc for the round shape). */
  private def ccLabelPropagation(und: DataFrame, maxIter: Int,
                                 nEdges: Long): DataFrame = {
    // every round's state is PINNED (eager lineage truncation under the
    // session's Checkpoints policy), not merely persisted: a persist caches
    // blocks but keeps the logical tree, and the jump round's self-join
    // would otherwise DOUBLE that tree every round (DeduplicateRelations
    // clones the right side) — at ~20 rounds the driver OOMs just
    // stringifying the plan. Pinning keeps the per-round plan constant.
    // Pinned PARTITIONED AND SORTED on dst, the per-round join key: pin
    // preserves outputPartitioning/outputOrdering through the LogicalRDD,
    // so every relax round reuses this layout instead of re-shuffling and
    // re-sorting the loop-invariant edge list (the Graph.pinByKey idiom;
    // partition count sized from the known symmetric edge count,
    // capped at the session conf — scale-adaptive, see pinByKey).
    val sym = graft.operators.Graph.pinByKey(
      und.union(und.select(col("dst").as("src"), col("src").as("dst"))), "dst",
      2L * nEdges)
    var cached = sym.select(col("src").as("node")).distinct()
      .withColumn("_old", col("node"))
      .withColumn("label", col("node"))
      .pin
    var labels = cached.select("node", "label")
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("label").as("nlabel"))
      // carry the previous label through the step so the convergence check
      // is a filter over the SAME pinned frame — one extra action per
      // round, no extra join against the old labels
      val relaxed = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("_old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // past the dense-graph horizon only a chain is still moving: add a
      // pointer-jump (label := label's own current label), collapsing a
      // k-chain in O(log k) rounds instead of k. The jump map is joined BY
      // NAME on the shared "label" key — dataframe-column refs across a
      // deduplicated self-join plan are ambiguous, name keys are not — and
      // the relax result is pinned first so the join's two sides read one
      // materialized frame instead of each recomputing the relax subtree.
      val stepped =
        if (it < 2) relaxed.pin
        else {
          val r = relaxed.pin
          val jumpMap = r.select(col("node").as("label"), col("label").as("_jl"))
          val s = r.join(jumpMap, Seq("label"), "left")
            .select(col("node"), col("_old"),
              least(col("label"), coalesce(col("_jl"), col("label"))).as("label"))
            .pin
          r.unpersist()
          s
        }
      val changed = stepped.filter(col("label") =!= col("_old")).count()
      cached.unpersist()
      cached = stepped
      labels = stepped.select("node", "label")
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // hand back a lineage-truncated copy and release the loop's blocks: a
    // plain return of `labels` would hold one pinned frame per call for
    // the session's lifetime
    val result = labels.select(col("node"), col("label").as("component"))
      .pin
    cached.unpersist()
    result
  }

  /** Near-dup cluster assignment for every document: component id (min
    * doc_id) of the candidate-pair graph; docs in no pair are their own
    * singleton cluster. `edges` is any near-dup pair frame (minhash,
    * simhash, cosine LSH). */
  def dupClusters(docs: DataFrame, edges: DataFrame,
                  idCol: String = "doc_id"): DataFrame = {
    val cc = connectedComponents(edges)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster"))
  }

  /** Quality-arbitrated dedup keeper: per near-dup cluster keep the
    * HIGHEST-quality doc (doc_id ascending on ties), not the min-id one —
    * when near-dups differ (truncation, boilerplate variants), min-id
    * throws away the best copy. `clusters` is [[dupClusters]] output;
    * `quality` carries (doc_id, quality_score). One cluster-keyed shuffle;
    * groups are near-dup clusters, bounded in practice by the upstream
    * LSH bucket caps. */
  def qualityKeeper(clusters: DataFrame, quality: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy(col("quality_score").desc, col("doc_id").asc)
    clusters.join(quality, "doc_id")
      .withColumn("keeper", first(col("doc_id")).over(w))
      .withColumn("kept", (col("doc_id") === col("keeper")).cast("int"))
  }

  // --- SimHash near-dedup --------------------------------------------------

  /** SimHash over words (60 effective bits from hash60): per-bit majority
    * vote of word hashes. */
  def simhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val shUdf = udf { (text: String) =>
      val words = text.split(" ")
      val votes = new Array[Int](64)
      for (w <- words) {
        val h = hash60(w, 0)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    docs.select(col(idCol).as("doc_id"), shUdf(col(textCol)).as("simhash"))
  }

  /** Near-dup pairs with Hamming distance <= maxHamming, found by banding the
    * 64-bit simhash into 4 16-bit chunks (pigeonhole: any pair within
    * hamming 3 shares at least one chunk).
    *
    * Scale shape (same as `minhashCandidates`): ONE (chunk_idx, chunk)
    * group-shuffle; each doc's 8-byte simhash rides through it alongside the
    * id, pairs and their Hamming distance are produced inside the bucket
    * row, and only (id, id, hamming) triples exist downstream — never a
    * chunk self-join. `maxBucketSize` caps skew: a hot chunk (boilerplate
    * headers, or the all-zeros chunk that every short doc lands in) would
    * otherwise emit O(size²) pairs in one task. Oversized buckets are
    * dropped — floods of identical content are exact-dedup's job (q40) — so
    * the worst task stays bounded at cap²/2 comparisons. */
  def simhashCandidates(signatures: DataFrame, maxHamming: Int = 3,
                        maxBucketSize: Int = 256): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only up to hamming 3")
    val chunks = signatures.select(
      col("doc_id").cast("long").as("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_idx"),
          shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
    // pairs + hamming in one pass over the bucket's members
    val pairsUdf = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      val sorted = members.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toArray
      for (i <- sorted.indices.toSeq; j <- i + 1 until sorted.length) yield {
        val (ia, ha) = sorted(i)
        val (ib, hb) = sorted(j)
        (ia, ib, java.lang.Long.bitCount(ha ^ hb))
      }
    }
    chunks
      .groupBy("chunk_idx", "chunk")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(pairsUdf(col("members"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"),
        col("p._3").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // --- n-gram Jaccard (exact, for verification / small candidate sets) -----

  /** Exact pairwise word-bigram Jaccard via a shingle self-join — the
    * O(candidates) ground truth that MinHash approximates. Pure Catalyst so
    * a DuckDB oracle can replicate it exactly. */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    // pinned: sh feeds both sides of the self-join plus the count subtree —
    // unpinned, the text scan + shingle explode runs three times.
    // fanOutScan: the shingle explode is scan-fused and was profiled at
    // 4.2 s in ONE task on the single-row-group bench input
    val sh = graft.operators.Parallelism.fanOutScan(docs)
      .filter(size(words) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(words) - 1),
          i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))).as("shingle"))
      .pin
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("c", "ca"), "doc_a")
      .join(cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("c", "cb"), "doc_b")
      // unrounded threshold (rounded output): the same contract as
      // jaccardPrefixJoin, whose prefix bound is lossless only for TRUE
      // J >= t — keeping both filters unrounded keeps them set-equal
      .withColumn("_j", col("inter").cast("double") / (col("ca") + col("cb") - col("inter")))
      .filter(col("_j") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("_j"), 6).as("jaccard"))
  }

  /** Exact Jaccard-threshold similarity join via PREFIX FILTERING — the
    * scalable exact path (Bayardo et al. "Scaling Up All Pairs Similarity
    * Search", Vernica et al. MapReduce SSJoin; public algorithms, no code
    * reuse). Same result set as `ngramJaccardPairs` (the brute-force
    * shingle self-join q41 runs), but only each document's globally
    * RAREST shingles generate candidates:
    *
    * With every doc's shingle set sorted by one global order (document
    * frequency ascending, shingle as tie-break), any pair with
    * J(A,B) >= t must share a token inside both prefixes of length
    * |x| - ceil(t*|x|) + 1 — if A's whole prefix misses B, the overlap
    * fits inside A's suffix: |A n B| <= ceil(t*|A|) - 1 < t*|A| <= |A n B|
    * required by J >= t. So joining on prefix tokens only is LOSSLESS,
    * while the candidate space shrinks from df^2 over every shingle
    * (q41's shape — hot shingles dominate) to df^2 over tokens that are
    * the rarest within their documents.
    *
    * Shape at 100 TB: shingle-df is one vocab-keyed count; rank-within-doc
    * is a doc-keyed window (bounded by doc length); the candidate join
    * shuffles only prefix tokens; verification joins candidate pairs back
    * to per-doc sorted shingle arrays (rows bounded by doc length) and
    * intersects per row — the corpus never crosses a shuffle as pairs.
    * Exactness forbids a bucket-size cap here; the skew envelope is that
    * a token appears in a prefix only when ~(1-t) of some doc's shingles
    * are rarer than it, which is precisely what hot shingles fail. */
  def jaccardPrefixJoin(docs: DataFrame, minJaccard: Double,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, s"need 0 < t <= 1; got $minJaccard")
    // FAST PATH: tokens travel as xxhash64 ids — 8-byte long compares and
    // ~3x smaller array payloads through the verification joins (measured
    // the dominant cost: per-candidate UnsafeRow copies of the string
    // arrays). Exactness is GUARDED, not assumed: one vocab-sized job
    // checks the hash is injective ON THIS CORPUS; any 64-bit collision
    // (p ~ |V|^2 / 2^65) falls back to the string-keyed body, whose
    // results are definitionally exact. Either way the output is identical
    // to the brute-force self-join.
    jaccardPrefixJoinImpl(docs, minJaccard, textCol, idCol, hashIds = true)
      .getOrElse(
        jaccardPrefixJoinImpl(docs, minJaccard, textCol, idCol, hashIds = false).get)
  }

  /** One body, two token representations. Returns None only when
    * `hashIds = true` and the injectivity observation failed. */
  private def jaccardPrefixJoinImpl(docs: DataFrame, minJaccard: Double,
                                    textCol: String, idCol: String,
                                    hashIds: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val words = split(col(textCol), " ")
    // ONE corpus scan and TWO pins (the doc-sized aggregate + the narrow
    // candidate pairs): the r12 shape (pin shingles, window prefix, pin
    // prefix, candidate distinct, then TWO shuffle joins back to a sets
    // aggregate) spent ~14 jobs of fixed overhead on a plan whose data is
    // tiny at audit scale.
    // Explicit widths throughout: this operator's stages are CPU-bound at
    // tiny byte sizes (shingle explode, string windows, per-pair set
    // math), exactly the shape AQE's byte-based coalescing and file-split
    // sizing mis-size — measured collapsing the explode, the window, the
    // guard and the collision join onto ONE core (a small corpus is one
    // parquet split). User-specified repartition counts are exempt from
    // AQE coalescing.
    val width = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs
      .repartition(width)
      .filter(size(words) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(words) - 1),
          i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))).as("shingle"))
    // document frequency as a count window over the shingle-keyed shuffle —
    // same value as a groupBy+join but the corpus crosses ONE exchange and
    // is never scanned a second time for the join probe side
    // the explicit shingle repartition also IS the window's required
    // clustering, so it adds no exchange — it just pins the width
    val withDf = sh
      .repartition(width, col("shingle"))
      .withColumn("tok",
        if (hashIds) xxhash64(col("shingle")) else col("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
    // injectivity guard: a hash id is safe iff no two distinct shingles
    // share it — one vocab-sized aggregate with an early-out isEmpty.
    // (Observation can't host this: observed metrics forbid grouping and
    // distinct aggregates.)
    if (hashIds) {
      val collided = sh
        .groupBy(col("shingle")).agg(count(lit(1)).as("_o"))
        .groupBy(xxhash64(col("shingle")).as("tok"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
      if (!collided.isEmpty) return None
    }
    // per-doc state in ONE doc-keyed aggregate: the df-ranked token array
    // (the prefix source; array_sort over (df, shingle) structs replaces
    // the row_number window with identical ordering — ORDER stays keyed by
    // the string shingle in both modes so candidates are representation-
    // independent) and the token-sorted verification array. Pinned:
    // perDoc feeds the prefix self-join's both sides plus the two
    // verification joins; unpinned, the scan->window->aggregate subtree
    // runs once per consumer (the q42 recompute class).
    // explicit width before the pin: the pinned RDD FREEZES its partition
    // count, so every downstream stage (prefix explode, collision join,
    // verification) runs that wide no matter the cluster; the repartition
    // itself moves only doc-count rows
    val perDoc = withDf
      .groupBy("doc_id")
      .agg(
        transform(array_sort(collect_list(struct(col("df"), col("shingle"),
            col("tok")))),
          s => s.getField("tok")).as("by_df"),
        sort_array(collect_list(col("tok"))).as("toks"),
        count(lit(1)).as("c"))
      .repartition(width, col("doc_id"))
      .pin
    // prefix length |x| - ceil(t*|x|) + 1 (Bayardo): any pair with
    // J(A,B) >= t must collide inside both prefixes, so joining on prefix
    // tokens only is LOSSLESS. posexplode keeps each token's rank in the
    // df order (slice positions = full-array positions) for the
    // positional filter below; collision rows stay NARROW (ids, counts,
    // rank) — the verification arrays rejoin from the doc-sized pinned
    // frame afterwards, so candidate volume never multiplies array bytes
    // across the collision shuffle.
    val prefix = perDoc.select(col("doc_id"), col("c"),
        posexplode(slice(col("by_df"), lit(1),
          (col("c") - ceil(lit(minJaccard) * col("c")).cast("long") + 1)
            .cast("int"))))
      .toDF("doc_id", "c", "pos", "tok")
    // two lossless candidate filters, both with 1e-9 slack so FP rounding
    // can only over-admit (the exact verification decides):
    //  - length (Bayardo §3.1): J >= t forces t*max(|A|,|B|) <= min;
    //  - positional (PPJoin, Xiao et al. 2008): a collision at df-ranks
    //    (i, j) bounds the overlap by 1 + min(|A|-i, |B|-j), which must
    //    reach alpha = t/(1+t)*(|A|+|B|); a true pair's FIRST common
    //    token always satisfies the bound, so filtering every collision
    //    row keeps at least that one.
    val alphaFrac = minJaccard / (1.0 + minJaccard)
    val result = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
          && least(col("a.c"), col("b.c")).cast("double")
             >= lit(minJaccard) * greatest(col("a.c"), col("b.c")) - lit(1e-9)
          && (lit(1L) + least(col("a.c") - (col("a.pos") + 1),
                col("b.c") - (col("b.pos") + 1))).cast("double")
             >= lit(alphaFrac) * (col("a.c") + col("b.c")).cast("double") - lit(1e-9))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(first(col("a.c")).as("ca"), first(col("b.c")).as("cb"))
      .join(perDoc.select(col("doc_id").as("doc_a"), col("toks").as("sa")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("toks").as("sb")), "doc_b")
      // |A n B| as a codegen two-pointer merge over the SORTED arrays —
      // no per-pair hash set, long compares on the fast path
      .withColumn("inter",
        graft.functions.SortedIntersectFunctions.sortedIntersectSize(
          docs, col("sa"), col("sb")))
      // filter on the UNROUNDED ratio: the prefix bound is lossless only
      // for true J >= t, so a rounded filter would admit pairs with true J
      // in [t - 5e-7, t) that may have generated no candidate — the output
      // column stays rounded for the cross-engine hash
      .withColumn("_j", col("inter").cast("double") / (col("ca") + col("cb") - col("inter")))
      .filter(col("_j") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("_j"), 6).as("jaccard"))
    Some(result)
  }

  /** Approximate decontamination via a bipartite MinHash band-join — the
    * scale path when the eval/benchmark side is TOO BIG TO BROADCAST
    * (`Curation.decontaminationReport` broadcasts the eval n-gram set;
    * this variant never broadcasts either corpus). Both sides get
    * signatures in one narrow pass each; train and eval bucket rows meet
    * in ONE (band, bucket) group-shuffle; (train, eval) pairs and their
    * slot-match estimates are produced inside the bucket row — never a
    * signature self-join, with the same total-bucket-size skew cap as
    * `minhashCandidates`. Output: per contaminated train doc, the eval
    * near-match count and the max estimate. */
  def minhashDecontamination(train: DataFrame, eval: DataFrame,
                             numHashes: Int = 32, bands: Int = 8,
                             threshold: Double = 0.2, maxBucketSize: Int = 64,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, md5Hex(s"$b:${slice.mkString(",")}"))
      }
    }
    def buckets(docs: DataFrame, side: Int) =
      minhashSignatures(docs, textCol, idCol, numHashes)
        .select(col("doc_id").cast("long").as("doc_id"), col("signature"),
          lit(side).as("side"), explode(bandUdf(col("signature"))).as("band"))
        .select(col("doc_id"), col("signature"), col("side"),
          col("band._1").as("band_idx"), col("band._2").as("bucket"))
    val pairsUdf = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      val (t, e) = members
        .map(r => (r.getInt(2), r.getLong(0), r.getSeq[Long](1).toArray))
        .partition(_._1 == 0)
      for ((_, ia, sa) <- t; (_, ib, sb) <- e) yield {
        var eq = 0
        var k = 0
        while (k < sa.length) { if (sa(k) == sb(k)) eq += 1; k += 1 }
        (ia, ib, eq.toDouble / sa.length)
      }
    }
    buckets(train, 0).unionByName(buckets(eval, 1))
      .groupBy("band_idx", "bucket")
      .agg(collect_list(struct(col("doc_id"), col("signature"), col("side")))
        .as("members"))
      .filter(size(col("members")) <= maxBucketSize)
      .select(explode(pairsUdf(col("members"))).as("p"))
      .select(col("p._1").as("doc_id"), col("p._2").as("eval_id"),
        round(col("p._3"), 6).as("est"))
      .filter(col("est") >= threshold)
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"), max(col("est")).as("max_est"))
  }

  // --- exact k-token substring overlap -------------------------------------

  /** Substring-dedup candidates, the rolling-window form of suffix-based
    * exact-substring deduplication (cf. "Deduplicating Training Data Makes
    * Language Models Better"): pairs of documents sharing at least
    * `minShared` exact k-token windows, with the shared-window count as
    * evidence. Unlike MinHash (whole-doc similarity) this catches a long
    * verbatim span embedded in otherwise-different documents.
    *
    * Scale shape — the MinHash bucket idiom applied to window hashes: one
    * narrow pass hashes each doc's distinct k-token windows (md5, pure
    * Catalyst); ONE group-shuffle of (hash, id) rows collects ids per
    * window; id PAIRS are generated inside the bucket row (capped at
    * `maxBucketSize` — a boilerplate window shared by thousands of docs is
    * exact-dedup's job, not a pair flood); the final (a, b) count
    * aggregation partial-combines map-side, so only bounded id-pair rows
    * ever cross the wire.
    *
    * Ordering contract: run AFTER exact dedup (`curate()` already orders
    * it so). A window hash repeated by millions of surviving exact-dup
    * docs funnels its rows to one partition for the count-window before
    * the cap filter drops it — soak-measured at an adversarial 10%
    * single-text flood: completes correctly (caps hold, flooded bucket
    * excluded) but pays ~8 GB spill / 163 s max task that exact-dedup
    * would have removed upstream. */
  def substringOverlapPairs(docs: DataFrame, k: Int = 8, minShared: Long = 1,
                            maxBucketSize: Int = 64,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    val hashes = array_distinct(transform(sequence(lit(1), size(words) - (k - 1)),
      i => md5(array_join(slice(words, i, lit(k)), " "))))
    // one md5 per rolling window is scan-fused CPU — fan out of an
    // under-parallel scan first (no-op at scale; Parallelism.fanOutScan)
    val win = graft.operators.Parallelism.fanOutScan(docs)
      .filter(size(words) >= k)
      .select(col(idCol).cast("long").as("doc_id"), explode(hashes).as("h"))
    val pairsUdf = udf { (ids: Seq[Long]) =>
      val s = ids.toArray.sorted
      val out = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) { out += ((s(i), s(j))); j += 1 }
        i += 1
      }
      out.result()
    }
    // Window-count-then-collect, NOT groupBy(h).collect_list directly: the
    // window-hash universe is ~corpus token count and almost all hashes are
    // SINGLETONS, so a direct collect_list's map-side ObjectHashAggregate
    // (millions of partition-local keys >> the 128-key fallback threshold)
    // degrades to an external sort of every (h, id) row — soak-measured
    // 138 GB spill / 901 s tasks at 530 M windows. Shuffling the raw rows
    // once and counting over the h-window instead keeps the per-partition
    // work an in-memory sort (rows/partitions sized), drops singletons
    // BEFORE any list materializes, and the surviving collect_list (true
    // duplicate windows only) reuses the same partitioning — one shuffle
    // total, no map-side aggregation of a no-reduction key space.
    // 40 M-doc soak A/B, identical 4 M output pairs: 978.3 s / 138.55 GB
    // spill (collect_list plan) -> 185.6 s / 0.00 GB (this plan).
    val hWin = org.apache.spark.sql.expressions.Window.partitionBy("h")
    win
      .withColumn("c", count(lit(1)).over(hWin))
      .filter(col("c") >= 2 && col("c") <= maxBucketSize)
      .groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(pairsUdf(col("ids"))).as("p"))
      .groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
