package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Relational, DspRelational, Spectral, StreamingQueries, Llm, Analytics, Advanced, Mlops, QueryDef}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (SURVEY.md §2 coverage):
  *  - q01-q11  relational core: aggregation, multi-way/semi/anti joins,
  *             window ranking, distinct aggs, time bucketing, sessions
  *  - q20-q26  the reference's cross-channel operator surface (CAR trimmed
  *             mean, boxcar, z-score, trim/scale, amp/phase, dim joins,
  *             band averaging) — all with exact DuckDB oracles
  *  - q30-q35  the spectral FFT operators (resample/notch/wavelet amp+phase/
  *             pipeline/synthetic source) — exact direct-DFT DuckDB oracles
  *             (SpectralOracles) on top of numpy golden vectors +
  *             reference-test ports in src/test/scala/graft/dsp
  *  - q36-q37, q55-q56  REAL Structured Streaming queries (ST3):
  *             readStream -> watermarked event-time windows -> wavelet
  *             amplitude -> append parquet sink (q36, per-window
  *             direct-DFT oracle); crossfade-context windows stitched
  *             back to the exact original samples (q37); plain windowed
  *             event aggregation (q55); custom per-key state via
  *             mapGroupsWithState Welford stats (q56)
  *  - q40-q54  training-data pipeline extras: dedup (exact, n-gram Jaccard,
  *             MinHash+LSH, SimHash, connected-component cluster
  *             resolution, embedding-cosine near-dup), similarity search
  *             (brute-force cosine, hyperplane LSH, IVF), text analysis
  *             (lang-id, quality, tokens, fingerprint), multimodal binary
  *             columns with real image decode
  *  - q57-q83  corpus curation: decontamination (broadcast q57, MinHash
  *             band-join q66, Bloom bitset q81), Gopher repetition rules,
  *             mixture/stratified sampling, sequence packing (whitespace
  *             q60 + BPE q77), vocabulary/IDF, composed curate + yield
  *             report, substring dedup, streaming dedup (exact q64 +
  *             MinHash q78) + PII scrub, audio/video decode stats, PII
  *             redaction, domain rollups, int8 quantization + quantized
  *             top-k (q80), quality-arbitrated keepers, fixed-merge-table
  *             BPE (q76), per-source Zipf spectrum (q79), count-min
  *             heavy hitters (q83, streaming q84), KMV distinct sketch
  *             (q85), TF-IDF keywords (q86), as-of join (q87), range join
  *             (q88), sliding-window chunking (q89), bigram-LM coverage
  *             scoring (q90), exact distributed quantiles (q91), CUBE
  *             grouping sets (q92), skew-salted join (q93), deterministic
  *             weighted sampling (q94), PMI collocations (q95),
  *             median/MAD robust outliers (q96), trailing RANGE-window
  *             rolling features (q97), ordered funnel conversion (q98),
  *             JSON props extraction (q99), exact Jaccard-threshold join
  *             via prefix filtering (q100), bounded-state histogram
  *             quantiles (q101, streaming q102), streaming session
  *             windows (q103), stream-stream interval join (q104), rolling
  *             z-score anomaly flags (q105), native watermark-bounded
  *             streaming dedup (q106), stream-static dim enrich (q107),
  *             int8-served IVF ANN (q108), n-gram novelty (q109),
  *             inverted index (q110), exact-integer Gramian (q111), PCA
  *             projection (q112), cross-modal semantic buckets (q113),
  *             BM25 retrieval scoring (q114), write-time bucketed layout
  *             with exchange-free co-located join (q115), Z-order
  *             multi-dim clustering (q116), deterministic holdout split
  *             (q117), dense time-grid gap fill + gap census (q118),
  *             HyperLogLog cardinality (q119), signed feature hashing
  *             (q120), chi-square independence screen (q121), grouped
  *             per-source HLL (q122), CDC changelog compaction (q123),
  *             behavioral sequence bigrams (q124), Bloom semi-join
  *             reduction (q125), language-ID confusion matrix (q126),
  *             KMV join-cardinality estimation (q127), referential
  *             integrity audit (q128), per-column table profile (q129),
  *             blocked fuzzy entity matching (q130), time-weighted
  *             averages (q131), date-column latency stats (q132),
  *             market-basket association lift (q133), PIVOT wide-format
  *             export (q134), INTERSECT/EXCEPT set algebra (q135),
  *             equi-depth ntile binning (q136), integer-exact
  *             above-group-mean screen (q137), streaming CDC compaction
  *             twin (q138), nearest-rank winsorization (q139),
  *             integer-grid trend regression (q140)
  *  - q141-q144 warehouse/graph analytics (queries/Analytics.scala):
  *             SCD Type-2 validity intervals (q141), MERGE upsert of a
  *             compacted CDC delta (q142), degree-oriented triangle
  *             census (q143), integer-grid fixed-iteration PageRank
  *             (q144) — both graph ops over a co-purchase edge list
  *             built by in-row pair generation; cohort retention matrix
  *             (q145), daily growth accounting (q146), OHLC time bars
  *             via the max-struct argmax idiom (q147),
  *             sorted-neighborhood dedup candidates (q148), label-centroid
  *             cosine matrix on the integer grid (q149), UNPIVOT/melt
  *             export (q150), last-touch attribution via as-of join
  *             (q151), DAU/WAU rolling actives (q152), streaming OHLC
  *             twin (q153), behavioral sequence-pattern census (q154),
  *             day-activity bitmap segmentation (q155), conversion
  *             latency quantiles (q156), join-key skew/Gini report (q157),
  *             incremental aggregate-state maintenance (q158),
  *             partition-pruned secondary-index term probe (q159),
  *             ties-included top-k (q160), debounce/rate-limit dedup
  *             census (q161), cross-table revenue reconciliation audit
  *             (q162), nested denormalized export with md5 content pin
  *             (q163)
  *  - q164-q174 spectral estimation + sequential analytics
  *             (queries/Advanced.scala): Welch averaged-periodogram PSD
  *             (q164), cross-channel lag correlation (q165), exponentially
  *             time-decayed engagement scores (q166), bounded-hop weighted
  *             shortest paths (q167), CUSUM mean-shift drift detection
  *             (q168), small-file compaction planning (q169), trending
  *             minute-window z-scores (q170), Welch magnitude-squared
  *             coherence (q171), corpus-half Jensen-Shannon vocabulary
  *             drift (q172), per-minute event-type Pearson correlation
  *             matrix (q173), streaming fixed-anchor decayed engagement
  *             (q174, in StreamingQueries), frequent 3-itemsets (q175),
  *             bucketed two-level global revenue ranking (q176),
  *             functional-dependency mining (q177), k-anonymity risk
  *             census (q178), syllable-based readability profile (q179),
  *             quantile normalization (q180), cohort churn census (q181),
  *             two-proportion A/B z-test (q182), real-decode image tile
  *             sums (q183), deterministic bootstrap CIs (q184), column
  *             entropy profile (q185), streaming A/B store (q186, in
  *             StreamingQueries), exact weighted quantiles (q187),
  *             conversion path census (q188), generated calendar
  *             dimension (q189), per-dimension embedding profile (q190),
  *             pure spark.sql() TPC-H Q3 shape (q191), amplitude-envelope
  *             correlation connectivity (q192), time-bounded 3-step
  *             funnel (q193), sweep-line interval concurrency (q194),
  *             closed-form hierarchy rollup (q195), event-time disorder
  *             census (q196), degree distribution + power-law fit (q197),
  *             boxplot quantile bands (q198), month-over-month revenue
  *             (q199), largest-remainder proration (q200), bucketed
  *             key-gap islands (q201), Pareto concentration via
  *             distributed prefix sums (q202), linear multi-touch
  *             attribution (q203), RFM quintile segmentation (q204),
  *             cohort lifetime-value curves (q205), streaming trending
  *             detector (q206, in StreamingQueries), instantaneous
  *             frequency from wavelet phase (q207), Kaplan-Meier survival
  *             with censoring (q208), weekly seasonality index (q209),
  *             audience-overlap Jaccard matrix (q210), lexical burstiness
  *             Fano factors (q211), degree assortativity (q212),
  *             Heaps-law vocabulary growth (q213), Benford first-digit
  *             audit (q214), ROLLUP revenue hierarchy (q215),
  *             grid-bucketed spatial neighbor join (q216, operators/
  *             Spatial.scala), Markov transition conditional entropy (q217),
  *             bounded k-core peeling census (q218, Graph.boundedKCorePeel),
  *             tie-aware Spearman rank correlation (q219), tie-corrected
  *             Mann-Kendall trend test (q220), per-node local clustering
  *             coefficients (q221, Graph.localClustering), dense-grid
  *             autocorrelation function (q222), two-sample
  *             Kolmogorov-Smirnov distance (q223), reciprocal-rank fusion
  *             of BM25 + term-density retrieval (q224), streaming Markov
  *             transition store (q225, in StreamingQueries), Theil-Sen
  *             robust trend slope (q226), hour-of-day profile L1 distance
  *             matrix (q227), information-gain feature screen (q228),
  *             per-user KL-divergence anomaly screen (q229), Q-Q decile
  *             shift profile (q230), sorted-neighborhood blocking recall
  *             audit (q231), binary-segmentation change-point localization
  *             (q232), lead-lag cross-correlation matrix (q233), closed-form
  *             OLS via Cramer on exact moments (q234), grid-density
  *             clustering / DBSCAN-lite (q235, Spatial.gridDensityClusters),
  *             bounded Lloyd k-means with WCSS (q236,
  *             Spatial.lloydIterations), asymmetric shingle containment
  *             join (q237), Horvitz-Thompson AQP audit (q238), streaming
  *             AQP store (q239, in StreamingQueries), MinHash-vs-exact
  *             containment sketch audit (q240), per-source exclusive-shingle
  *             provenance census (q241), co-temporal event-type lift (q242),
  *             dedup storage-savings report (q243), phase-amplitude
  *             coupling / Tort modulation index (q244), high-gamma burst
  *             census (q245), event-related epoch averaging (q246),
  *             spectral edge frequency (q247), per-channel signal QC
  *             census (q248), out-of-sample OLS holdout audit (q249),
  *             distributed logistic regression via exact-replay Newton
  *             iterations (q250), integer-exact naive Bayes classifier
  *             (q251), max-IG decision stump (q252), Welch's t-test (q253),
  *             Mann-Whitney U + Cliff's delta (q254), PSI feature-drift
  *             gate (q255), Kruskal-Wallis k-sample test (q256), CUPED
  *             variance-reduction audit (q257), streaming PSI drift store
  *             (q258, in StreamingQueries), fixed-effect meta-analysis
  *             pooling (q259), Theil-T inequality with within/between
  *             decomposition (q260), per-nation Gini coefficients (q261),
  *             Poisson bootstrap CI (q262), out-of-fold target encoding
  *             (q263), hash-deterministic negative sampling (q264),
  *             Matryoshka truncation audit (q265), Johnson-Lindenstrauss
  *             distortion audit (q266), l-diversity census (q267),
  *             discrete-Laplace DP histogram (q268), Cohen's kappa for the
  *             language-ID predictor (q269), streaming Poisson bootstrap
  *             (q270, in StreamingQueries), lang-ID calibration bins
  *             (q271), k-NN label-noise screen (q272), exact integer
  *             point-in-polygon geofence rollup (q273), isolation-grid
  *             anomaly screen (q274), consistent-hashing rebalance audit
  *             (q275), seasonal-naive MASE forecast gate (q276),
  *             distributed 2-D skyline (q277)
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    Relational.defs ++ DspRelational.defs ++ Spectral.defs ++
      StreamingQueries.defs ++ Llm.defs ++ Analytics.defs ++ Advanced.defs ++
      Mlops.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full preprocess pipeline (resample -> notch -> CAR -> wavelet ->
    * z-scored high-gamma) over the events table channelized 8-wide. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q33_pipeline_high_gamma").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a rows-only check). */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
