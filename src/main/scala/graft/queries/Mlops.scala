package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryDef.table

/** ML-data-pipeline operators: the statistical tooling a training-data
  * platform runs NEXT TO curation — uncertainty quantification (Poisson
  * bootstrap), leakage-free feature prep (out-of-fold target encoding),
  * contrastive-pair generation (hash-deterministic negative sampling),
  * embedding-capacity audits (Matryoshka truncation, Johnson-Lindenstrauss
  * distortion), and privacy release gates (l-diversity, discrete-Laplace DP
  * counts).
  *
  * Cross-engine exactness contract (the q250/q112 idiom): every random
  * draw is an md5-derived 60-bit integer compared against PRE-COMPUTED
  * integer thresholds (embedded as identical literals in the Spark plan
  * and the oracle SQL — no float math crosses the engine boundary), and
  * every float reduction is micro-rounded onto an integer grid before the
  * order-free long sum.
  */
object Mlops {

  private val Two60 = 1152921504606846976.0 // 2^60, the sampleHash range

  /** 60-bit uniform from md5, as a SQL-dialect expression string.
    * `spark = true` emits Spark's conv(); false emits DuckDB's 0x-cast.
    * Both produce the SAME integer for the same salt string. */
  private def u60(saltConcat: String, spark: Boolean): String =
    if (spark)
      s"CAST(conv(substring(md5($saltConcat), 1, 15), 16, 10) AS BIGINT)"
    else // 15 hex chars < 2^60, so the BIGINT cast is lossless
      s"CAST(CAST(('0x' || substr(md5($saltConcat), 1, 15)) AS UBIGINT) AS BIGINT)"

  /** CASE chain mapping a uniform u against cumulative integer thresholds:
    * value k where u < thresholds(k), else `values.last`. Used verbatim in
    * both engines, so the sampled value is identical by construction. */
  private def thresholdCase(uExpr: String, thresholds: Seq[Long],
                            values: Seq[Long]): String = {
    val whens = thresholds.zip(values.init).map { case (t, v) =>
      s"WHEN $uExpr < $t THEN $v"
    }.mkString(" ")
    s"CASE $whens ELSE ${values.last} END"
  }

  /** Cumulative Poisson(1) CDF scaled to the 2^60 grid, clipped at 6.
    * Computed once on the driver; both engines see only the literals. */
  private val PoissonThresholds: Seq[Long] = {
    val p0 = math.exp(-1.0)
    val pmf = (0 to 6).map(k => (1 to k).foldLeft(p0)((a, j) => a / j)) // e^-1/k!
    pmf.scanLeft(0.0)(_ + _).tail.init // cumulative CDF for k = 0..5
      .map(c => math.floor(c * Two60).toLong)
  }

  /** Two-sided geometric (discrete Laplace) thresholds for the DP count
    * mechanism: alpha = e^(-1/2) (epsilon = 0.5 per unit sensitivity),
    * support clipped to [-8, 8]. F(k) thresholds for k = -8..7. */
  private val GeometricThresholds: Seq[Long] = {
    val alpha = math.exp(-0.5)
    val p0 = (1 - alpha) / (1 + alpha)
    def p(k: Int): Double = p0 * math.pow(alpha, math.abs(k))
    val mass = (-8 to 8).map(p)
    mass.scanLeft(0.0)(_ + _).tail.init
      .map(c => math.floor(c * Two60).toLong)
  }

  /** Data-independent ±1 Johnson-Lindenstrauss sign matrix (8 x 64), signs
    * drawn from md5("jl:j:i") parity — the same bytes DuckDB's md5 yields,
    * so the oracle can REBUILD the matrix instead of trusting literals. */
  private def jlSign(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"jl:$j:$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1 else -1
  }

  // test hooks (the constants the oracles embed)
  private[queries] def poissonThresholdsForTest: Seq[Long] = PoissonThresholds
  private[queries] def geometricThresholdsForTest: Seq[Long] = GeometricThresholds
  private[queries] def jlSignForTest(j: Int, i: Int): Int = jlSign(j, i)

  /** Shared with the streaming twin (q270): the Poisson(1) weight CASE over
    * a dialect-specific uniform — same literals in every engine. */
  private[queries] def poissonWeightCase(saltConcat: String, spark: Boolean): String =
    thresholdCase(u60(saltConcat, spark), PoissonThresholds, (0L to 6L))

  /** The q273 geofence: a non-convex simple hexagon on the 10^7 micro-
    * degree grid (counter-clockwise, with a notch at (5e6, 3e6)). */
  private val FencePolygon: Seq[(Long, Long)] = Seq(
    (2000000L, 1000000L), (8000000L, 1000000L), (8000000L, 4000000L),
    (5000000L, 3000000L), (5000000L, 7000000L), (2000000L, 7000000L))

  /** Even-odd ray-cast crossing count as ONE generated integer expression —
    * identical text for Spark and DuckDB. Per edge (x1,y1)->(x2,y2) with
    * y1 != y2: the ray at height py crosses iff py is in the half-open
    * y-span and the point sits on the interior side of the directed edge,
    * tested by the sign of the integer cross product
    * (x2-x1)*(py-y1) - (px-x1)*(y2-y1). All literals fold; products stay
    * under 1e14. */
  private def crossingsExpr(px: String, py: String): String = {
    val n = FencePolygon.size
    val terms = (0 until n).map { k =>
      val (x1, y1) = FencePolygon(k)
      val (x2, y2) = FencePolygon((k + 1) % n)
      require(y1 != y2 || x1 != x2, "degenerate edge")
      if (y1 == y2) "0" // horizontal edge never crosses the horizontal ray
      else {
        val span =
          if (y2 > y1) s"$py >= $y1 AND $py < $y2" else s"$py >= $y2 AND $py < $y1"
        val cmp = if (y2 > y1) ">" else "<"
        s"(CASE WHEN $span THEN (CASE WHEN " +
          s"(${x2 - x1}) * ($py - $y1) - ($px - $x1) * (${y2 - y1}) $cmp 0 " +
          "THEN 1 ELSE 0 END) ELSE 0 END)"
      }
    }
    terms.mkString(" + ")
  }

  /** q274: trees x levels oblivious-partition thresholds on the 1e7 grid. */
  private val IsoTrees = 4
  private val IsoLevels = 8

  /** md5-derived micro-degree coordinate (the q216 'geo:' hash family) as a
    * dialect expression over `user_id`. */
  private def geoCoordExpr(axis: String, spark: Boolean): String =
    if (spark)
      s"CAST(conv(substring(md5(concat('geo:', CAST(user_id AS STRING), " +
        s"':$axis')), 1, 15), 16, 10) AS BIGINT) % 10000000"
    else
      s"CAST(CAST(('0x' || substr(md5('geo:' || user_id || ':$axis'), 1, 15)) " +
        "AS UBIGINT) % 10000000 AS BIGINT)"

  /** The md5-derived split threshold for (tree, level) — a pure literal at
    * generation time, identical in both engines by construction. */
  private def isoThreshold(t: Int, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"iso:$t:$k".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10000000L
  }

  /** Leaf id of tree `t`: 8 threshold bits over alternating axes, all
    * literals folded into one integer expression. */
  private def isoLeafExpr(t: Int, px: String, py: String): String =
    (0 until IsoLevels).map { k =>
      val coord = if (k % 2 == 0) px else py
      s"(CASE WHEN $coord >= ${isoThreshold(t, k)} THEN ${1 << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** q275: the 32-node x 8-vnode ring, positions md5-derived at generation
    * time (literals in both engines). Collisions are theoretically possible
    * and harmless (two vnodes at one position — argmin ties broken by the
    * smaller distance value only, which is equal, then by nothing: avoid by
    * construction below, asserting uniqueness). */
  private val ringPoints: Seq[(Long, Long)] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val pts = for (n <- 0L until 32L; v <- 0L until 8L) yield {
      val hex = md5.digest(s"ring:$n:$v".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16), n)
    }
    require(pts.map(_._1).distinct.size == pts.size, "ring position collision")
    pts
  }

  /** q278 body, factored for spec access: per-(type,user) counts, the true
    * pairwise join size, and two planner-grade estimates (System-R uniform
    * containment; end-biased histogram over the union of per-type top-`hhK`
    * users with a uniform tail). One map-combined shuffle builds `cnt`;
    * the true count is a self-join of `cnt` on the user key (shared
    * exchange); every other frame is |types| or |types|² rows. */
  private[queries] def joinCardinalityAudit(
      events: org.apache.spark.sql.DataFrame,
      hhK: Int = 20): org.apache.spark.sql.DataFrame = {
    import graft.operators.Checkpoints.Pinnable
    val cnt = events
      .groupBy(col("event_type").as("t"), col("user_id").as("u"))
      .agg(count(lit(1)).as("c")).pin // four consumers
    val stats = cnt.groupBy("t")
      .agg(sum("c").as("n"), count(lit(1)).as("d"))
    val wTop = Window.partitionBy("t").orderBy(col("c").desc, col("u"))
    val heavyUsers = cnt.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= hhK).select("u").distinct()
    val cntH = cnt.join(broadcast(heavyUsers), "u")
    val hstats = cntH.groupBy("t")
      .agg(sum("c").as("nh"), count(lit(1)).as("dh"))
    val hh = cntH.as("a").join(cntH.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(sum(col("a.c") * col("b.c")).as("hh_pairs"))
    val tr = cnt.as("a").join(cnt.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(sum(col("a.c") * col("b.c")).as("true_pairs"))
    val sa = stats.select(col("t").as("ta"), col("n").as("n_a"),
      col("d").as("d_a"))
    val sb = stats.select(col("t").as("tb"), col("n").as("n_b"),
      col("d").as("d_b"))
    val ha = hstats.select(col("t").as("ta"), col("nh").as("nh_a"),
      col("dh").as("dh_a"))
    val hb = hstats.select(col("t").as("tb"), col("nh").as("nh_b"),
      col("dh").as("dh_b"))
    sa.crossJoin(sb).filter(col("ta") < col("tb"))
      .join(ha, Seq("ta"), "left").join(hb, Seq("tb"), "left")
      .join(hh, Seq("ta", "tb"), "left")
      .join(tr, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("nh_a", "dh_a", "nh_b", "dh_b",
        "hh_pairs", "true_pairs"))
      .withColumn("est_uniform",
        expr("(n_a * n_b) div greatest(d_a, d_b, CAST(1 AS BIGINT))"))
      .withColumn("est_hh",
        expr("""hh_pairs + ((n_a - nh_a) * (n_b - nh_b))
               | div greatest(d_a - dh_a, d_b - dh_b, CAST(1 AS BIGINT))"""
          .stripMargin))
      .withColumn("err_uniform_e6",
        expr("""CASE WHEN true_pairs = 0 THEN NULL ELSE
               | CAST(round(est_uniform * 1000000.0 / true_pairs)
               |   AS BIGINT) END""".stripMargin))
      .withColumn("err_hh_e6",
        expr("""CASE WHEN true_pairs = 0 THEN NULL ELSE
               | CAST(round(est_hh * 1000000.0 / true_pairs)
               |   AS BIGINT) END""".stripMargin))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("d_a"),
        col("d_b"), col("true_pairs"), col("est_uniform"), col("est_hh"),
        col("err_uniform_e6"), col("err_hh_e6"))
      .orderBy("ta", "tb")
  }


  /** q284 SQL fragments — ONE template for BOTH engines (dialect
    * substitution only: integer-div operator, nanos extraction, relation
    * names), so the fixed point is structurally identical across engines.
    * Split into stages because Spark INLINES every CTE: referencing the
    * journey subtree from all `rounds` iteration steps would replan the
    * corpus scan per round, so the Spark path materializes (pins) the
    * bounded transition/variant frames and iterates over THOSE views,
    * while the DuckDB oracle composes the same fragments as one WITH. */
  private def mkDiv(spark: Boolean)(a: String, b: String): String =
    if (spark) s"(($a) div ($b))" else s"(($a) // ($b))"

  /** fp/pre/seq/starts/trans: journeys cut at first purchase, transition
    * counts including START edges — one user-keyed window pass. */
  private def markovTransCtes(spark: Boolean): String = {
    def NS(c: String) =
      if (spark) s"CAST($c AS BIGINT)" else s"epoch_ns($c)"
    val ev = if (spark) "mk_events" else "events"
    s"""fp AS (
       |  SELECT user_id, min(${NS("ts")}) AS fts FROM $ev
       |  WHERE event_type = 'purchase' GROUP BY 1
       |),
       |pre AS (
       |  SELECT e.user_id, e.event_type AS ch, ${NS("e.ts")} AS tsn,
       |    e.event_id AS eid,
       |    CASE WHEN fp.fts IS NOT NULL THEN 1 ELSE 0 END AS conv
       |  FROM $ev e LEFT JOIN fp ON fp.user_id = e.user_id
       |  WHERE fp.fts IS NULL OR ${NS("e.ts")} < fp.fts
       |),
       |seq AS (
       |  SELECT user_id, ch AS src,
       |    COALESCE(lead(ch) OVER (PARTITION BY user_id ORDER BY tsn, eid),
       |      CASE WHEN conv = 1 THEN 'CONV' ELSE 'NULL' END) AS dst,
       |    row_number() OVER (PARTITION BY user_id ORDER BY tsn, eid) AS rn
       |  FROM pre
       |),
       |starts AS (
       |  SELECT 'START' AS src, src AS dst FROM seq WHERE rn = 1
       |  UNION ALL
       |  SELECT 'START' AS src, 'CONV' AS dst FROM fp
       |  WHERE user_id NOT IN (SELECT user_id FROM pre)
       |),
       |trans AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT src, dst FROM seq UNION ALL SELECT src, dst FROM starts
       |  ) u GROUP BY 1, 2
       |)""".stripMargin
  }

  /** chans/variants/tv over a transition relation: per removal variant,
    * transitions INTO the removed channel redirect to NULL and rows FROM
    * it drop (node replaced by the absorbing NULL state). */
  private def markovVariantCtes(transRef: String): String =
    s"""chans AS (SELECT DISTINCT src AS ch FROM $transRef
       |  WHERE src <> 'START'),
       |variants AS (SELECT 'none' AS v UNION ALL SELECT ch AS v FROM chans),
       |tv AS (
       |  SELECT va.v, t.src,
       |    CASE WHEN t.dst = va.v THEN 'NULL' ELSE t.dst END AS dst,
       |    CAST(sum(t.cnt) AS BIGINT) AS cnt
       |  FROM variants va JOIN $transRef t ON t.src <> va.v
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  /** p0..pN value iteration on the e12 integer grid over (variant, state)
    * — p'(s) = (sum_d cnt[s,d]*p(d)) div out(s), CONV pinned to 1e12,
    * NULL to 0 — plus the removal-effect/share final select. */
  private def markovIterTail(spark: Boolean, rounds: Int,
                             tvRef: String, outsRef: String): String = {
    val DIV = mkDiv(spark) _
    val iters = (1 to rounds).map { r =>
      val p = r - 1
      s"""p$r AS (
         |  SELECT t.v, t.src AS state,
         |    ${DIV(
        "CAST(sum(t.cnt * CASE WHEN t.dst = 'CONV' THEN 1000000000000 " +
          "WHEN t.dst = 'NULL' THEN 0 ELSE COALESCE(p.p, 0) END) AS BIGINT)",
        "max(o.outc)")} AS p
         |  FROM $tvRef t JOIN $outsRef o ON o.v = t.v AND o.src = t.src
         |  LEFT JOIN p$p p ON p.v = t.v AND p.state = t.dst
         |  GROUP BY t.v, t.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""p0 AS (SELECT v, src AS state, CAST(0 AS BIGINT) AS p
       |  FROM $outsRef WHERE 1 = 0),
       |$iters,
       |res AS (SELECT v, p FROM p$rounds WHERE state = 'START'),
       |fullp AS (SELECT p AS p_full FROM res WHERE v = 'none'),
       |eff AS (
       |  SELECT r.v AS channel, f.p_full,
       |    greatest(f.p_full - r.p, 0) AS drop_e12, r.p AS p_removed
       |  FROM res r CROSS JOIN fullp f WHERE r.v <> 'none'
       |),
       |tot AS (SELECT CAST(sum(drop_e12) AS BIGINT) AS t FROM eff)
       |SELECT e.channel, e.p_full AS p_full_e12, e.p_removed AS p_removed_e12,
       |  CASE WHEN e.p_full = 0 THEN NULL
       |    ELSE ${DIV("e.drop_e12 * 1000000", "e.p_full")} END AS removal_e6,
       |  CASE WHEN t.t = 0 THEN NULL
       |    ELSE ${DIV("e.drop_e12 * 1000000", "t.t")} END AS share_e6
       |FROM eff e CROSS JOIN tot t
       |ORDER BY e.channel""".stripMargin
  }

  private val MarkovOutsSelect =
    "SELECT v, src, CAST(sum(cnt) AS BIGINT) AS outc FROM %s GROUP BY 1, 2"

  /** q280 probe ranges (integer dollars, half-open): broad spans, the full
    * domain, and a narrow 100-dollar slice where uniform-within-bucket
    * interpolation has to work hardest. */
  private val ProbeRanges: Seq[(Long, Long)] = Seq(
    (900L, 105000L), (1000L, 2000L), (2000L, 5000L), (5000L, 10000L),
    (10000L, 20000L), (20000L, 40000L), (40000L, 70000L),
    (50000L, 50100L), (70000L, 105000L))


  /** q286 probe day ranges (half-open, days since epoch), spanning the
    * 1995-2001 ship-date domain: year, quarter-ish, narrow two-week, and
    * full-domain scans. */
  private val ZonemapProbes: Seq[(Long, Long)] = {
    def d(s: String): Long = java.time.LocalDate.parse(s).toEpochDay
    Seq((d("1996-01-01"), d("1997-01-01")),
      (d("1998-02-01"), d("1998-05-01")),
      (d("2000-01-01"), d("2001-01-01")),
      (d("1999-07-01"), d("1999-07-15")),
      (d("1995-01-01"), d("2002-01-01")))
  }


  /** q290 candidate slopes (cents per quantity unit), log-spaced across
    * the observed price/qty ratio range (p05 ≈ 24k, p95 ≈ 1.8M cents). */
  private val PinballSlopes: Seq[Long] = Seq(
    20000L, 30000L, 45000L, 65000L, 90000L, 120000L, 160000L, 210000L,
    280000L, 370000L, 490000L, 650000L, 860000L, 1140000L, 1500000L,
    2000000L, 2600000L)


  /** q294's fixed point model: the q290 median-tau winning slope
    * (cents per quantity unit), embedded as the same literal in both
    * engines. */
  private val ConformalSlope = 160000L

  /** q296: raking (iterative proportional fitting) as ONE SQL template
    * for both engines over a cells relation (n_name, pr, cnt). `rounds`
    * alternating row/column passes on the e6 weight grid; scale factors
    * carry e6 precision via factor_e6 = target·1e12 div marginsum (sums
    * are e6-scaled), so every weight stays an exact BIGINT. Row targets
    * are UNIFORM across nations (the calibration ask); column targets are
    * the observed priority margins. */
  private def rakingSql(spark: Boolean, rounds: Int, cellsRef: String): String = {
    val DIV = mkDiv(spark) _
    // each pass references its predecessor exactly ONCE (margin sums via
    // window functions, not self-joins) — a second reference would double
    // the inlined plan per pass and blow up analysis exponentially.
    val passes = new StringBuilder
    var k = 0
    for (_ <- 1 to rounds) {
      // row pass (nation margin -> uniform target)
      passes.append(s""",
        |w${k + 1} AS (
        |  SELECT n_name, pr, cnt,
        |    ${DIV(
        s"w * ${DIV("(SELECT t FROM t1) * 1000000000000",
          "CAST(sum(cnt * w) OVER (PARTITION BY n_name) AS BIGINT)")}",
        "1000000")} AS w
        |  FROM w$k
        |)""".stripMargin)
      k += 1
      // column pass (priority margin -> observed target)
      passes.append(s""",
        |w${k + 1} AS (
        |  SELECT c.n_name, c.pr, c.cnt,
        |    ${DIV(
        s"c.w * ${DIV("ct.t * 1000000000000",
          "CAST(sum(c.cnt * c.w) OVER (PARTITION BY c.pr) AS BIGINT)")}",
        "1000000")} AS w
        |  FROM w$k c JOIN ct ON ct.pr = c.pr
        |)""".stripMargin)
      k += 1
    }
    s"""WITH w0 AS (
       |  SELECT n_name, pr, cnt, CAST(1000000 AS BIGINT) AS w
       |  FROM $cellsRef
       |),
       |tots AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS tot,
       |    CAST(count(DISTINCT n_name) AS BIGINT) AS nn FROM w0
       |),
       |t1 AS (SELECT ${DIV("tot", "nn")} AS t FROM tots),
       |ct AS (SELECT pr, CAST(sum(cnt) AS BIGINT) AS t FROM w0 GROUP BY 1)
       |${passes.result()}
       |SELECT n_name AS nation, pr AS priority, cnt, w AS w_e6,
       |  ${DIV("cnt * w", "1000000")} AS weighted
       |FROM w$k ORDER BY nation, priority""".stripMargin
  }


  /** q301's reference process model: the allowed directly-follows pairs,
    * quoted for an IN list — identical literal text in both engines. */
  private val ConformanceAllowed: String = Seq(
    "view>view", "view>click", "view>purchase", "click>view",
    "click>purchase", "signup>view", "signup>click", "purchase>view")
    .map(p => s"'$p'").mkString(", ")

  /** q306 DCG position weights: round(1e6 / log2(i+1)) for ranks 1..10 —
    * driver-computed literals, identical in both engines, so the graded
    * gain sum is an exact integer dot product. */
  private val NdcgWeights: Seq[Long] = (1 to 10).map(i =>
    math.round(1e6 / (math.log(i + 1) / math.log(2))))


  /** q310 probe rectangles (day-index rows ra..rb, hour columns ca..cb,
    * inclusive): a week of all hours, one business day, the noon column,
    * a broad interior block, and the full grid. */
  private val CubeProbes: Seq[(Long, Long, Long, Long)] = Seq(
    (0L, 6L, 0L, 23L), (2L, 2L, 9L, 17L), (0L, 29L, 12L, 12L),
    (5L, 20L, 3L, 21L), (0L, 29L, 0L, 23L))


  /** q313's stopword set: the union of TextAnalysis.Stopwords across all
    * five languages — the same public lists the lang-id family certifies
    * against. */
  private val RakeStops: Seq[String] =
    graft.text.TextAnalysis.Stopwords.flatMap(_._2).distinct

  /** q316's oracle — shared verbatim with its streaming twin q324
    * (the q287/q308 twin discipline: same SQL certifies both the
    * batch fold and the stateful recompute). */
  private[queries] val CappedSessionsOracle: String =
    """|WITH e AS (
              |  SELECT user_id, epoch_ns(ts) AS tn, event_id FROM events
              |), ser AS (
              |  SELECT user_id, list(tn ORDER BY tn, event_id) AS ser
              |  FROM e GROUP BY 1
              |), folded AS (
              |  SELECT user_id, CAST(len(ser) AS BIGINT) AS n_events,
              |    list_reduce(
              |      list_prepend(
              |        '1,' || CAST(ser[1] AS VARCHAR) || ',' ||
              |          CAST(ser[1] AS VARCHAR) || ',1,1,0',
              |        list_transform(list_slice(ser, 2, len(ser)),
              |          t -> CAST(t AS VARCHAR))),
              |      (acc, s) -> CASE
              |        WHEN CAST(s AS BIGINT)
              |            - CAST(string_split(acc, ',')[3] AS BIGINT)
              |            > 43200000000000
              |          OR CAST(s AS BIGINT)
              |            - CAST(string_split(acc, ',')[2] AS BIGINT)
              |            > 86400000000000
              |        THEN CAST(CAST(string_split(acc, ',')[1] AS BIGINT)
              |            + 1 AS VARCHAR) || ',' ||
              |          s || ',' || s || ',1,' ||
              |          string_split(acc, ',')[5] || ',' ||
              |          CAST(CAST(string_split(acc, ',')[6] AS BIGINT)
              |            + CASE WHEN CAST(s AS BIGINT)
              |                - CAST(string_split(acc, ',')[3] AS BIGINT)
              |                <= 43200000000000 THEN 1 ELSE 0 END
              |            AS VARCHAR)
              |        ELSE string_split(acc, ',')[1] || ',' ||
              |          string_split(acc, ',')[2] || ',' || s || ',' ||
              |          CAST(CAST(string_split(acc, ',')[4] AS BIGINT)
              |            + 1 AS VARCHAR) || ',' ||
              |          CAST(greatest(
              |            CAST(string_split(acc, ',')[5] AS BIGINT),
              |            CAST(string_split(acc, ',')[4] AS BIGINT) + 1)
              |            AS VARCHAR) || ',' ||
              |          string_split(acc, ',')[6]
              |      END) AS st
              |  FROM ser
              |)
              |SELECT user_id, n_events,
              |  CAST(string_split(st, ',')[1] AS BIGINT) AS n_sessions,
              |  CAST(string_split(st, ',')[6] AS BIGINT) AS n_cap_splits,
              |  CAST(string_split(st, ',')[5] AS BIGINT) AS max_sess_events
              |FROM folded ORDER BY user_id""".stripMargin

  private val PprScale = 1000000000000L

  private val HitsScale = 1000000L

  /** One unrolled HITS round for the q339 oracle: authority pass (sum of
    * hub scores over in-edges, rescaled to the integer grid by the round
    * max), then hub pass symmetrically. */
  private def hitsRoundSql(k: Int): String =
    s"""ar$k AS (
       |  SELECT e.p, CAST(sum(h.s) AS BIGINT) AS raw
       |  FROM be e JOIN h${k - 1} h ON h.u = e.u GROUP BY 1
       |), am$k AS (SELECT max(raw) AS mx FROM ar$k),
       |a$k AS (
       |  SELECT p, (raw * $HitsScale) // (SELECT mx FROM am$k) AS s
       |  FROM ar$k
       |), hr$k AS (
       |  SELECT e.u, CAST(sum(a.s) AS BIGINT) AS raw
       |  FROM be e JOIN a$k a ON a.p = e.p GROUP BY 1
       |), hm$k AS (SELECT max(raw) AS mx FROM hr$k),
       |h$k AS (
       |  SELECT u, (raw * $HitsScale) // (SELECT mx FROM hm$k) AS s
       |  FROM hr$k
       |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q262_poisson_bootstrap",
      "Poisson bootstrap of mean order value: 32 hash-seeded replicates, integer-threshold weights",
      // THE distributed bootstrap: resampling n rows with replacement is a
      // shuffle-free per-row draw when the multinomial is approximated by
      // independent Poisson(1) weights. Each (row, replicate) weight comes
      // from one md5 uniform vs the cumulative-CDF integer thresholds, so
      // any engine/cluster layout reproduces the exact same replicates.
      // Plan: one scan -> Generate(32 replicates) -> 32-group partial agg;
      // map-side combine does all the work, the exchange carries 32 rows
      // per task. At 100 TB this is the only uncertainty method that
      // needs NO second pass and NO per-group state.
      (s, dir) => {
        val u = u60("concat('boot:', CAST(b AS STRING), ':', CAST(o_orderkey AS STRING))",
          spark = true)
        val w = thresholdCase(u, PoissonThresholds, (0L to 6L))
        table(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .select(col("o_orderkey"), col("cents"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .select(col("b"), col("cents"), expr(w).as("w"))
          .groupBy("b")
          .agg(sum("w").as("n_eff"), sum(expr("w * cents")).as("sum_cents"))
          .select(col("b").cast("int").as("b"), col("n_eff"), col("sum_cents"),
            round(col("sum_cents").cast("double") / col("n_eff"), 6).as("boot_mean"))
          .orderBy("b")
      },
      Some {
        val u = u60("'boot:' || b || ':' || o_orderkey", spark = false)
        val w = thresholdCase(u, PoissonThresholds, (0L to 6L))
        s"""|WITH o AS (
            |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            |  FROM orders
            |), fan AS (
            |  SELECT o.o_orderkey, o.cents, u.b, $w AS w
            |  FROM o CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) u
            |)
            |SELECT CAST(b AS INT) AS b,
            |  CAST(sum(w) AS BIGINT) AS n_eff,
            |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
            |  round(CAST(CAST(sum(w * cents) AS BIGINT) AS DOUBLE)
            |    / CAST(sum(w) AS BIGINT), 6) AS boot_mean
            |FROM fan GROUP BY b ORDER BY b""".stripMargin
      }),

    QueryDef("q263_target_encoding",
      "leakage-free out-of-fold target encoding of order priority (5 hash folds)",
      // the categorical-encoding prep step done WITHOUT leakage: each fold's
      // encoding uses only the OTHER folds' target sums. One (cat, fold)
      // aggregate + a cat-partitioned window over the 25-row grid — the
      // heavy work is a single map-combined shuffle; the leave-one-out
      // arithmetic runs on the bounded grid. Folds are md5-deterministic,
      // so train/serve skew is impossible by construction.
      (s, dir) => {
        val u = u60("concat('fold:', CAST(o_orderkey AS STRING))", spark = true)
        val g = table(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            (expr(u) % 5).as("fold"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .groupBy("priority", "fold")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        val w = Window.partitionBy("priority")
        g.select(col("priority"), col("fold"), col("n"),
            round((sum("s").over(w) - col("s")).cast("double") /
              (sum("n").over(w) - col("n")), 6).as("oof_encoding"))
          .orderBy("priority", "fold")
      },
      Some {
        val u = u60("'fold:' || o_orderkey", spark = false)
        s"""|WITH g AS (
            |  SELECT o_orderpriority AS priority,
            |    CAST($u AS BIGINT) % 5 AS fold,
            |    count(*) AS n,
            |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
            |  FROM orders GROUP BY 1, 2
            |)
            |SELECT priority, fold, n,
            |  round(CAST(CAST(sum(s) OVER w AS BIGINT) - s AS DOUBLE)
            |    / (CAST(sum(n) OVER w AS BIGINT) - n), 6) AS oof_encoding
            |FROM g
            |WINDOW w AS (PARTITION BY priority)
            |ORDER BY priority, fold""".stripMargin
      }),

    QueryDef("q264_negative_sampling",
      "hash-deterministic negative sampling for (customer, part) contrastive pairs",
      // contrastive-training pair generation: every positive (customer,
      // part) interaction draws 2 candidate negatives uniformly over the
      // part key space (md5-deterministic), and candidates that collide
      // with a TRUE interaction of the same customer are rejected by one
      // anti-join. Census per draw index proves the rejection plumbing.
      // Scale shape: distinct positives (one shuffle), narrow candidate
      // fan-out, one key-shuffled anti-join — no per-customer state, no
      // driver-side item table.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val pos = table(s, dir, "orders")
          .join(table(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
          .distinct()
          .pin // consumed twice: candidate fan-out AND the anti-join build
        val maxPk = table(s, dir, "part")
          .agg(max(col("p_partkey")).cast("long")).head().getLong(0)
        val u = u60("concat('neg:', CAST(custkey AS STRING), ':', " +
          "CAST(partkey AS STRING), ':', CAST(k AS STRING))", spark = true)
        val cand = pos
          .select(col("custkey"), col("partkey"),
            explode(sequence(lit(1), lit(2))).as("k"))
          .select(col("custkey"), col("k"),
            (expr(u) % maxPk + 1L).as("neg_partkey"))
        val kept = cand.join(pos
            .select(col("custkey"), col("partkey").as("neg_partkey")),
          Seq("custkey", "neg_partkey"), "left_anti")
        cand.groupBy("k").agg(count(lit(1)).as("n_candidates"))
          .join(kept.groupBy("k").agg(count(lit(1)).as("n_kept")), "k")
          .select(col("k").cast("int").as("k"), col("n_candidates"),
            (col("n_candidates") - col("n_kept")).as("n_collisions"),
            col("n_kept"))
          .orderBy("k")
      },
      Some {
        val u = u60("'neg:' || custkey || ':' || partkey || ':' || k", spark = false)
        s"""|WITH pos AS (
            |  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
            |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            |), cand AS (
            |  SELECT custkey, u.k,
            |    CAST($u AS BIGINT) % (SELECT max(p_partkey) FROM part) + 1
            |      AS neg_partkey
            |  FROM pos CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS k) u
            |), kept AS (
            |  SELECT c.k, count(*) AS n_kept
            |  FROM cand c
            |  WHERE NOT EXISTS (SELECT 1 FROM pos p
            |    WHERE p.custkey = c.custkey AND p.partkey = c.neg_partkey)
            |  GROUP BY 1
            |)
            |SELECT CAST(c.k AS INT) AS k, count(*) AS n_candidates,
            |  count(*) - max(kept.n_kept) AS n_collisions,
            |  max(kept.n_kept) AS n_kept
            |FROM cand c JOIN kept ON kept.k = c.k
            |GROUP BY c.k ORDER BY c.k""".stripMargin
      }),

    QueryDef("q265_matryoshka_audit",
      "Matryoshka truncation audit: 16-of-64-dim energy retention census",
      // how much of each embedding's norm survives prefix truncation —
      // the capacity question behind Matryoshka/short-vector serving.
      // Per-row energies are exact long sums of floor(v_i^2 * 1e9); the
      // retention ratio is one double chain, micro-rounded before the
      // bucket census so the per-bucket mean is an order-free integer sum.
      // Pure narrow pass + 21-bucket aggregate: the 100 TB cost is one
      // scan.
      (s, dir) => {
        // native codegen exact-grid energy; e16 slices the prefix first
        // (slice is codegen too) — identical longs to the HOF form
        graft.functions.GridFunctions.register(s)
        table(s, dir, "embeddings")
          .filter(size(col("embedding")) === 64)
          .withColumn("_p16", slice(col("embedding"), 1, 16))
          .select(
            expr("floor_dot_e9(_p16, _p16)").as("e16"),
            expr("floor_dot_e9(embedding, embedding)").as("e64"))
          .filter(col("e64") > 0)
          .select(round(sqrt(col("e16").cast("double") / col("e64")), 6).as("r"))
          .select(expr("CAST(floor(r * 20) AS INT)").as("bucket"),
            expr("CAST(round(r * 1e6) AS BIGINT)").as("r_micro"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("r_micro").as("sum_micro"))
          .select(col("bucket"), col("n"),
            round(col("sum_micro").cast("double") / col("n") / lit(1e6), 6)
              .as("mean_retention"))
          .orderBy("bucket")
      },
      Some("""|WITH emb AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings WHERE len(embedding) = 64
              |), d AS (SELECT unnest(generate_series(1, 64)) AS i),
              |e AS (
              |  SELECT e.vec_id,
              |    CAST(sum(CAST(floor(e.v[d.i] * e.v[d.i] * 1e9) AS BIGINT))
              |      FILTER (WHERE d.i <= 16) AS BIGINT) AS e16,
              |    CAST(sum(CAST(floor(e.v[d.i] * e.v[d.i] * 1e9) AS BIGINT))
              |      AS BIGINT) AS e64
              |  FROM emb e CROSS JOIN d GROUP BY 1
              |), r AS (
              |  SELECT round(sqrt(CAST(e16 AS DOUBLE) / e64), 6) AS r
              |  FROM e WHERE e64 > 0
              |), m AS (
              |  SELECT CAST(floor(r * 20) AS INT) AS bucket,
              |    CAST(round(r * 1e6) AS BIGINT) AS r_micro
              |  FROM r
              |)
              |SELECT bucket, count(*) AS n,
              |  round(CAST(CAST(sum(r_micro) AS BIGINT) AS DOUBLE)
              |    / count(*) / 1e6, 6) AS mean_retention
              |FROM m GROUP BY bucket ORDER BY bucket""".stripMargin)),

    QueryDef("q266_jl_distortion",
      "Johnson-Lindenstrauss distortion audit: 64->8 ±1 projection vs true distances",
      // does an 8-dim random sign projection preserve pair distances well
      // enough for coarse ANN routing? Signs come from md5 parity (the
      // oracle REBUILDS the matrix from the same bytes — nothing trusted),
      // vectors quantize to the 1e6 grid so projections and distances are
      // exact longs, and the per-pair distortion ratio is micro-rounded
      // into a bucket census. Pairs are consecutive vec_ids: a narrow
      // self-join on id+1, no quadratic pair generation.
      (s, dir) => {
        val signs: Seq[Seq[Int]] =
          (0 until 8).map(j => (0 until 64).map(i => jlSign(j, i)))
        val emb = table(s, dir, "embeddings")
          .filter(size(col("embedding")) === 64)
          .withColumn("_s", typedLit(signs))
          .select(col("vec_id"), col("embedding"),
            expr("transform(sequence(0, 7), j -> " +
              "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
              "acc + _s[j][i] * floor(CAST(embedding[i] AS DOUBLE) * 1e6)))")
              .as("p"))
        val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"),
          col("p").as("pa"))
        val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"),
          col("p").as("pb"))
        a.join(b, a("ida") + 1 === b("idb"))
          .select(col("ida"),
            expr("aggregate(sequence(0, 63), 0L, (acc, i) -> acc + floor(" +
              "(CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE)) * " +
              "(CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE)) * 1e9))").as("od2"),
            expr("aggregate(sequence(0, 7), 0L, (acc, j) -> " +
              "acc + (pa[j] - pb[j]) * (pa[j] - pb[j]))").as("pd2"))
          .filter(col("od2") > 0)
          .select(round(col("pd2").cast("double") / lit(8.0) /
              (col("od2").cast("double") * lit(1e3)), 6).as("ratio"))
          .select(expr("CAST(floor(ratio * 4) AS INT)").as("bucket"),
            expr("CAST(round(ratio * 1e6) AS BIGINT)").as("r_micro"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_pairs"), sum("r_micro").as("sum_micro"))
          .select(col("bucket"), col("n_pairs"),
            round(col("sum_micro").cast("double") / col("n_pairs") / lit(1e6), 6)
              .as("mean_ratio"))
          .orderBy("bucket")
      },
      Some("""|WITH emb AS MATERIALIZED (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings WHERE len(embedding) = 64
              |), d AS (SELECT unnest(generate_series(1, 64)) AS i),
              |dj AS (SELECT unnest(generate_series(1, 8)) AS j),
              |sgn AS MATERIALIZED (
              |  SELECT dj.j, d.i,
              |    CASE WHEN CAST(('0x' || substr(md5('jl:' || (dj.j - 1) || ':' || (d.i - 1)), 1, 15)) AS UBIGINT) % 2 = 0
              |      THEN 1 ELSE -1 END AS s
              |  FROM dj CROSS JOIN d
              |), proj AS MATERIALIZED (
              |  SELECT e.vec_id, s.j,
              |    CAST(sum(s.s * CAST(floor(e.v[s.i] * 1e6) AS BIGINT)) AS BIGINT) AS p
              |  FROM emb e CROSS JOIN sgn s GROUP BY 1, 2
              |), od AS MATERIALIZED (
              |  SELECT a.vec_id AS ida,
              |    CAST(sum(CAST(floor((a.v[d.i] - b.v[d.i]) * (a.v[d.i] - b.v[d.i]) * 1e9) AS BIGINT)) AS BIGINT) AS od2
              |  FROM emb a JOIN emb b ON a.vec_id + 1 = b.vec_id CROSS JOIN d
              |  GROUP BY 1
              |), pd AS MATERIALIZED (
              |  SELECT pa.vec_id AS ida,
              |    CAST(sum((pa.p - pb.p) * (pa.p - pb.p)) AS BIGINT) AS pd2
              |  FROM proj pa JOIN proj pb ON pa.vec_id + 1 = pb.vec_id AND pa.j = pb.j
              |  GROUP BY 1
              |), r AS (
              |  SELECT round(CAST(pd.pd2 AS DOUBLE) / 8.0
              |    / (CAST(od.od2 AS DOUBLE) * 1e3), 6) AS ratio
              |  FROM od JOIN pd ON od.ida = pd.ida
              |  WHERE od.od2 > 0
              |), m AS (
              |  SELECT CAST(floor(ratio * 4) AS INT) AS bucket,
              |    CAST(round(ratio * 1e6) AS BIGINT) AS r_micro
              |  FROM r
              |)
              |SELECT bucket, count(*) AS n_pairs,
              |  round(CAST(CAST(sum(r_micro) AS BIGINT) AS DOUBLE)
              |    / count(*) / 1e6, 6) AS mean_ratio
              |FROM m GROUP BY bucket ORDER BY bucket""".stripMargin)),

    QueryDef("q267_l_diversity",
      "l-diversity census over quasi-identifier classes (privacy release gate)",
      // q178's k-anonymity sibling: a class that is large (k-anonymous) but
      // value-homogeneous still leaks the sensitive attribute — l-diversity
      // counts DISTINCT sensitive values per class. Two-level aggregate
      // (class -> distinct census), all integers, map-side combined.
      (s, dir) => {
        table(s, dir, "events")
          .select(expr("user_id div 10").as("user_bucket"),
            expr("(CAST(ts AS BIGINT) div 3600000000000) % 24").as("hour_of_day"),
            col("event_type"))
          .groupBy("user_bucket", "hour_of_day")
          .agg(countDistinct("event_type").as("l"), count(lit(1)).as("sz"))
          .groupBy("l")
          .agg(count(lit(1)).as("n_classes"), sum("sz").as("n_rows"))
          .orderBy("l")
      },
      Some("""|WITH c AS (
              |  SELECT user_id // 10 AS user_bucket,
              |    (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
              |    count(DISTINCT event_type) AS l, count(*) AS sz
              |  FROM events GROUP BY 1, 2
              |)
              |SELECT l, count(*) AS n_classes,
              |  CAST(sum(sz) AS BIGINT) AS n_rows
              |FROM c GROUP BY l ORDER BY l""".stripMargin)),

    QueryDef("q268_dp_histogram",
      "differentially-private event-type counts via the discrete Laplace (geometric) mechanism",
      // the DP release gate in its integer-exact form: two-sided geometric
      // noise (the discrete analogue of Laplace, the canonical integer DP
      // mechanism) drawn by comparing one md5 uniform per key against
      // precomputed CDF thresholds — so the 'noise' is reproducible in any
      // engine, which is exactly what a certification test needs (a real
      // release would salt with a secret). Counts clamp at 0.
      (s, dir) => {
        val u = u60("concat('dp:', event_type)", spark = true)
        val noise = thresholdCase(u, GeometricThresholds, (-8L to 8L))
        table(s, dir, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), col("n"),
            greatest(lit(0L), col("n") + expr(noise)).as("n_noisy"))
          .orderBy("event_type")
      },
      Some {
        val u = u60("'dp:' || event_type", spark = false)
        val noise = thresholdCase(u, GeometricThresholds, (-8L to 8L))
        s"""|WITH g AS (
            |  SELECT event_type, count(*) AS n FROM events GROUP BY 1
            |)
            |SELECT event_type, n,
            |  GREATEST(0, n + ($noise)) AS n_noisy
            |FROM g ORDER BY event_type""".stripMargin
      }),

    QueryDef("q273_geofence_rollup",
      "geofence rollup: exact integer point-in-polygon (ray cast) x event activity",
      // point-in-polygon without a single float: for each directed edge
      // whose y-span straddles the point's horizontal ray, the side test is
      // one integer cross product — the SAME generated expression text runs
      // in both engines (polygon folded in as literals), so membership is
      // exact by construction. Per-user membership is a constant-folded
      // narrow map over the q216 md5 coordinate grid; the rollup joins
      // event activity by user — broadcast the (user, region) side? No:
      // membership is a pure row function, so it computes INLINE on the
      // event scan — zero joins, one 2-group aggregate. That is the 100 TB
      // geofencing shape: the fence compiles into the scan.
      (s, dir) => {
        val xExpr = "CAST(conv(substring(md5(concat('geo:', " +
          "CAST(user_id AS STRING), ':x')), 1, 15), 16, 10) AS BIGINT) % 10000000"
        val yExpr = "CAST(conv(substring(md5(concat('geo:', " +
          "CAST(user_id AS STRING), ':y')), 1, 15), 16, 10) AS BIGINT) % 10000000"
        table(s, dir, "events")
          .select(col("user_id"),
            expr(s"($xExpr)").as("x"), expr(s"($yExpr)").as("y"))
          .select(col("user_id"),
            expr(s"CASE WHEN (${crossingsExpr("x", "y")}) % 2 = 1 " +
              "THEN 'inside' ELSE 'outside' END").as("region"))
          .groupBy("region")
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"))
          .orderBy("region")
      },
      Some {
        val x = "CAST(CAST(('0x' || substr(md5('geo:' || user_id || ':x'), 1, 15)) " +
          "AS UBIGINT) % 10000000 AS BIGINT)"
        val y = "CAST(CAST(('0x' || substr(md5('geo:' || user_id || ':y'), 1, 15)) " +
          "AS UBIGINT) % 10000000 AS BIGINT)"
        s"""|WITH p AS (
            |  SELECT user_id, $x AS x, $y AS y FROM events
            |), r AS (
            |  SELECT user_id,
            |    CASE WHEN (${crossingsExpr("x", "y")}) % 2 = 1
            |      THEN 'inside' ELSE 'outside' END AS region
            |  FROM p
            |)
            |SELECT region, count(*) AS n_events,
            |  count(DISTINCT user_id) AS n_users
            |FROM r GROUP BY region ORDER BY region""".stripMargin
      }),

    QueryDef("q274_isolation_grid",
      "isolation-grid anomaly screen: 4 oblivious random partitions, sparsest-cell users",
      // isolation-forest's distributable cousin: each of 4 'trees' is an
      // OBLIVIOUS 8-level binary space partition (alternating x/y, md5-
      // derived literal thresholds — data-independent, so the whole tree
      // folds into one integer leaf expression shared by both engines). A
      // point's anomaly score is the total occupancy of its 4 leaves;
      // sparse cells = isolated points. The plan at scale: narrow leaf
      // calc, a 4x256-bounded occupancy aggregate, and the occupancy table
      // BROADCAST back — no per-point state, no iteration.
      (s, dir) => {
        val pts = table(s, dir, "events").select(col("user_id")).distinct()
          .select(col("user_id"),
            expr(geoCoordExpr("x", spark = true)).as("x"),
            expr(geoCoordExpr("y", spark = true)).as("y"))
        import graft.operators.Checkpoints.Pinnable
        val leaves = (0 until IsoTrees).map { t =>
          pts.select(col("user_id"), lit(t).as("t"),
            expr(isoLeafExpr(t, "x", "y")).as("leaf"))
        }.reduce(_ unionAll _)
          .pin // consumed by the occupancy aggregate AND the score join
        val occ = leaves.groupBy("t", "leaf").agg(count(lit(1)).as("sz"))
        leaves.join(broadcast(occ), Seq("t", "leaf"))
          .groupBy("user_id").agg(sum("sz").as("iso_score"))
          .orderBy(col("iso_score"), col("user_id"))
          .limit(20)
      },
      Some {
        val x = geoCoordExpr("x", spark = false)
        val y = geoCoordExpr("y", spark = false)
        val trees = (0 until IsoTrees).map { t =>
          s"SELECT user_id, $t AS t, ${isoLeafExpr(t, "x", "y")} AS leaf FROM p"
        }.mkString("\n  UNION ALL ")
        s"""|WITH u AS (SELECT DISTINCT user_id FROM events),
            |p AS (SELECT user_id, $x AS x, $y AS y FROM u),
            |leaves AS MATERIALIZED (
            |  $trees
            |), occ AS (
            |  SELECT t, leaf, count(*) AS sz FROM leaves GROUP BY 1, 2
            |)
            |SELECT l.user_id, CAST(sum(o.sz) AS BIGINT) AS iso_score
            |FROM leaves l JOIN occ o ON o.t = l.t AND o.leaf = l.leaf
            |GROUP BY l.user_id
            |ORDER BY iso_score, l.user_id LIMIT 20""".stripMargin
      }),

    QueryDef("q275_consistent_hash_rebalance",
      "consistent-hashing shard audit: per-node key counts before/after removing one node",
      // the partitioning-design question every 1000-executor layout asks:
      // when a node dies, how many keys MOVE? On a 32-node x 8-vnode md5
      // ring, only keys owned by the dead node's vnode arcs reassign
      // (~1/32) — vs rehash-everything's 31/32. Assignment is an argmin
      // over the 256-row BROADCAST ring (clockwise distance on the 2^60
      // ring, exact integer modular arithmetic); the audit recomputes with
      // node 0's vnodes deleted and diffs per node.
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ring = ringPoints.toDF("pos", "node")
        val keys = table(s, dir, "events").select(col("user_id")).distinct()
          .select(col("user_id"),
            expr(u60("concat('key:', CAST(user_id AS STRING))", spark = true))
              .as("kpos"))
        def assign(r: org.apache.spark.sql.DataFrame, as: String) =
          keys.crossJoin(broadcast(r))
            .select(col("user_id"),
              // clockwise distance from key to vnode on the 2^60 ring
              struct(expr(s"pmod(pos - kpos, ${1L << 60})").as("d"),
                col("node")).as("c"))
            .groupBy("user_id").agg(min("c").as("c"))
            .select(col("user_id"), col("c.node").as(as))
        val before = assign(ring, "node_before")
        val after = assign(ring.filter(col("node") =!= 0), "node_after")
        before.join(after, "user_id")
          .groupBy(col("node_before").as("node"))
          .agg(count(lit(1)).as("n_keys_before"),
            sum(when(col("node_after") =!= col("node_before"), 1L).otherwise(0L))
              .as("n_moved"))
          .orderBy("node")
      },
      Some {
        val ringValues = ringPoints
          .map { case (p, n) => s"($p, $n)" }.mkString(", ")
        val k = u60("'key:' || user_id", spark = false)
        s"""|WITH keys AS (
            |  SELECT DISTINCT user_id, $k AS kpos
            |  FROM events
            |), ring(pos, node) AS (SELECT * FROM (VALUES $ringValues)),
            |bef AS (
            |  SELECT user_id, arg_min(node, (pos - kpos) % ${1L << 60}
            |    + CASE WHEN (pos - kpos) % ${1L << 60} < 0
            |        THEN ${1L << 60} ELSE 0 END) AS node_before
            |  FROM keys CROSS JOIN ring GROUP BY 1
            |), aft AS (
            |  SELECT user_id, arg_min(node, (pos - kpos) % ${1L << 60}
            |    + CASE WHEN (pos - kpos) % ${1L << 60} < 0
            |        THEN ${1L << 60} ELSE 0 END) AS node_after
            |  FROM keys CROSS JOIN ring WHERE node <> 0 GROUP BY 1
            |)
            |SELECT CAST(node_before AS BIGINT) AS node, count(*) AS n_keys_before,
            |  CAST(sum(CASE WHEN node_after <> node_before THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_moved
            |FROM bef JOIN aft USING (user_id)
            |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    QueryDef("q276_seasonal_naive_mase",
      "forecast-baseline evaluation: seasonal-naive (lag-7) MASE per event type",
      // the forecasting sanity gate: before any model ships, beat the
      // seasonal-naive baseline. Per (type, day) integer milli-sums; the
      // lag-7 forecast and the lag-1 scale both come from exact-day self
      // joins (a calendar gap means no forecast for that day — evaluation
      // runs over days where BOTH lags exist, stated in the result's
      // n_days_eval). MASE = sum|e7| / sum|e1| on exact longs, one double
      // division at the end. Two key-shuffled joins on the bounded
      // (type, day) frame — never a window over the raw events.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
          .pin // three self-join consumers
        val l7 = daily.select(col("event_type"), (col("day") + 7).as("day"),
          col("vm").as("vm7"))
        val l1 = daily.select(col("event_type"), (col("day") + 1).as("day"),
          col("vm").as("vm1"))
        daily.join(l7, Seq("event_type", "day"))
          .join(l1, Seq("event_type", "day"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days_eval"),
            sum(abs(col("vm") - col("vm7"))).as("ae7_milli"),
            sum(abs(col("vm") - col("vm1"))).as("ae1_milli"))
          .select(col("event_type"), col("n_days_eval"), col("ae7_milli"),
            col("ae1_milli"),
            round(col("ae7_milli").cast("double") / col("ae1_milli"), 6)
              .as("mase"))
          .orderBy("event_type")
      },
      Some("""|WITH daily AS (
              |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS vm
              |  FROM events GROUP BY 1, 2
              |), j AS (
              |  SELECT d.event_type, abs(d.vm - l7.vm) AS ae7,
              |    abs(d.vm - l1.vm) AS ae1
              |  FROM daily d
              |  JOIN daily l7 ON l7.event_type = d.event_type
              |    AND l7.day = d.day - 7
              |  JOIN daily l1 ON l1.event_type = d.event_type
              |    AND l1.day = d.day - 1
              |)
              |SELECT event_type, count(*) AS n_days_eval,
              |  CAST(sum(ae7) AS BIGINT) AS ae7_milli,
              |  CAST(sum(ae1) AS BIGINT) AS ae1_milli,
              |  round(CAST(CAST(sum(ae7) AS BIGINT) AS DOUBLE)
              |    / CAST(sum(ae1) AS BIGINT), 6) AS mase
              |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("q277_skyline_parts",
      "distributed 2-D skyline (Pareto frontier): cheapest-for-their-size parts",
      // the multi-objective shortlist: a part is on the skyline iff no
      // other part is at-most-as-expensive AND at-least-as-big with one
      // strict. The oracle IS the naive quadratic NOT EXISTS; the engine's
      // plan is the two-level distributed 2-D skyline — per-price-bucket
      // running max (parallelism = buckets; bucket ranges are disjoint in
      // price, so the cross-bucket prefix max over the BOUNDED bucket frame
      // supplies each bucket's carry-in) plus a same-price tie window.
      // Exact integer cents/sizes throughout.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val p = table(s, dir, "part").select(col("p_partkey"),
          expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
          col("p_size").cast("long").as("size"))
          .withColumn("b", expr("price_cents div 10000"))
        val bmax = p.groupBy("b").agg(max("size").as("bmax"))
        // bucket frame is bounded (price range / pitch), so this global
        // window never sees corpus-sized input
        val wPrefix = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prefix = bmax.select(col("b"),
          max("bmax").over(wPrefix).as("pmax"))
        val wIn = Window.partitionBy("b").orderBy("price_cents")
          .rangeBetween(Window.unboundedPreceding, -1)
        val wPrice = Window.partitionBy("price_cents")
        p.join(prefix, Seq("b"))
          .withColumn("inmax", max("size").over(wIn))
          .withColumn("mx", greatest(col("inmax"), col("pmax")))
          .withColumn("pricemax", max("size").over(wPrice))
          .filter(col("size") === col("pricemax") &&
            (col("mx").isNull || col("mx") < col("size")))
          .select(col("p_partkey"), col("price_cents"), col("size"))
          .orderBy("price_cents", "p_partkey")
      },
      Some("""|WITH p AS (
              |  SELECT p_partkey,
              |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
              |    CAST(p_size AS BIGINT) AS size
              |  FROM part
              |)
              |SELECT p_partkey, price_cents, size
              |FROM p a
              |WHERE NOT EXISTS (
              |  SELECT 1 FROM p q
              |  WHERE (q.price_cents <= a.price_cents AND q.size > a.size)
              |     OR (q.price_cents < a.price_cents AND q.size >= a.size)
              |)
              |ORDER BY price_cents, p_partkey""".stripMargin)),

    QueryDef("q278_join_cardinality_audit",
      "optimizer-statistics audit: true join size vs uniform and end-biased estimates per type pair",
      // the cardinality-estimation question behind every join reorder: how
      // far is |A ⋈ B| from what the table stats predict? Per (type, user)
      // counts are ONE map-combined shuffle; the true pair count is a
      // user-keyed self-join over that bounded frame (both sides reuse the
      // same exchange), and everything downstream runs on |types|- and
      // |types|²-sized frames. Two estimators a planner could afford:
      // System-R uniform-containment n_a·n_b / max(d_a, d_b), and an
      // end-biased histogram — exact over the union of each side's top-20
      // users (the part a stats collector materializes), uniform over the
      // tails. All-integer counts with truncating division (operands
      // nonnegative, so Spark `div` == DuckDB `//`); the only float is the
      // final guarded error ratio, micro-rounded identically.
      (s, dir) => joinCardinalityAudit(table(s, dir, "events")),
      Some("""|WITH cnt AS (
              |  SELECT event_type AS t, user_id AS u, count(*) AS c
              |  FROM events GROUP BY 1, 2
              |), stats AS (
              |  SELECT t, CAST(sum(c) AS BIGINT) AS n, count(*) AS d
              |  FROM cnt GROUP BY 1
              |), hu AS (
              |  SELECT DISTINCT u FROM (
              |    SELECT u, row_number() OVER (PARTITION BY t
              |      ORDER BY c DESC, u) AS rn
              |    FROM cnt) WHERE rn <= 20
              |), cnth AS (
              |  SELECT cnt.* FROM cnt JOIN hu USING (u)
              |), hstats AS (
              |  SELECT t, CAST(sum(c) AS BIGINT) AS nh, count(*) AS dh
              |  FROM cnth GROUP BY 1
              |), hh AS (
              |  SELECT a.t AS ta, b.t AS tb,
              |    CAST(sum(a.c * b.c) AS BIGINT) AS hh_pairs
              |  FROM cnth a JOIN cnth b ON a.u = b.u AND a.t < b.t
              |  GROUP BY 1, 2
              |), tr AS (
              |  SELECT a.t AS ta, b.t AS tb,
              |    CAST(sum(a.c * b.c) AS BIGINT) AS true_pairs
              |  FROM cnt a JOIN cnt b ON a.u = b.u AND a.t < b.t
              |  GROUP BY 1, 2
              |), base AS (
              |  SELECT sa.t AS ta, sb.t AS tb, sa.n AS n_a, sb.n AS n_b,
              |    sa.d AS d_a, sb.d AS d_b,
              |    COALESCE(tr.true_pairs, 0) AS true_pairs,
              |    (sa.n * sb.n) // greatest(sa.d, sb.d, 1) AS est_uniform,
              |    COALESCE(hh.hh_pairs, 0)
              |      + ((sa.n - COALESCE(ha.nh, 0)) * (sb.n - COALESCE(hb.nh, 0)))
              |        // greatest(sa.d - COALESCE(ha.dh, 0),
              |                    sb.d - COALESCE(hb.dh, 0), 1) AS est_hh
              |  FROM stats sa CROSS JOIN stats sb
              |  LEFT JOIN hstats ha ON ha.t = sa.t
              |  LEFT JOIN hstats hb ON hb.t = sb.t
              |  LEFT JOIN hh ON hh.ta = sa.t AND hh.tb = sb.t
              |  LEFT JOIN tr ON tr.ta = sa.t AND tr.tb = sb.t
              |  WHERE sa.t < sb.t
              |)
              |SELECT ta, tb, n_a, n_b, d_a, d_b, true_pairs, est_uniform,
              |  est_hh,
              |  CASE WHEN true_pairs = 0 THEN NULL
              |    ELSE CAST(round(est_uniform * 1000000.0 / true_pairs)
              |      AS BIGINT) END AS err_uniform_e6,
              |  CASE WHEN true_pairs = 0 THEN NULL
              |    ELSE CAST(round(est_hh * 1000000.0 / true_pairs)
              |      AS BIGINT) END AS err_hh_e6
              |FROM base ORDER BY ta, tb""".stripMargin)),

    QueryDef("q280_selectivity_audit",
      "equi-depth histogram selectivity audit: estimated vs true rows for 9 range predicates",
      // q278's sibling for RANGE predicates: build the 32-bucket equi-depth
      // histogram an optimizer would keep for l_extendedprice and audit its
      // uniform-within-bucket estimates against true counts. Scale shape:
      // ONE corpus scan quantizes to integer dollars and map-combines
      // per-value counts; every later step (cumulative bucket assignment,
      // bucket stats, probe joins) runs on the value-DOMAIN frame (≤ ~105k
      // rows — bounded by the domain, not the corpus), so the one global
      // window is justified the q277 way. All-integer widths/overlaps with
      // truncating division; the guarded error ratio is the only float.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val probes = ProbeRanges.toDF("range_lo", "range_hi")
        val v = table(s, dir, "lineitem")
          .select(expr("CAST(floor(l_extendedprice) AS BIGINT)").as("vd"))
          .groupBy("vd").agg(count(lit(1)).as("n")).pin // domain-sized frame
        val total = v.agg(sum("n").as("tot"))
        val wCum = Window.orderBy("vd")
          .rowsBetween(Window.unboundedPreceding, -1)
        val buckets = v
          .withColumn("cum_before", coalesce(sum("n").over(wCum), lit(0L)))
          .crossJoin(broadcast(total))
          .withColumn("b", expr("(cum_before * 32) div tot"))
          .groupBy("b")
          .agg(sum("n").as("n_k"), min("vd").as("lo_k"), max("vd").as("hi_k"))
        val est = broadcast(probes).crossJoin(buckets)
          .withColumn("overlap", expr(
            "greatest(CAST(0 AS BIGINT), least(hi_k, range_hi - 1) " +
              "- greatest(lo_k, range_lo) + 1)"))
          .withColumn("contrib",
            expr("(n_k * overlap) div (hi_k - lo_k + 1)"))
          .groupBy("range_lo", "range_hi")
          .agg(sum("contrib").as("est_rows"))
        val tru = v.join(broadcast(probes),
            col("vd") >= col("range_lo") && col("vd") < col("range_hi"))
          .groupBy("range_lo", "range_hi").agg(sum("n").as("true_rows"))
        est.join(tru, Seq("range_lo", "range_hi"), "left")
          .na.fill(0L, Seq("true_rows"))
          .withColumn("err_e6",
            expr("""CASE WHEN true_rows = 0 THEN NULL ELSE
                   | CAST(round(est_rows * 1000000.0 / true_rows)
                   |   AS BIGINT) END""".stripMargin))
          .select(col("range_lo"), col("range_hi"), col("true_rows"),
            col("est_rows"), col("err_e6"))
          .orderBy("range_lo", "range_hi")
      },
      Some {
        val values = ProbeRanges.map { case (lo, hi) => s"($lo, $hi)" }
          .mkString(", ")
        s"""|WITH v AS (
            |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS vd,
            |    count(*) AS n
            |  FROM lineitem GROUP BY 1
            |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM v),
            |buckets AS (
            |  SELECT (cum_before * 32) // tot AS b,
            |    CAST(sum(n) AS BIGINT) AS n_k,
            |    min(vd) AS lo_k, max(vd) AS hi_k
            |  FROM (
            |    SELECT vd, n, COALESCE(CAST(sum(n) OVER (ORDER BY vd
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            |      AS BIGINT), 0) AS cum_before
            |    FROM v) CROSS JOIN tot
            |  GROUP BY 1
            |), probes(range_lo, range_hi) AS (SELECT * FROM (VALUES $values)),
            |est AS (
            |  SELECT range_lo, range_hi,
            |    CAST(sum((n_k * greatest(CAST(0 AS BIGINT),
            |      least(hi_k, range_hi - 1) - greatest(lo_k, range_lo) + 1))
            |      // (hi_k - lo_k + 1)) AS BIGINT) AS est_rows
            |  FROM probes CROSS JOIN buckets GROUP BY 1, 2
            |), tru AS (
            |  SELECT range_lo, range_hi, CAST(sum(n) AS BIGINT) AS true_rows
            |  FROM v JOIN probes ON vd >= range_lo AND vd < range_hi
            |  GROUP BY 1, 2
            |)
            |SELECT e.range_lo, e.range_hi,
            |  COALESCE(t.true_rows, 0) AS true_rows, e.est_rows,
            |  CASE WHEN COALESCE(t.true_rows, 0) = 0 THEN NULL
            |    ELSE CAST(round(e.est_rows * 1000000.0 / t.true_rows)
            |      AS BIGINT) END AS err_e6
            |FROM est e LEFT JOIN tru t USING (range_lo, range_hi)
            |ORDER BY range_lo, range_hi""".stripMargin
      }),

    QueryDef("q281_t_closeness",
      "t-closeness census over quasi-identifier classes (privacy trilogy completion)",
      // k-anonymity (q178) bounds class SIZE, l-diversity (q267) bounds
      // distinct sensitive values — t-closeness bounds the DISTANCE between
      // a class's sensitive distribution and the global one, the leak the
      // other two miss (a large, diverse class can still skew hard toward
      // one value). Categorical sensitive attribute -> total variation
      // distance, kept EXACT: tmilli_e6 = (Σ_t |n_ct·N − N_t·n_c|) · 1e6
      // div (2·n_c·N) — all integer. Absent types must contribute |0 −
      // N_t·n_c|, so counts land on a classes × types frame (bounded by
      // the QI domain and |types|, never the corpus). One corpus-scan
      // aggregation; everything after runs on bounded frames.
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(expr("user_id div 10").as("user_bucket"),
            expr("(CAST(ts AS BIGINT) div 3600000000000) % 24").as("hour_of_day"),
            col("event_type"))
        val ct = e.groupBy("user_bucket", "hour_of_day", "event_type")
          .agg(count(lit(1)).as("n_ct"))
        val classes = ct.groupBy("user_bucket", "hour_of_day")
          .agg(sum("n_ct").as("n_c"))
        val types = ct.groupBy("event_type").agg(sum("n_ct").as("n_t"))
        val totals = types.agg(sum("n_t").as("n_tot"))
        val dist = classes.crossJoin(broadcast(types))
          .join(ct, Seq("user_bucket", "hour_of_day", "event_type"), "left")
          .na.fill(0L, Seq("n_ct"))
          .crossJoin(broadcast(totals))
          .groupBy("user_bucket", "hour_of_day")
          .agg(max("n_c").as("n_c"), max("n_tot").as("n_tot"),
            sum(abs(col("n_ct") * col("n_tot") - col("n_t") * col("n_c")))
              .as("num"))
          .withColumn("tmilli_e6",
            expr("(num * 1000000) div (2 * n_c * n_tot)"))
        dist.groupBy(expr("tmilli_e6 div 100000").as("t_bin"))
          .agg(count(lit(1)).as("n_classes"), sum("n_c").as("n_rows"),
            max("tmilli_e6").as("max_t_e6"))
          .orderBy("t_bin")
      },
      Some("""|WITH e AS (
              |  SELECT user_id // 10 AS user_bucket,
              |    (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
              |    event_type
              |  FROM events
              |), ct AS (
              |  SELECT user_bucket, hour_of_day, event_type,
              |    CAST(count(*) AS BIGINT) AS n_ct
              |  FROM e GROUP BY 1, 2, 3
              |), classes AS (
              |  SELECT user_bucket, hour_of_day, CAST(sum(n_ct) AS BIGINT) AS n_c
              |  FROM ct GROUP BY 1, 2
              |), types AS (
              |  SELECT event_type, CAST(sum(n_ct) AS BIGINT) AS n_t
              |  FROM ct GROUP BY 1
              |), totals AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_tot FROM types),
              |dist AS (
              |  SELECT c.user_bucket, c.hour_of_day, max(c.n_c) AS n_c,
              |    max(tt.n_tot) AS n_tot,
              |    CAST(sum(abs(COALESCE(x.n_ct, 0) * tt.n_tot
              |      - ty.n_t * c.n_c)) AS BIGINT) AS num
              |  FROM classes c CROSS JOIN types ty CROSS JOIN totals tt
              |  LEFT JOIN ct x ON x.user_bucket = c.user_bucket
              |    AND x.hour_of_day = c.hour_of_day
              |    AND x.event_type = ty.event_type
              |  GROUP BY 1, 2
              |)
              |SELECT (num * 1000000) // (2 * n_c * n_tot) // 100000 AS t_bin,
              |  count(*) AS n_classes, CAST(sum(n_c) AS BIGINT) AS n_rows,
              |  max((num * 1000000) // (2 * n_c * n_tot)) AS max_t_e6
              |FROM dist GROUP BY 1 ORDER BY t_bin""".stripMargin)),

    QueryDef("q282_feature_store_pit",
      "feature-store point-in-time join: 3 leak-free features onto the purchase label spine",
      // THE feature-store primitive: every training label must see feature
      // values as of strictly-before its own timestamp (no leakage at t).
      // Instead of one as-of join per feature (3 corpus shuffles), all
      // feature streams UNION with the spine and ONE per-user window
      // computes every feature in a single shuffle: running conditional
      // count (prior views), last-non-null conditional value (last click),
      // running conditional sum (prior error milli-values). Spine rows
      // sort BEFORE same-timestamp feature rows so equality never leaks.
      // The oracle is the naive per-feature correlated-subquery spec, so
      // the one-shuffle plan must hash-match the 3-subquery semantics.
      (s, dir) => {
        val e = table(s, dir, "events")
        val spine = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            col("ts"), lit(1).as("is_spine"),
            lit(null).cast("long").as("f_vmilli"), lit(null).cast("string").as("kind"))
        val feats = e.filter(col("event_type").isin("view", "click", "error"))
          .select(col("event_id"), col("user_id"), col("ts"),
            lit(0).as("is_spine"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("f_vmilli"),
            col("event_type").as("kind"))
        // spine first on ts ties (1 - is_spine): strictly-before semantics
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), (lit(1) - col("is_spine")), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        spine.unionByName(feats)
          .select(col("event_id"), col("user_id"), col("ts"), col("is_spine"),
            count(when(col("kind") === "view", 1)).over(w)
              .as("n_views_before"),
            last(when(col("kind") === "click", col("f_vmilli")),
              ignoreNulls = true).over(w).as("last_click_vmilli"),
            coalesce(sum(when(col("kind") === "error", col("f_vmilli")))
              .over(w), lit(0L)).as("err_vmilli_before"))
          .filter(col("is_spine") === 1)
          .select(col("event_id").as("label_id"), col("user_id"),
            expr("ts div 1000").as("label_us"), col("n_views_before"),
            col("last_click_vmilli"), col("err_vmilli_before"))
          .orderBy("label_id")
      },
      Some("""|SELECT p.event_id AS label_id, p.user_id,
              |  epoch_us(p.ts) AS label_us,
              |  (SELECT count(*) FROM events v
              |   WHERE v.event_type = 'view' AND v.user_id = p.user_id
              |     AND v.ts < p.ts) AS n_views_before,
              |  (SELECT CAST(floor(c.value * 1000) AS BIGINT) FROM events c
              |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
              |     AND c.ts < p.ts AND c.value IS NOT NULL
              |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
              |    AS last_click_vmilli,
              |  (SELECT COALESCE(CAST(sum(CAST(floor(er.value * 1000)
              |       AS BIGINT)) AS BIGINT), 0) FROM events er
              |   WHERE er.event_type = 'error' AND er.user_id = p.user_id
              |     AND er.ts < p.ts) AS err_vmilli_before
              |FROM events p WHERE p.event_type = 'purchase'
              |ORDER BY label_id""".stripMargin)),

    QueryDef("q283_mutual_best_match",
      "entity resolution 1-1 matching: mutual-best edit-distance pairs inside blocks",
      // the matching tier AFTER q130's candidate census: a candidate pair
      // becomes a MATCH only when each side is the other's single best
      // neighbor (dist ASC, name ASC) — the standard reciprocal-top-1 rule
      // that yields a deterministic 1-1 matching without a global
      // assignment solve. Directed candidates stay inside noun blocks (the
      // blocking contract — never global all-pairs); per-(block, name)
      // best is a WindowGroupLimit-prunable rank-1 window; the mutual
      // check is a self-join of the tiny best-edge frame against itself.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val names = table(s, dir, "part")
          .select(element_at(split(col("p_name"), " "), -1).as("block"),
            col("p_name").as("name")).distinct()
        val directed = names.as("a").join(names.as("b"),
            col("a.block") === col("b.block") && col("a.name") =!= col("b.name"))
          .select(col("a.block").as("block"), col("a.name").as("src"),
            col("b.name").as("dst"),
            levenshtein(col("a.name"), col("b.name")).as("dist"))
          .filter(col("dist") <= 3)
        val wBest = Window.partitionBy("block", "src")
          .orderBy(col("dist"), col("dst"))
        val best = directed
          .withColumn("rn", row_number().over(wBest))
          .filter(col("rn") === 1).drop("rn").pin
        best.as("x").join(best.as("y"),
            col("x.block") === col("y.block") &&
              col("x.dst") === col("y.src") && col("x.src") === col("y.dst") &&
              col("x.src") < col("x.dst"))
          .select(col("x.block").as("block"), col("x.src").as("name_a"),
            col("x.dst").as("name_b"), col("x.dist").cast("long").as("dist"))
          .orderBy("block", "name_a", "name_b")
      },
      Some("""|WITH names AS (
              |  SELECT DISTINCT string_split(p_name, ' ')[-1] AS block,
              |    p_name AS name
              |  FROM part
              |), directed AS (
              |  SELECT a.block, a.name AS src, b.name AS dst,
              |    levenshtein(a.name, b.name) AS dist
              |  FROM names a JOIN names b
              |    ON a.block = b.block AND a.name <> b.name
              |  WHERE levenshtein(a.name, b.name) <= 3
              |), best AS (
              |  SELECT block, src, dst, dist FROM (
              |    SELECT block, src, dst, dist,
              |      row_number() OVER (PARTITION BY block, src
              |        ORDER BY dist, dst) AS rn
              |    FROM directed
              |  ) WHERE rn = 1
              |)
              |SELECT x.block, x.src AS name_a, x.dst AS name_b,
              |  CAST(x.dist AS BIGINT) AS dist
              |FROM best x JOIN best y
              |  ON x.block = y.block AND x.dst = y.src AND x.src = y.dst
              | AND x.src < x.dst
              |ORDER BY x.block, name_a, name_b""".stripMargin)),

    QueryDef("q284_markov_attribution",
      "Markov-chain attribution: per-channel removal effects via fixed-round absorption iteration",
      // the data-driven alternative to last-touch (q151) / linear (q203)
      // attribution: model user journeys as a first-order Markov chain
      // (START → channels → CONV/NULL, cut at first purchase), then price
      // each channel by its REMOVAL EFFECT — how much absorption
      // probability drops when transitions into that channel redirect to
      // NULL. Journey/transition extraction is one user-keyed window pass;
      // the 12-round value iteration runs on the bounded (variant, state)
      // frame on the e12 integer grid. BOTH engines execute the same
      // generated SQL text (dialect-substituted div/nanos only), so the
      // fixed point is structurally identical — Spark gets it through
      // spark.sql over the normalized events view.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        table(s, dir, "events").createOrReplaceTempView("mk_events")
        val trans = s.sql(
          s"WITH ${markovTransCtes(spark = true)} " +
            "SELECT src, dst, cnt FROM trans").pin
        trans.createOrReplaceTempView("mk_trans")
        val tv = s.sql(
          s"WITH ${markovVariantCtes("mk_trans")} " +
            "SELECT v, src, dst, cnt FROM tv").pin
        tv.createOrReplaceTempView("mk_tv")
        val outs = s.sql(MarkovOutsSelect.format("mk_tv")).pin
        outs.createOrReplaceTempView("mk_outs")
        s.sql("WITH " +
          markovIterTail(spark = true, rounds = 12, "mk_tv", "mk_outs"))
      },
      Some("WITH " + markovTransCtes(spark = false) + ",\n" +
        markovVariantCtes("trans") + ",\n" +
        "outs AS (" + MarkovOutsSelect.format("tv") + "),\n" +
        markovIterTail(spark = false, rounds = 12, "tv", "outs"))),

    QueryDef("q285_snapshot_diff",
      "Merkle-style snapshot reconciliation: bucket-fingerprint prune, row diff only where dirty",
      // table-diff the way a 100 TB reconciliation must run: ONE scan
      // computes both snapshots' membership flags and payload fingerprints
      // (snapshot B is A plus deterministic century-block edits: adds,
      // price-bump changes, deletes), bucket fingerprints (count + bit_xor
      // of 60-bit payload hashes per 512-key range) map-combine to a
      // 1024-ish-row frame, and ROW-LEVEL diffing touches only buckets
      // whose fingerprints disagree (~30% here) via a broadcast semi-join
      // — clean buckets never shuffle a row. The same prune runs in the
      // oracle, so equality is structural; unchanged-row count derives
      // from the global totals, not a full-table compare.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val fpA = u60("concat(o_orderstatus, ':', CAST(pc AS STRING), " +
          "':', o_orderpriority)", spark = true)
        val fpB = u60("concat(o_orderstatus, ':', CAST(pcb AS STRING), " +
          "':', o_orderpriority)", spark = true)
        val base = table(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderstatus"),
            col("o_orderpriority"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"),
            expr("(o_orderkey div 100) % 50").as("sel"),
            expr("o_orderkey div 512").as("bucket"))
          .withColumn("pcb",
            expr("CASE WHEN sel = 7 THEN pc + 100 ELSE pc END"))
          .select(col("k"), col("bucket"),
            expr("sel <> 0").as("in_a"), expr("sel <> 23").as("in_b"),
            expr(fpA).as("fp_a"), expr(fpB).as("fp_b"))
          .pin
        val bstats = base.groupBy("bucket").agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("in_b"), 1L).otherwise(0L)).as("cnt_b"),
          expr("bit_xor(CASE WHEN in_a THEN fp_a END)").as("xor_a"),
          expr("bit_xor(CASE WHEN in_b THEN fp_b END)").as("xor_b")).pin
        val totals = bstats.agg(sum("cnt_a").as("total_a"),
          sum("cnt_b").as("total_b"),
          sum(expr("CASE WHEN cnt_a <> cnt_b OR NOT (xor_a <=> xor_b) " +
            "THEN 1 ELSE 0 END")).as("dirty_buckets"))
        val dirty = bstats
          .filter(expr("cnt_a <> cnt_b OR NOT (xor_a <=> xor_b)"))
          .select("bucket")
        val rowstats = base.join(broadcast(dirty), "bucket").agg(
          sum(expr("CASE WHEN NOT in_a AND in_b THEN 1 ELSE 0 END"))
            .as("n_added"),
          sum(expr("CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END"))
            .as("n_removed"),
          sum(expr("CASE WHEN in_a AND in_b AND fp_a <> fp_b " +
            "THEN 1 ELSE 0 END")).as("n_changed"))
        totals.crossJoin(rowstats)
          .select(explode(array(
            struct(lit("added").as("metric"), col("n_added").as("n")),
            struct(lit("removed").as("metric"), col("n_removed").as("n")),
            struct(lit("changed").as("metric"), col("n_changed").as("n")),
            struct(lit("unchanged").as("metric"),
              (col("total_a") - col("n_removed") - col("n_changed")).as("n")),
            struct(lit("dirty_buckets").as("metric"),
              col("dirty_buckets").as("n")),
            struct(lit("total_a").as("metric"), col("total_a").as("n")),
            struct(lit("total_b").as("metric"), col("total_b").as("n"))))
            .as("r"))
          .select(col("r.metric").as("metric"), col("r.n").as("n"))
          .orderBy("metric")
      },
      Some {
        val fpA = u60("o_orderstatus || ':' || pc || ':' || o_orderpriority",
          spark = false)
        val fpB = u60("o_orderstatus || ':' || pcb || ':' || o_orderpriority",
          spark = false)
        s"""|WITH base AS (
            |  SELECT o_orderkey AS k, (o_orderkey // 100) % 50 AS sel,
            |    o_orderkey // 512 AS bucket,
            |    (o_orderkey // 100) % 50 <> 0 AS in_a,
            |    (o_orderkey // 100) % 50 <> 23 AS in_b,
            |    $fpA AS fp_a, $fpB AS fp_b
            |  FROM (
            |    SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
            |      CASE WHEN (o_orderkey // 100) % 50 = 7
            |        THEN CAST(round(o_totalprice * 100) AS BIGINT) + 100
            |        ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS pcb
            |    FROM orders)
            |), bstats AS (
            |  SELECT bucket,
            |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
            |    CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b,
            |    bit_xor(CASE WHEN in_a THEN fp_a END) AS xor_a,
            |    bit_xor(CASE WHEN in_b THEN fp_b END) AS xor_b
            |  FROM base GROUP BY 1
            |), totals AS (
            |  SELECT CAST(sum(cnt_a) AS BIGINT) AS total_a,
            |    CAST(sum(cnt_b) AS BIGINT) AS total_b,
            |    CAST(sum(CASE WHEN cnt_a <> cnt_b
            |      OR xor_a IS DISTINCT FROM xor_b THEN 1 ELSE 0 END)
            |      AS BIGINT) AS dirty_buckets
            |  FROM bstats
            |), dirty AS (
            |  SELECT bucket FROM bstats
            |  WHERE cnt_a <> cnt_b OR xor_a IS DISTINCT FROM xor_b
            |), rowstats AS (
            |  SELECT
            |    CAST(sum(CASE WHEN NOT in_a AND in_b THEN 1 ELSE 0 END)
            |      AS BIGINT) AS n_added,
            |    CAST(sum(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END)
            |      AS BIGINT) AS n_removed,
            |    CAST(sum(CASE WHEN in_a AND in_b AND fp_a <> fp_b
            |      THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
            |  FROM base JOIN dirty USING (bucket)
            |)
            |SELECT metric, n FROM totals CROSS JOIN rowstats
            |CROSS JOIN LATERAL (VALUES
            |  ('added', n_added), ('removed', n_removed),
            |  ('changed', n_changed),
            |  ('unchanged', total_a - n_removed - n_changed),
            |  ('dirty_buckets', dirty_buckets),
            |  ('total_a', total_a), ('total_b', total_b)) AS t(metric, n)
            |ORDER BY metric""".stripMargin
      }),

    QueryDef("q286_zonemap_audit",
      "zone-map skipping audit: insertion vs time-partitioned layout under 5 date-range scans",
      // the data-layout question behind every lakehouse table: how many
      // files does a range predicate SKIP, and how many false-positive
      // rows do the survivors drag in? Two layouts of the same lineitem
      // rows — 512-key insertion files vs 30-day time partitions — get
      // per-file (min, max, count) zone maps on ship-day from ONE scan
      // (layouts ride an explode, one shuffle); skipping and scanned-row
      // arithmetic then runs on the file frame (hundreds of rows) and the
      // bounded day-domain frame supplies true counts. Quantifies exactly
      // what time-partitioning buys: same rows, same predicate, different
      // pruning.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val probes = ZonemapProbes.toDF("range_lo", "range_hi")
        val base = table(s, dir, "lineitem")
          .select(
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
              .as("day"),
            expr("l_orderkey div 512").as("fid_ins"))
          .pin
        val files = base
          .select(explode(array(
            struct(lit("insertion").as("layout"), col("fid_ins").as("fid")),
            struct(lit("monthly").as("layout"),
              expr("day div 30").as("fid")))).as("lf"), col("day"))
          .groupBy(col("lf.layout").as("layout"), col("lf.fid").as("fid"))
          .agg(min("day").as("zmin"), max("day").as("zmax"),
            count(lit(1)).as("n_rows"))
        val days = base.groupBy("day").agg(count(lit(1)).as("n"))
        val tru = days.join(broadcast(probes),
            col("day") >= col("range_lo") && col("day") < col("range_hi"))
          .groupBy("range_lo", "range_hi").agg(sum("n").as("true_rows"))
        val scan = files.crossJoin(broadcast(probes))
          .withColumn("hit",
            col("zmin") < col("range_hi") && col("zmax") >= col("range_lo"))
          .groupBy("layout", "range_lo", "range_hi")
          .agg(count(lit(1)).as("n_files"),
            sum(when(!col("hit"), 1L).otherwise(0L)).as("n_skipped"),
            sum(when(col("hit"), col("n_rows")).otherwise(0L))
              .as("scanned_rows"))
        scan.join(broadcast(tru), Seq("range_lo", "range_hi"), "left")
          .na.fill(0L, Seq("true_rows"))
          .select(col("layout"), col("range_lo"), col("range_hi"),
            col("n_files"), col("n_skipped"), col("true_rows"),
            col("scanned_rows"),
            (col("scanned_rows") - col("true_rows")).as("false_pos_rows"))
          .orderBy("layout", "range_lo", "range_hi")
      },
      Some {
        val values = ZonemapProbes.map { case (lo, hi) => s"($lo, $hi)" }
          .mkString(", ")
        s"""|WITH base AS (
            |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
            |    l_orderkey // 512 AS fid_ins
            |  FROM lineitem
            |), files AS (
            |  SELECT layout, fid, min(day) AS zmin, max(day) AS zmax,
            |    CAST(count(*) AS BIGINT) AS n_rows
            |  FROM (
            |    SELECT 'insertion' AS layout, fid_ins AS fid, day FROM base
            |    UNION ALL
            |    SELECT 'monthly' AS layout, day // 30 AS fid, day FROM base
            |  ) GROUP BY 1, 2
            |), days AS (
            |  SELECT day, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1
            |), probes(range_lo, range_hi) AS (SELECT * FROM (VALUES $values)),
            |tru AS (
            |  SELECT range_lo, range_hi, CAST(sum(n) AS BIGINT) AS true_rows
            |  FROM days JOIN probes ON day >= range_lo AND day < range_hi
            |  GROUP BY 1, 2
            |), scan AS (
            |  SELECT layout, range_lo, range_hi,
            |    CAST(count(*) AS BIGINT) AS n_files,
            |    CAST(sum(CASE WHEN zmin < range_hi AND zmax >= range_lo
            |      THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped,
            |    CAST(sum(CASE WHEN zmin < range_hi AND zmax >= range_lo
            |      THEN n_rows ELSE 0 END) AS BIGINT) AS scanned_rows
            |  FROM files CROSS JOIN probes GROUP BY 1, 2, 3
            |)
            |SELECT s.layout, s.range_lo, s.range_hi, s.n_files, s.n_skipped,
            |  COALESCE(t.true_rows, 0) AS true_rows, s.scanned_rows,
            |  s.scanned_rows - COALESCE(t.true_rows, 0) AS false_pos_rows
            |FROM scan s LEFT JOIN tru t USING (range_lo, range_hi)
            |ORDER BY layout, range_lo, range_hi""".stripMargin
      }),

    QueryDef("q288_recsys_hit_rate",
      "co-occurrence recommender eval: hit@3 of next-part predictions by popularity decile",
      // the offline recsys eval harness: consecutive-order part
      // transitions (lead window per customer, per-order parts deduped)
      // split by CUSTOMER hash (no leakage between train and eval), a
      // top-3-next-parts model from train counts (rank window, tie-broken
      // count DESC then part ASC — WindowGroupLimit prunes), and hit@3 /
      // coverage on held-out transitions, broken out by the source part's
      // train-popularity decile (ntile over the bounded 2k-part frame).
      // Transitions fan out ~|parts-per-order|² per order pair; model and
      // decile frames are part-domain bounded; the only corpus-wide
      // shuffles are the transition build and the train count.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val ord = table(s, dir, "orders").select(col("o_custkey"),
          col("o_orderkey"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("du"))
        val wNext = Window.partitionBy("o_custkey").orderBy("du", "o_orderkey")
        val pairsO = ord
          .withColumn("o_next", lead("o_orderkey", 1).over(wNext))
          .filter(col("o_next").isNotNull)
          .select(col("o_custkey"), col("o_orderkey").as("o1"),
            col("o_next").as("o2"))
        val items = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val trans = pairsO
          .join(items.select(col("l_orderkey").as("o1"),
            col("l_partkey").as("pa")), "o1")
          .join(items.select(col("l_orderkey").as("o2"),
            col("l_partkey").as("pb")), "o2")
          .select(col("o_custkey"), col("pa"), col("pb"))
          .withColumn("is_test", expr(
            u60("concat('rec:', CAST(o_custkey AS STRING))", spark = true) +
              " % 5 = 0"))
          .pin
        val trainCnt = trans.filter(!col("is_test"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("cnt")).pin
        val wTop = Window.partitionBy("pa")
          .orderBy(col("cnt").desc, col("pb"))
        val model = trainCnt
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3).select("pa", "pb")
        val pop = trainCnt.groupBy("pa").agg(sum("cnt").as("out_cnt"))
        val wDec = Window.orderBy(col("out_cnt").desc, col("pa"))
        val decile = pop.select(col("pa"),
          ntile(10).over(wDec).cast("long").as("dec"))
        val test = trans.filter(col("is_test"))
          .join(broadcast(decile), Seq("pa"), "left")
          .na.fill(Map("dec" -> 0L)) // parts unseen in train -> decile 0
          .join(broadcast(model.select(col("pa"), col("pb"),
            lit(1L).as("hit"))), Seq("pa", "pb"), "left")
          .join(broadcast(pop.select(col("pa"), lit(1L).as("modeled"))),
            Seq("pa"), "left")
        test.groupBy("dec")
          .agg(count(lit(1)).as("n_test"),
            sum(coalesce(col("modeled"), lit(0L))).as("n_with_model"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .withColumn("hit_e6",
            expr("(n_hits * 1000000) div greatest(n_test, CAST(1 AS BIGINT))"))
          .orderBy("dec")
      },
      Some {
        val h = u60("'rec:' || o_custkey", spark = false)
        s"""|WITH ord AS (
            |  SELECT o_custkey, o_orderkey,
            |    epoch_us(o_orderdate) AS du FROM orders
            |), pairso AS (
            |  SELECT o_custkey, o_orderkey AS o1,
            |    lead(o_orderkey) OVER (PARTITION BY o_custkey
            |      ORDER BY du, o_orderkey) AS o2
            |  FROM ord
            |), items AS (
            |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            |), trans AS (
            |  SELECT p.o_custkey, a.l_partkey AS pa, b.l_partkey AS pb,
            |    ($h) % 5 = 0 AS is_test
            |  FROM pairso p
            |  JOIN items a ON a.l_orderkey = p.o1
            |  JOIN items b ON b.l_orderkey = p.o2
            |  WHERE p.o2 IS NOT NULL
            |), traincnt AS (
            |  SELECT pa, pb, CAST(count(*) AS BIGINT) AS cnt
            |  FROM trans WHERE NOT is_test GROUP BY 1, 2
            |), model AS (
            |  SELECT pa, pb FROM (
            |    SELECT pa, pb, row_number() OVER (PARTITION BY pa
            |      ORDER BY cnt DESC, pb) AS rn
            |    FROM traincnt
            |  ) WHERE rn <= 3
            |), pop AS (
            |  SELECT pa, CAST(sum(cnt) AS BIGINT) AS out_cnt
            |  FROM traincnt GROUP BY 1
            |), decile AS (
            |  SELECT pa, ntile(10) OVER (ORDER BY out_cnt DESC, pa) AS dec
            |  FROM pop
            |)
            |SELECT COALESCE(d.dec, 0) AS dec, count(*) AS n_test,
            |  CAST(sum(CASE WHEN po.pa IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_with_model,
            |  CAST(sum(CASE WHEN m.pa IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_hits,
            |  (CAST(sum(CASE WHEN m.pa IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) * 1000000) // greatest(count(*), 1) AS hit_e6
            |FROM trans t
            |LEFT JOIN decile d ON d.pa = t.pa
            |LEFT JOIN model m ON m.pa = t.pa AND m.pb = t.pb
            |LEFT JOIN pop po ON po.pa = t.pa
            |WHERE t.is_test
            |GROUP BY 1 ORDER BY dec""".stripMargin
      }),

    QueryDef("q289_linear_interpolation",
      "regular-grid gap fill with exact integer linear interpolation per event type",
      // q118's census sibling that actually FILLS: hourly milli-sums land
      // on the full [min, max] hour grid per type (bounded sequence
      // explode), interior gaps interpolate linearly between the nearest
      // observed hours via IGNORE-NULLS carry windows — (hp, vp) ride the
      // same last-non-null row, so the lerp endpoints are consistent —
      // and v = vp + ((vn - vp)·(h - hp)) div (hn - hp) stays exact
      // integer (truncation toward zero in both engines). Edge hours
      // before the first / after the last observation stay NULL and are
      // tagged. One corpus shuffle; the grid frame is domain-bounded.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val hourly = table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 3600000000000").as("hour"))
          .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
          .pin
        val bounds = hourly.agg(min("hour").as("minh"), max("hour").as("maxh"))
        val grid = hourly.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(expr("sequence(minh, maxh)")).as("hour"))
        val g = grid.join(hourly, Seq("event_type", "hour"), "left")
        val wPrev = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(1, Window.unboundedFollowing)
        g.withColumn("hp", last(when(col("vm").isNotNull, col("hour")),
            ignoreNulls = true).over(wPrev))
          .withColumn("vp", last(when(col("vm").isNotNull, col("vm")),
            ignoreNulls = true).over(wPrev))
          .withColumn("hn", first(when(col("vm").isNotNull, col("hour")),
            ignoreNulls = true).over(wNext))
          .withColumn("vn", first(when(col("vm").isNotNull, col("vm")),
            ignoreNulls = true).over(wNext))
          .select(col("event_type"), col("hour"),
            expr("""CASE WHEN vm IS NOT NULL THEN vm
                   | WHEN hp IS NOT NULL AND hn IS NOT NULL
                   | THEN vp + ((vn - vp) * (hour - hp)) div (hn - hp)
                   | ELSE NULL END""".stripMargin).as("v_filled"),
            expr("""CASE WHEN vm IS NOT NULL THEN 'observed'
                   | WHEN hp IS NOT NULL AND hn IS NOT NULL THEN 'interp'
                   | ELSE 'edge' END""".stripMargin).as("src"))
          .orderBy("event_type", "hour")
      },
      Some("""|WITH hourly AS (
              |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
              |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
              |      AS vm
              |  FROM events GROUP BY 1, 2
              |), bounds AS (
              |  SELECT min(hour) AS minh, max(hour) AS maxh FROM hourly
              |), grid AS (
              |  SELECT t.event_type, g.hour
              |  FROM (SELECT DISTINCT event_type FROM hourly) t
              |  CROSS JOIN (SELECT unnest(generate_series(
              |    (SELECT minh FROM bounds), (SELECT maxh FROM bounds)))
              |    AS hour) g
              |), j AS (
              |  SELECT g.event_type, g.hour, h.vm,
              |    last_value(CASE WHEN h.vm IS NOT NULL THEN g.hour END
              |      IGNORE NULLS) OVER w_prev AS hp,
              |    last_value(h.vm IGNORE NULLS) OVER w_prev AS vp,
              |    first_value(CASE WHEN h.vm IS NOT NULL THEN g.hour END
              |      IGNORE NULLS) OVER w_next AS hn,
              |    first_value(h.vm IGNORE NULLS) OVER w_next AS vn
              |  FROM grid g LEFT JOIN hourly h
              |    ON h.event_type = g.event_type AND h.hour = g.hour
              |  WINDOW w_prev AS (PARTITION BY g.event_type ORDER BY g.hour
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    w_next AS (PARTITION BY g.event_type ORDER BY g.hour
              |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
              |)
              |SELECT event_type, hour,
              |  CASE WHEN vm IS NOT NULL THEN vm
              |    WHEN hp IS NOT NULL AND hn IS NOT NULL
              |    THEN vp + ((vn - vp) * (hour - hp)) // (hn - hp)
              |    ELSE NULL END AS v_filled,
              |  CASE WHEN vm IS NOT NULL THEN 'observed'
              |    WHEN hp IS NOT NULL AND hn IS NOT NULL THEN 'interp'
              |    ELSE 'edge' END AS src
              |FROM j ORDER BY event_type, hour""".stripMargin)),

    QueryDef("q290_pinball_grid_search",
      "distributed hyperparameter grid search: quantile-regression slope by exact pinball loss",
      // the grid-search shape every AutoML sweep reduces to: broadcast a
      // literal candidate grid (17 log-spaced slopes × 3 quantile levels),
      // fan each corpus row out over it, and let ONE map-combined
      // aggregation score every (candidate, tau) cell — no per-candidate
      // scans, no driver loop. Pinball loss on exact cent integers
      // (err = price − b·qty; loss10 = tau10·err⁺ + (10−tau10)·err⁻), so
      // the winner per tau (loss ASC, slope ASC) is engine-exact. The
      // winning slope tracks the conditional quantile: higher tau → higher
      // slope, certified by the oracle row-for-row.
      (s, dir) => {
        val cands = PinballSlopes.map(_.toString).mkString(",")
        table(s, dir, "lineitem")
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("pc"), col("l_quantity").cast("long").as("qty"))
          .select(explode(expr(s"array($cands)")).as("b"),
            col("pc"), col("qty"))
          .select(explode(expr("array(1, 5, 9)")).as("tau10"),
            col("b"), col("pc"), col("qty"))
          .withColumn("err", col("pc") - col("b") * col("qty"))
          .groupBy("tau10", "b")
          .agg(sum(expr(
            "CASE WHEN err >= 0 THEN tau10 * err ELSE (tau10 - 10) * err END"))
            .as("loss10"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("tau10").orderBy(col("loss10"), col("b"))))
          .filter(col("rn") === 1)
          .select(col("tau10").cast("long").as("tau10"),
            col("b").cast("long").as("best_b"),
            col("loss10"))
          .orderBy("tau10")
      },
      Some {
        val cands = PinballSlopes.mkString(", ")
        s"""|WITH fan AS (
            |  SELECT t.tau10, c.b,
            |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
            |    CAST(l_quantity AS BIGINT) AS qty
            |  FROM lineitem
            |  CROSS JOIN (SELECT unnest([$cands]) AS b) c
            |  CROSS JOIN (SELECT unnest([1, 5, 9]) AS tau10) t
            |), scored AS (
            |  SELECT tau10, b,
            |    CAST(sum(CASE WHEN pc - b * qty >= 0
            |      THEN tau10 * (pc - b * qty)
            |      ELSE (tau10 - 10) * (pc - b * qty) END) AS BIGINT)
            |      AS loss10
            |  FROM fan GROUP BY 1, 2
            |)
            |SELECT CAST(tau10 AS BIGINT) AS tau10,
            |  CAST(b AS BIGINT) AS best_b, loss10 FROM (
            |  SELECT tau10, b, loss10,
            |    row_number() OVER (PARTITION BY tau10
            |      ORDER BY loss10, b) AS rn
            |  FROM scored
            |) WHERE rn = 1 ORDER BY tau10""".stripMargin
      }),

    QueryDef("q291_dtw_distance",
      "dynamic-time-warping distance between per-type daily series (exact integer DP)",
      // the elastic time-series distance the euclidean profile measures
      // (q227) can't provide: DTW aligns shifted/warped seasonality. The
      // corpus collapses to |types| day-indexed milli-sum series FIRST
      // (one shuffle, series bounded by the day domain, never the
      // corpus), then each of the |types|² pairs runs the full DP as a
      // nested fold — rows of the DTW matrix ride a string-encoded
      // accumulator through Spark's `aggregate` HOF, with DuckDB's
      // list_reduce executing the IDENTICAL integer recurrence
      // D[i][j] = |a_i−b_j| + min(up, left, diag). All-integer, so the
      // distance is engine-exact.
      (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
          .groupBy("event_type")
          .agg(expr("transform(sort_array(collect_list(struct(day, vm)))," +
            " x -> x.vm)").as("series"))
        val pairs = daily.select(col("event_type").as("ta"),
            col("series").as("a"))
          .crossJoin(daily.select(col("event_type").as("tb"),
            col("series").as("b")))
          .filter(col("ta") < col("tb"))
        // first DP row: D[0][j] = |a_1 - b_j| + D[0][j-1]; then fold rows
        // i = 2..n with the inner fold over j = 2..m carrying (prev row =
        // acc, current row prefix = racc) as comma-joined strings.
        val dtw =
          """aggregate(
            |  slice(a, 2, size(a) - 1),
            |  aggregate(sequence(2, size(b)),
            |    CAST(abs(element_at(a, 1) - element_at(b, 1)) AS STRING),
            |    (racc, j) -> concat(racc, ',',
            |      CAST(abs(element_at(a, 1) - element_at(b, j))
            |        + CAST(element_at(split(racc, ','), -1) AS BIGINT)
            |        AS STRING))),
            |  (acc, ai) -> aggregate(sequence(2, size(b)),
            |    CAST(abs(ai - element_at(b, 1))
            |      + CAST(element_at(split(acc, ','), 1) AS BIGINT) AS STRING),
            |    (racc, j) -> concat(racc, ',',
            |      CAST(abs(ai - element_at(b, j))
            |        + least(
            |            CAST(element_at(split(acc, ','), j) AS BIGINT),
            |            CAST(element_at(split(acc, ','), j - 1) AS BIGINT),
            |            CAST(element_at(split(racc, ','), -1) AS BIGINT))
            |        AS STRING))))""".stripMargin
        pairs.select(col("ta"), col("tb"),
            size(col("a")).cast("long").as("len_a"),
            size(col("b")).cast("long").as("len_b"),
            expr(s"CAST(element_at(split($dtw, ','), -1) AS BIGINT)")
              .as("dtw"))
          .orderBy("ta", "tb")
      },
      Some("""|WITH daily AS (
              |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
              |      AS vm
              |  FROM events GROUP BY 1, 2
              |), ser AS (
              |  SELECT event_type, list(vm ORDER BY day) AS series
              |  FROM daily GROUP BY 1
              |), pairs AS (
              |  SELECT x.event_type AS ta, x.series AS a,
              |    y.event_type AS tb, y.series AS b
              |  FROM ser x JOIN ser y ON x.event_type < y.event_type
              |)
              |SELECT ta, tb, CAST(len(a) AS BIGINT) AS len_a,
              |  CAST(len(b) AS BIGINT) AS len_b,
              |  CAST(string_split(
              |    list_reduce(
              |      list_prepend(
              |        list_reduce(
              |          list_prepend(CAST(abs(a[1] - b[1]) AS VARCHAR),
              |            list_transform(generate_series(2, len(b)),
              |              x -> CAST(x AS VARCHAR))),
              |          (racc, s) -> racc || ',' ||
              |            CAST(abs(a[1] - b[CAST(s AS INT)])
              |              + CAST(string_split(racc, ',')[-1] AS BIGINT)
              |              AS VARCHAR)),
              |        list_transform(generate_series(2, len(a)),
              |          x -> CAST(x AS VARCHAR))),
              |      (acc, s) ->
              |        list_reduce(
              |          list_prepend(
              |            CAST(abs(a[CAST(s AS INT)] - b[1])
              |              + CAST(string_split(acc, ',')[1] AS BIGINT)
              |              AS VARCHAR),
              |            list_transform(generate_series(2, len(b)),
              |              x -> CAST(x AS VARCHAR))),
              |          (racc, t) -> racc || ',' ||
              |            CAST(abs(a[CAST(s AS INT)] - b[CAST(t AS INT)])
              |              + least(
              |                  CAST(string_split(acc, ',')[CAST(t AS INT)]
              |                    AS BIGINT),
              |                  CAST(string_split(acc, ',')[CAST(t AS INT) - 1]
              |                    AS BIGINT),
              |                  CAST(string_split(racc, ',')[-1] AS BIGINT))
              |              AS VARCHAR))),
              |    ',')[-1] AS BIGINT) AS dtw
              |FROM pairs ORDER BY ta, tb""".stripMargin)),

    QueryDef("q292_shapley_attribution",
      "exact Shapley-value conversion attribution over the 4-channel coalition lattice",
      // the game-theoretic completion of the attribution family (q151
      // last-touch, q203 linear, q284 Markov removal): with 4 channels the
      // 2⁴ coalition lattice is EXACT — no sampling. One corpus pass
      // builds each user's pre-first-purchase channel bitmask (bit_or of
      // per-type bits) + converted flag; the 16-row mask frame carries
      // v_e6(S) = conversions·1e6 div users (unobserved coalitions -> 0),
      // and Shapley φ_i = Σ_S |S|!(3−|S|)!·(v(S∪i)−v(S)) div 4! runs as a
      // 64-term join over the lattice — integers end-to-end, so the
      // axioms are engine-exact. Efficiency (Σφ = v(full)−v(∅)) holds up
      // to the e6 grid.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val e = table(s, dir, "events")
        val fp = e.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("fts"))
        val masks = e.join(fp, Seq("user_id"), "left")
          .filter(col("fts").isNull || col("ts") < col("fts"))
          .select(col("user_id"), col("fts"),
            expr("""CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                   | WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                   | ELSE 0 END""".stripMargin).as("bit"))
          .groupBy("user_id")
          .agg(expr("bit_or(bit)").as("mask"),
            max(expr("CASE WHEN fts IS NOT NULL THEN 1 ELSE 0 END"))
              .as("conv"))
        val v = masks.groupBy("mask")
          .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
          .withColumn("v_e6",
            expr("(n_conv * 1000000) div n_users")).pin
        val lattice = (0L until 16L).toDF("s_mask")
        val chans = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
          ("view", 8L)).toDF("channel", "cbit")
        lattice.crossJoin(chans)
          .filter(expr("(s_mask & cbit) = 0"))
          .join(v.select(col("mask").as("s_mask"),
            col("v_e6").as("v_s")), Seq("s_mask"), "left")
          .join(v.select(expr("mask").as("su_mask"),
            col("v_e6").as("v_su")),
            expr("su_mask = (s_mask | cbit)"), "left")
          .na.fill(0L, Seq("v_s", "v_su"))
          // w_num(|S|) = |S|! * (3-|S|)! for |S| = 0..3 -> 6, 2, 2, 6
          .withColumn("w_num", expr(
            "CASE bit_count(s_mask) WHEN 0 THEN 6 WHEN 1 THEN 2 " +
              "WHEN 2 THEN 2 ELSE 6 END"))
          .groupBy("channel")
          .agg(expr("CAST(sum(w_num * (v_su - v_s)) AS BIGINT) div 24")
            .as("phi_e6"))
          .orderBy("channel")
      },
      Some("""|WITH fp AS (
              |  SELECT user_id, min(ts) AS fts FROM events
              |  WHERE event_type = 'purchase' GROUP BY 1
              |), um AS (
              |  SELECT e.user_id,
              |    bit_or(CASE e.event_type WHEN 'click' THEN 1
              |      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
              |      WHEN 'view' THEN 8 ELSE 0 END) AS mask,
              |    max(CASE WHEN fp.fts IS NOT NULL THEN 1 ELSE 0 END) AS conv
              |  FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
              |  WHERE fp.fts IS NULL OR e.ts < fp.fts
              |  GROUP BY 1
              |), v AS (
              |  SELECT mask, count(*) AS n_users,
              |    CAST(sum(conv) AS BIGINT) AS n_conv,
              |    (CAST(sum(conv) AS BIGINT) * 1000000) // count(*) AS v_e6
              |  FROM um GROUP BY 1
              |), lattice AS (
              |  SELECT unnest(generate_series(0, 15)) AS s_mask
              |), chans(channel, cbit) AS (SELECT * FROM (VALUES
              |  ('click', 1), ('error', 2), ('signup', 4), ('view', 8)))
              |SELECT c.channel,
              |  CAST(sum(
              |    (CASE bit_count(l.s_mask) WHEN 0 THEN 6 WHEN 1 THEN 2
              |      WHEN 2 THEN 2 ELSE 6 END)
              |    * (COALESCE(vu.v_e6, 0) - COALESCE(vs.v_e6, 0)))
              |    AS BIGINT) // 24 AS phi_e6
              |FROM lattice l CROSS JOIN chans c
              |LEFT JOIN v vs ON vs.mask = l.s_mask
              |LEFT JOIN v vu ON vu.mask = (l.s_mask | c.cbit)
              |WHERE (l.s_mask & c.cbit) = 0
              |GROUP BY 1 ORDER BY c.channel""".stripMargin)),

    QueryDef("q293_diff_in_diff",
      "difference-in-differences: signup-cohort purchase-value effect across the time midpoint",
      // the workhorse causal estimator: treatment = users who ever signed
      // up (time-invariant), periods split at the integer midpoint of the
      // event-time range, outcome = mean purchase milli-value per
      // (group, period) cell. DiD = (T_post−T_pre) − (C_post−C_pre)
      // cancels both the group level difference and the common time
      // trend. ONE pass over purchases with a broadcast treatment
      // semi-flag and broadcast bounds; cell means micro-rounded as
      // (sum·1e6) div n so the estimate is engine-exact.
      (s, dir) => {
        val e = table(s, dir, "events")
        val bounds = e.agg(min("ts").as("t0"), max("ts").as("t1"))
        val treated = e.filter(col("event_type") === "signup")
          .select("user_id").distinct().withColumn("tr", lit(1L))
        def cell(t: Int, p: Int, nm: String) = {
          val cond = s"tflag = $t AND post = $p"
          expr(s"(CAST(sum(CASE WHEN $cond THEN vm END) AS BIGINT) " +
            s"* 1000000) div greatest(sum(CASE WHEN $cond THEN 1 ELSE 0 " +
            s"END), CAST(1 AS BIGINT))").as(nm)
        }
        e.filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("user_id"), col("ts"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
          .join(broadcast(treated), Seq("user_id"), "left")
          .na.fill(0L, Seq("tr"))
          .crossJoin(broadcast(bounds))
          .select(col("vm"), col("tr").as("tflag"),
            expr("CASE WHEN ts >= t0 + (t1 - t0) div 2 THEN 1 ELSE 0 END")
              .as("post"))
          .agg(cell(1, 0, "t_pre_e6"), cell(1, 1, "t_post_e6"),
            cell(0, 0, "c_pre_e6"), cell(0, 1, "c_post_e6"))
          .withColumn("did_e6", expr(
            "(t_post_e6 - t_pre_e6) - (c_post_e6 - c_pre_e6)"))
      },
      Some("""|WITH bounds AS (
              |  SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
              |  FROM events
              |), treated AS (
              |  SELECT DISTINCT user_id FROM events
              |  WHERE event_type = 'signup'
              |), base AS (
              |  SELECT CAST(floor(e.value * 1000) AS BIGINT) AS vm,
              |    CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS tflag,
              |    CASE WHEN epoch_ns(e.ts) >= b.t0 + (b.t1 - b.t0) // 2
              |      THEN 1 ELSE 0 END AS post
              |  FROM events e
              |  LEFT JOIN treated t ON t.user_id = e.user_id
              |  CROSS JOIN bounds b
              |  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
              |), cells AS (
              |  SELECT
              |    (CAST(sum(CASE WHEN tflag = 1 AND post = 0 THEN vm END)
              |      AS BIGINT) * 1000000) // greatest(CAST(sum(CASE WHEN tflag = 1
              |      AND post = 0 THEN 1 ELSE 0 END) AS BIGINT), 1) AS t_pre_e6,
              |    (CAST(sum(CASE WHEN tflag = 1 AND post = 1 THEN vm END)
              |      AS BIGINT) * 1000000) // greatest(CAST(sum(CASE WHEN tflag = 1
              |      AND post = 1 THEN 1 ELSE 0 END) AS BIGINT), 1) AS t_post_e6,
              |    (CAST(sum(CASE WHEN tflag = 0 AND post = 0 THEN vm END)
              |      AS BIGINT) * 1000000) // greatest(CAST(sum(CASE WHEN tflag = 0
              |      AND post = 0 THEN 1 ELSE 0 END) AS BIGINT), 1) AS c_pre_e6,
              |    (CAST(sum(CASE WHEN tflag = 0 AND post = 1 THEN vm END)
              |      AS BIGINT) * 1000000) // greatest(CAST(sum(CASE WHEN tflag = 0
              |      AND post = 1 THEN 1 ELSE 0 END) AS BIGINT), 1) AS c_post_e6
              |  FROM base
              |)
              |SELECT t_pre_e6, t_post_e6, c_pre_e6, c_post_e6,
              |  (t_post_e6 - t_pre_e6) - (c_post_e6 - c_pre_e6) AS did_e6
              |FROM cells""".stripMargin)),

    QueryDef("q294_conformal_calibration",
      "split-conformal prediction intervals: exact order-statistic quantile + held-out coverage",
      // the distribution-free uncertainty gate for any point model: hash-
      // split lineitem rows into calibration/test halves, score the fixed
      // q290-winner slope model's absolute residuals on calibration, take
      // q-hat as the EXACT k-th order statistic with the finite-sample
      // correction k = ceil((n_cal+1)(1−α)) (rank window, integer k from
      // integer arithmetic), then audit coverage of |y − ŷ| ≤ q-hat on
      // the held-out half. Valid coverage ≥ 1−α is the conformal
      // guarantee; both sides are integer cents so the audit is
      // engine-exact. Two scans of the residual frame (one per half),
      // order statistic via rank on the calibration shuffle.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val alphas = Seq(1L, 2L).toDF("alpha10") // alpha = 0.1, 0.2
        val res = table(s, dir, "lineitem")
          .select(
            expr("abs(CAST(round(l_extendedprice * 100) AS BIGINT) " +
              s"- $ConformalSlope * CAST(l_quantity AS BIGINT))").as("r"),
            expr(u60("concat('conf:', CAST(l_orderkey AS STRING), ':', " +
              "CAST(l_linenumber AS STRING))", spark = true) + " % 2 = 0")
              .as("is_cal"))
          .pin
        val calN = res.filter(col("is_cal"))
          .agg(count(lit(1)).as("n_cal"))
        // rank over the calibration residual frame: k-th order statistic
        // (the exact-quantile contract; the approximate tier is q91/q101).
        // Ties in r make rank assignment among equal values arbitrary, but
        // the VALUE at rank k is tie-invariant.
        val ranked = res.filter(col("is_cal"))
          .select(col("r").as("qhat"), row_number()
            .over(Window.orderBy(col("r"))).as("rk"))
        val qhats = broadcast(alphas).crossJoin(broadcast(calN))
          .withColumn("k", expr(
            "least((( (n_cal + 1) * (10 - alpha10) ) + 9) div 10, n_cal)"))
          .join(ranked, expr("rk = k"))
          .select(col("alpha10"), col("n_cal"), col("qhat"))
        qhats.crossJoin(
          res.filter(!col("is_cal"))
            .agg(count(lit(1)).as("n_test")))
          .join(res.filter(!col("is_cal")).select(col("r").as("rt"))
            .crossJoin(broadcast(qhats.select(col("alpha10").as("a2"),
              col("qhat").as("q2"))))
            .groupBy(col("a2").as("alpha10"))
            .agg(sum(when(col("rt") <= col("q2"), 1L).otherwise(0L))
              .as("n_covered")), Seq("alpha10"))
          .withColumn("coverage_e6",
            expr("(n_covered * 1000000) div greatest(n_test, " +
              "CAST(1 AS BIGINT))"))
          .select(col("alpha10"), col("n_cal"), col("qhat"), col("n_test"),
            col("n_covered"), col("coverage_e6"))
          .orderBy("alpha10")
      },
      Some {
        val h = u60("'conf:' || l_orderkey || ':' || l_linenumber",
          spark = false)
        s"""|WITH res AS (
            |  SELECT abs(CAST(round(l_extendedprice * 100) AS BIGINT)
            |      - $ConformalSlope * CAST(l_quantity AS BIGINT)) AS r,
            |    ($h) % 2 = 0 AS is_cal
            |  FROM lineitem
            |), caln AS (
            |  SELECT count(*) AS n_cal FROM res WHERE is_cal
            |), ranked AS (
            |  SELECT r AS qhat, row_number() OVER (ORDER BY r) AS rk
            |  FROM res WHERE is_cal
            |), alphas(alpha10) AS (SELECT * FROM (VALUES (1), (2))),
            |qhats AS (
            |  SELECT a.alpha10, c.n_cal, rk2.qhat
            |  FROM alphas a CROSS JOIN caln c
            |  JOIN ranked rk2 ON rk2.rk = least(
            |    (((c.n_cal + 1) * (10 - a.alpha10)) + 9) // 10, c.n_cal)
            |), testn AS (
            |  SELECT count(*) AS n_test FROM res WHERE NOT is_cal
            |), cov AS (
            |  SELECT q.alpha10,
            |    CAST(sum(CASE WHEN t.r <= q.qhat THEN 1 ELSE 0 END)
            |      AS BIGINT) AS n_covered
            |  FROM (SELECT r FROM res WHERE NOT is_cal) t
            |  CROSS JOIN qhats q GROUP BY 1
            |)
            |SELECT CAST(q.alpha10 AS BIGINT) AS alpha10, q.n_cal, q.qhat,
            |  tn.n_test, c.n_covered,
            |  (c.n_covered * 1000000) // greatest(tn.n_test, 1)
            |    AS coverage_e6
            |FROM qhats q CROSS JOIN testn tn
            |JOIN cov c ON c.alpha10 = q.alpha10
            |ORDER BY alpha10""".stripMargin
      }),

    QueryDef("q295_qini_uplift",
      "uplift-model evaluation: per-decile uplift and cumulative Qini over an activity score",
      // the uplift-eval harness: rank treatment (signup cohort) and
      // control users by the SAME score (view count, ties by user id),
      // then per score decile compare conversion rates and accumulate the
      // Qini statistic Q(k) = convT_cum − convC_cum·NT_cum/NC_cum — the
      // area under which is the standard uplift-model metric. Per-user
      // rollup is one shuffle; deciles (ntile over the bounded user
      // frame) and the cumulative window run on 10 rows. Kept exact:
      // qini_e6 = (convT_cum·NC_cum − convC_cum·NT_cum)·1e6 div NC_cum.
      (s, dir) => {
        val e = table(s, dir, "events")
        val users = e.groupBy("user_id").agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "signup", 1L).otherwise(0L))
            .as("tr"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val wDec = Window.orderBy(col("score").desc, col("user_id"))
        val dec = users
          .withColumn("dec", ntile(10).over(wDec).cast("long"))
          .groupBy("dec").agg(
            sum(when(col("tr") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("tr") === 1, col("conv")).otherwise(0L))
              .as("conv_t"),
            sum(when(col("tr") === 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("tr") === 0, col("conv")).otherwise(0L))
              .as("conv_c"))
        val wCum = Window.orderBy("dec")
          .rowsBetween(Window.unboundedPreceding, 0)
        dec
          .withColumn("nt_cum", sum("n_t").over(wCum))
          .withColumn("ct_cum", sum("conv_t").over(wCum))
          .withColumn("nc_cum", sum("n_c").over(wCum))
          .withColumn("cc_cum", sum("conv_c").over(wCum))
          .select(col("dec"), col("n_t"), col("conv_t"), col("n_c"),
            col("conv_c"),
            expr("""(conv_t * 1000000) div greatest(n_t, CAST(1 AS BIGINT))
                   | - (conv_c * 1000000) div greatest(n_c, CAST(1 AS BIGINT))
                   |""".stripMargin.replace("\n", " ")).as("uplift_e6"),
            expr("""((ct_cum * nc_cum - cc_cum * nt_cum) * 1000000)
                   | div greatest(nc_cum, CAST(1 AS BIGINT))
                   |""".stripMargin.replace("\n", " ")).as("qini_e6"))
          .orderBy("dec")
      },
      Some("""|WITH users AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS score,
              |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              |      AS tr,
              |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              |      END) AS BIGINT) AS conv
              |  FROM events GROUP BY 1
              |), dec AS (
              |  SELECT CAST(ntile(10) OVER (ORDER BY score DESC, user_id)
              |      AS BIGINT) AS dec,
              |    tr, conv
              |  FROM users
              |), cells AS (
              |  SELECT dec,
              |    CAST(sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_t,
              |    CAST(sum(CASE WHEN tr = 1 THEN conv ELSE 0 END) AS BIGINT)
              |      AS conv_t,
              |    CAST(sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_c,
              |    CAST(sum(CASE WHEN tr = 0 THEN conv ELSE 0 END) AS BIGINT)
              |      AS conv_c
              |  FROM dec GROUP BY 1
              |), cum AS (
              |  SELECT dec, n_t, conv_t, n_c, conv_c,
              |    CAST(sum(n_t) OVER w AS BIGINT) AS nt_cum,
              |    CAST(sum(conv_t) OVER w AS BIGINT) AS ct_cum,
              |    CAST(sum(n_c) OVER w AS BIGINT) AS nc_cum,
              |    CAST(sum(conv_c) OVER w AS BIGINT) AS cc_cum
              |  FROM cells
              |  WINDOW w AS (ORDER BY dec
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |)
              |SELECT dec, n_t, conv_t, n_c, conv_c,
              |  (conv_t * 1000000) // greatest(n_t, 1)
              |    - (conv_c * 1000000) // greatest(n_c, 1) AS uplift_e6,
              |  ((ct_cum * nc_cum - cc_cum * nt_cum) * 1000000)
              |    // greatest(nc_cum, 1) AS qini_e6
              |FROM cum ORDER BY dec""".stripMargin)),

    QueryDef("q296_raking_calibration",
      "survey raking (IPF): calibrate cell weights to uniform nation and observed priority margins",
      // the survey-statistics calibration step (iterative proportional
      // fitting): cell weights start at 1 and alternately rescale so the
      // weighted nation margin hits a UNIFORM target while the priority
      // margin stays at its observed total — 6 alternating round pairs on
      // the e6 integer grid converge to the raked weights a downstream
      // estimator multiplies in. One corpus join builds the 125-cell
      // (nation × priority) frame; every IPF pass runs on that pinned
      // frame through the SAME SQL template in both engines (q284's
      // dialect-substitution discipline).
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val cust = table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val nat = table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val cells = table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority").as("pr"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name", "pr").agg(count(lit(1)).as("cnt"))
          .pin
        cells.createOrReplaceTempView("rk_cells")
        s.sql(rakingSql(spark = true, rounds = 6, cellsRef = "rk_cells"))
      },
      Some {
        val cells =
          """(SELECT n_name, o_orderpriority AS pr,
            |  CAST(count(*) AS BIGINT) AS cnt
            | FROM orders
            | JOIN customer ON c_custkey = o_custkey
            | JOIN nation ON n_nationkey = c_nationkey
            | GROUP BY 1, 2)""".stripMargin
        rakingSql(spark = false, rounds = 6, cellsRef = cells)
      }),

    QueryDef("q297_als_halfstep",
      "matrix-factorization ALS half-step: exact per-user 2x2 ridge solve against hash-init item factors",
      // the distributed shape of one ALS iteration (the workhorse of
      // collaborative filtering): item factors FIXED (md5-derived 2-d
      // integer vectors — both engines rebuild them, no literals), each
      // user's factors solved in closed form from the 2x2 ridge normal
      // equations (H + λI)w = g accumulated over that user's ratings —
      // one rating scan builds (H11, H12, H22, g1, g2) as map-combined
      // integer sums, the Cramer solve is exact rational rounded to the
      // e3 grid (the q250 Cramer discipline; e3 keeps num*scale < 2^63
      // through sf1-class per-user rating counts), and the residual readout rejoins
      // ratings on the SAME customer key (exchange reuse, no extra
      // shuffle pattern). λ = 10000 keeps det ≥ λ² > 0.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val f1 = u60("concat('als:1:', CAST(l_partkey AS STRING))",
          spark = true) + " % 100"
        val f2 = u60("concat('als:2:', CAST(l_partkey AS STRING))",
          spark = true) + " % 100"
        val ratings = table(s, dir, "lineitem")
          .join(table(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("cust"),
            col("l_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as("r"))
          .select(col("cust"), col("r"),
            expr(f1).as("f1"), expr(f2).as("f2"))
          .pin
        val solved = ratings.groupBy("cust")
          .agg(count(lit(1)).as("n_items"),
            sum(expr("f1 * f1")).as("h11"),
            sum(expr("f1 * f2")).as("h12"),
            sum(expr("f2 * f2")).as("h22"),
            sum(expr("r * f1")).as("g1"),
            sum(expr("r * f2")).as("g2"))
          .withColumn("det", expr(
            "(h11 + 10000) * (h22 + 10000) - h12 * h12"))
          .withColumn("w1_e3", expr(
            "((h22 + 10000) * g1 - h12 * g2) * 1000 div det"))
          .withColumn("w2_e3", expr(
            "((h11 + 10000) * g2 - h12 * g1) * 1000 div det"))
        val out = solved.join(ratings, Seq("cust"))
          .groupBy(col("cust"), col("n_items"), col("w1_e3"), col("w2_e3"))
          .agg(sum(expr("abs(r * 1000 - (w1_e3 * f1 + w2_e3 * f2))"))
            .as("abs_err_sum_e3"))
          .withColumn("mae_e3", expr("abs_err_sum_e3 div n_items"))
        out.filter(col("cust") < 20)
          .select(col("cust"), col("n_items"), col("w1_e3"), col("w2_e3"),
            col("mae_e3"))
          .orderBy("cust")
      },
      Some {
        val f1 = u60("'als:1:' || l_partkey", spark = false) + " % 100"
        val f2 = u60("'als:2:' || l_partkey", spark = false) + " % 100"
        s"""|WITH ratings AS (
            |  SELECT o_custkey AS cust, l_partkey,
            |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r,
            |    $f1 AS f1, $f2 AS f2
            |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            |  GROUP BY 1, 2
            |), solved AS (
            |  SELECT cust, count(*) AS n_items,
            |    CAST(sum(f1 * f1) AS BIGINT) AS h11,
            |    CAST(sum(f1 * f2) AS BIGINT) AS h12,
            |    CAST(sum(f2 * f2) AS BIGINT) AS h22,
            |    CAST(sum(r * f1) AS BIGINT) AS g1,
            |    CAST(sum(r * f2) AS BIGINT) AS g2
            |  FROM ratings GROUP BY 1
            |), w AS (
            |  SELECT cust, n_items,
            |    (((h22 + 10000) * g1 - h12 * g2) * 1000)
            |      // ((h11 + 10000) * (h22 + 10000) - h12 * h12) AS w1_e3,
            |    (((h11 + 10000) * g2 - h12 * g1) * 1000)
            |      // ((h11 + 10000) * (h22 + 10000) - h12 * h12) AS w2_e3
            |  FROM solved
            |)
            |SELECT w.cust, w.n_items, w.w1_e3, w.w2_e3,
            |  CAST(sum(abs(r.r * 1000 - (w.w1_e3 * r.f1 + w.w2_e3 * r.f2)))
            |    AS BIGINT) // w.n_items AS mae_e3
            |FROM w JOIN ratings r ON r.cust = w.cust
            |WHERE w.cust < 20
            |GROUP BY 1, 2, 3, 4
            |ORDER BY w.cust""".stripMargin
      }),

    QueryDef("q298_perceptual_hash",
      "perceptual average-hash of REAL-decoded images + Hamming-1 near-dup census",
      // the image-dedup primitive: per 4x4-pixel tile, bit = (tile mean >
      // image mean), compared EXACTLY as cross products (sum_tile·n_img >
      // sum_img·n_tile — no division truncation), packed by tile position
      // into an integer aHash. The engine decodes real PNG bytes
      // (javax.imageio raster readback, the q183 contract); the oracle
      // rebuilds every pixel closed-form — decoder vs arithmetic, bit for
      // bit. Near-dup readout: exact-hash group sizes plus Hamming-1
      // neighbor counts via a 12-bit-flip explode joined against the
      // BOUNDED hash-frequency frame (≤4096 rows) — never doc×doc.
      (s, dir) => {
        import graft.multimodal.Multimodal
        import graft.operators.Checkpoints.Pinnable
        val png = udf { (id: Long) => Multimodal.syntheticGradientPng(id) }
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long").as("media_id"),
            lit("image").as("kind"),
            png(col("doc_id").cast("long")).as("payload"),
            lit(null).cast(Multimodal.MediaSchema("meta").dataType).as("meta"))
        val w = Window.partitionBy("media_id")
        val hashes = Multimodal.tileStats(media, 4, 4)
          .withColumn("nt", sum("n_px").over(w))
          .withColumn("st", sum("sum_lum").over(w))
          .groupBy(col("media_id").as("doc_id"))
          .agg(sum(expr("""CASE WHEN sum_lum * nt > st * n_px
                          | THEN CAST(shiftleft(1, tile_y * 4 + tile_x)
                          |   AS BIGINT) ELSE CAST(0 AS BIGINT)
                          | END""".stripMargin)).as("phash"))
          .pin
        val freq = hashes.groupBy(col("phash").as("h"))
          .agg(count(lit(1)).as("n")).pin
        val spark = s
        import spark.implicits._
        val flips = (0 until 12).map(k => 1L << k).toDF("flip")
        val h1 = hashes.crossJoin(broadcast(flips))
          .select(col("doc_id"), expr("phash ^ flip").as("h"))
          .join(broadcast(freq), Seq("h"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("n"), lit(0L))).as("n_hamming1"))
        hashes
          .join(broadcast(freq), col("phash") === col("h"))
          .select(col("doc_id"), col("phash"), (col("n") - 1L).as("n_same"))
          .join(h1, "doc_id")
          .orderBy("doc_id")
      },
      Some("""|WITH d AS (
              |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h,
              |    1 + doc_id % 5 AS ax, 1 + doc_id % 3 AS by, doc_id % 256 AS c
              |  FROM documents
              |), px AS (
              |  SELECT doc_id, x, y, (x * ax + y * by + c) % 256 AS lum,
              |    x // 4 AS tile_x, y // 4 AS tile_y
              |  FROM (
              |    SELECT d.*, xx.x, yy.y
              |    FROM d,
              |      LATERAL (SELECT unnest(generate_series(0,
              |        CAST(w - 1 AS INT))) AS x) xx,
              |      LATERAL (SELECT unnest(generate_series(0,
              |        CAST(h - 1 AS INT))) AS y) yy
              |  )
              |), tiles AS (
              |  SELECT doc_id, tile_x, tile_y,
              |    CAST(count(*) AS BIGINT) AS n_px,
              |    CAST(sum(lum) AS BIGINT) AS sum_lum
              |  FROM px GROUP BY 1, 2, 3
              |), tot AS (
              |  SELECT doc_id, CAST(sum(n_px) AS BIGINT) AS nt,
              |    CAST(sum(sum_lum) AS BIGINT) AS st
              |  FROM tiles GROUP BY 1
              |), hashes AS (
              |  SELECT t.doc_id,
              |    CAST(sum(CASE WHEN t.sum_lum * o.nt > o.st * t.n_px
              |      THEN CAST(1 AS BIGINT) << (t.tile_y * 4 + t.tile_x)
              |      ELSE 0 END) AS BIGINT) AS phash
              |  FROM tiles t JOIN tot o ON o.doc_id = t.doc_id
              |  GROUP BY 1
              |), freq AS (
              |  SELECT phash AS h, count(*) AS n FROM hashes GROUP BY 1
              |), h1 AS (
              |  SELECT hs.doc_id,
              |    CAST(sum(COALESCE(f.n, 0)) AS BIGINT) AS n_hamming1
              |  FROM hashes hs
              |  CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS k) b
              |  LEFT JOIN freq f
              |    ON f.h = xor(hs.phash, CAST(1 AS BIGINT) << CAST(b.k AS INT))
              |  GROUP BY 1
              |)
              |SELECT hs.doc_id, hs.phash, f.n - 1 AS n_same, h1.n_hamming1
              |FROM hashes hs
              |JOIN freq f ON f.h = hs.phash
              |JOIN h1 ON h1.doc_id = hs.doc_id
              |ORDER BY hs.doc_id""".stripMargin)),

    QueryDef("q299_holt_smoothing",
      "Holt double-exponential smoothing per event type: exact fixed-point fold + one-step error vs naive",
      // the level+trend forecaster one rung above q276's seasonal-naive
      // gate: per type, the day-bounded milli series folds through the
      // Holt recurrences on an e3 integer grid (α=0.5, β=0.2 as exact
      // tenths: l' = (5·y·1000 + 5·(l+b)) div 10, b' = (2·(l'−l) + 8·b)
      // div 10), accumulating the one-step absolute forecast error — the
      // recurrence is inherently sequential, which is exactly why it runs
      // over the BOUNDED aggregated series, never the raw events. The
      // (l, b, sae) state rides a comma-string accumulator through
      // Spark's aggregate HOF; DuckDB list_reduce replays it identically.
      // Output: final state + SAE vs the lag-1 naive SAE.
      (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
          .groupBy("event_type")
          .agg(expr("transform(sort_array(collect_list(struct(day, vm)))," +
            " x -> x.vm)").as("ser"))
          .filter(size(col("ser")) >= 2)
        // state string "l,b,sae"; forecast BEFORE update = l + b
        val fold =
          """aggregate(
            |  slice(ser, 3, size(ser) - 2),
            |  concat(CAST(element_at(ser, 1) * 1000 AS STRING), ',',
            |    CAST((element_at(ser, 2) - element_at(ser, 1)) * 1000
            |      AS STRING), ',0'),
            |  (acc, y) -> concat(
            |    CAST((5 * y * 1000 + 5 *
            |      (CAST(element_at(split(acc, ','), 1) AS BIGINT)
            |       + CAST(element_at(split(acc, ','), 2) AS BIGINT)))
            |      div 10 AS STRING), ',',
            |    CAST((2 * ((5 * y * 1000 + 5 *
            |      (CAST(element_at(split(acc, ','), 1) AS BIGINT)
            |       + CAST(element_at(split(acc, ','), 2) AS BIGINT)))
            |      div 10 - CAST(element_at(split(acc, ','), 1) AS BIGINT))
            |      + 8 * CAST(element_at(split(acc, ','), 2) AS BIGINT))
            |      div 10 AS STRING), ',',
            |    CAST(CAST(element_at(split(acc, ','), 3) AS BIGINT)
            |      + abs(y * 1000
            |        - (CAST(element_at(split(acc, ','), 1) AS BIGINT)
            |           + CAST(element_at(split(acc, ','), 2) AS BIGINT)))
            |      AS STRING)))""".stripMargin
        // guard: Spark sequence(3, 2) is DESCENDING, not empty — match
        // DuckDB's empty generate_series for 2-day series explicitly
        val naive =
          """CASE WHEN size(ser) < 3 THEN CAST(0 AS BIGINT) ELSE
            |  aggregate(sequence(3, size(ser)), CAST(0 AS BIGINT),
            |    (a, i) -> a + abs(element_at(ser, i)
            |      - element_at(ser, i - 1)) * 1000) END""".stripMargin
        daily.select(col("event_type"),
            size(col("ser")).cast("long").as("n_days"),
            expr(s"CAST(element_at(split($fold, ','), 1) AS BIGINT)")
              .as("level_e3"),
            expr(s"CAST(element_at(split($fold, ','), 2) AS BIGINT)")
              .as("trend_e3"),
            expr(s"CAST(element_at(split($fold, ','), 3) AS BIGINT)")
              .as("holt_sae_e3"),
            expr(naive).as("naive_sae_e3"))
          .withColumn("holt_vs_naive_e6", expr(
            "(holt_sae_e3 * 1000000) div greatest(naive_sae_e3, " +
              "CAST(1 AS BIGINT))"))
          .orderBy("event_type")
      },
      Some("""|WITH daily AS (
              |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
              |      AS vm
              |  FROM events GROUP BY 1, 2
              |), ser AS (
              |  SELECT event_type, list(vm ORDER BY day) AS ser
              |  FROM daily GROUP BY 1 HAVING count(*) >= 2
              |), folded AS (
              |  SELECT event_type, CAST(len(ser) AS BIGINT) AS n_days,
              |    list_reduce(
              |      list_prepend(
              |        CAST(ser[1] * 1000 AS VARCHAR) || ',' ||
              |          CAST((ser[2] - ser[1]) * 1000 AS VARCHAR) || ',0',
              |        list_transform(generate_series(3, len(ser)),
              |          i -> CAST(ser[i] AS VARCHAR))),
              |      (acc, s) -> (
              |        CAST((5 * CAST(s AS BIGINT) * 1000 + 5 *
              |          (CAST(string_split(acc, ',')[1] AS BIGINT)
              |           + CAST(string_split(acc, ',')[2] AS BIGINT)))
              |          // 10 AS VARCHAR) || ',' ||
              |        CAST((2 * ((5 * CAST(s AS BIGINT) * 1000 + 5 *
              |          (CAST(string_split(acc, ',')[1] AS BIGINT)
              |           + CAST(string_split(acc, ',')[2] AS BIGINT)))
              |          // 10 - CAST(string_split(acc, ',')[1] AS BIGINT))
              |          + 8 * CAST(string_split(acc, ',')[2] AS BIGINT))
              |          // 10 AS VARCHAR) || ',' ||
              |        CAST(CAST(string_split(acc, ',')[3] AS BIGINT)
              |          + abs(CAST(s AS BIGINT) * 1000
              |            - (CAST(string_split(acc, ',')[1] AS BIGINT)
              |               + CAST(string_split(acc, ',')[2] AS BIGINT)))
              |          AS VARCHAR))) AS st,
              |    CAST(list_sum(list_transform(generate_series(3, len(ser)),
              |      i -> abs(ser[i] - ser[i - 1]) * 1000)) AS BIGINT)
              |      AS naive_sae_e3
              |  FROM ser
              |)
              |SELECT event_type, n_days,
              |  CAST(string_split(st, ',')[1] AS BIGINT) AS level_e3,
              |  CAST(string_split(st, ',')[2] AS BIGINT) AS trend_e3,
              |  CAST(string_split(st, ',')[3] AS BIGINT) AS holt_sae_e3,
              |  COALESCE(naive_sae_e3, 0) AS naive_sae_e3,
              |  (CAST(string_split(st, ',')[3] AS BIGINT) * 1000000)
              |    // greatest(COALESCE(naive_sae_e3, 0), 1)
              |    AS holt_vs_naive_e6
              |FROM folded ORDER BY event_type""".stripMargin)),

    QueryDef("q300_cdc_chunk_dedup",
      "content-defined chunking dedup: hash-boundary chunks, cross-corpus storage savings",
      // the storage-dedup primitive behind every backup/CAS system:
      // chunk boundaries come from CONTENT (a 4-gram hash hitting 0 mod
      // 32), not fixed offsets, so an insertion shifts at most one
      // chunk's boundary instead of re-slicing the whole document —
      // which is why duplicated passages dedup across documents at all.
      // Boundary detection is a narrow position explode (linear in corpus
      // chars, no shuffle); chunks assemble via a per-doc lead window;
      // the dedup census is one hash-keyed aggregation. Output: corpus
      // bytes vs unique-chunk bytes and the dedup ratio.
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        val b1 = docs.select(col("doc_id"), col("text"),
          lit(1).as("start"))
        val bN = docs.filter(length(col("text")) >= 5)
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(2, length(text) - 3)")).as("i"))
          .filter(expr(
            u60("substring(text, i, 4)", spark = true) + " % 32 = 0"))
          .select(col("doc_id"), col("text"), col("i").as("start"))
        val w = Window.partitionBy("doc_id").orderBy("start")
        val chunks = b1.unionByName(bN)
          .withColumn("nxt", coalesce(lead("start", 1).over(w),
            length(col("text")) + 1))
          .select(col("doc_id"),
            expr("substr(text, start, nxt - start)").as("chunk"))
        val perChunk = chunks
          .groupBy(md5(col("chunk")).as("h"))
          .agg(count(lit(1)).as("n"),
            max(length(col("chunk"))).cast("long").as("len"))
        perChunk.agg(
            sum(expr("n * len")).as("total_bytes"),
            count(lit(1)).as("n_unique_chunks"),
            sum("len").as("unique_bytes"),
            sum("n").as("n_chunks"))
          .withColumn("dedup_ratio_e6",
            expr("(unique_bytes * 1000000) div greatest(total_bytes, " +
              "CAST(1 AS BIGINT))"))
          .select(col("n_chunks"), col("n_unique_chunks"),
            col("total_bytes"), col("unique_bytes"), col("dedup_ratio_e6"))
      },
      Some {
        val bh = u60("substr(text, i, 4)", spark = false)
        s"""|WITH docs AS (
            |  SELECT doc_id, text FROM documents WHERE length(text) >= 1
            |), starts AS (
            |  SELECT doc_id, text, 1 AS start FROM docs
            |  UNION ALL
            |  SELECT doc_id, text, i AS start FROM (
            |    SELECT doc_id, text,
            |      unnest(generate_series(2, length(text) - 3)) AS i
            |    FROM docs WHERE length(text) >= 5
            |  ) WHERE ($bh) % 32 = 0
            |), chunks AS (
            |  SELECT doc_id, substr(text, start,
            |    COALESCE(lead(start) OVER (PARTITION BY doc_id
            |      ORDER BY start), length(text) + 1) - start) AS chunk
            |  FROM starts
            |), perchunk AS (
            |  SELECT md5(chunk) AS h, CAST(count(*) AS BIGINT) AS n,
            |    CAST(max(length(chunk)) AS BIGINT) AS len
            |  FROM chunks GROUP BY 1
            |)
            |SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
            |  count(*) AS n_unique_chunks,
            |  CAST(sum(n * len) AS BIGINT) AS total_bytes,
            |  CAST(sum(len) AS BIGINT) AS unique_bytes,
            |  (CAST(sum(len) AS BIGINT) * 1000000)
            |    // greatest(CAST(sum(n * len) AS BIGINT), 1)
            |    AS dedup_ratio_e6
            |FROM perchunk""".stripMargin
      }),

    QueryDef("q301_process_conformance",
      "process-mining conformance: per-user fitness against a reference directly-follows model",
      // process mining's conformance check: the reference model is the
      // ALLOWED directly-follows relation (a literal set both engines
      // embed); each user's observed transition sequence (the q225 lag
      // window) scores fitness = allowed / total, and users roll up into
      // fitness-decile bins. One user-keyed window pass; the census frame
      // is 11 rows.
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val trans = e
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("user_id"),
            expr(s"CASE WHEN concat(prev, '>', event_type) IN " +
              s"($ConformanceAllowed) THEN 1 ELSE 0 END").as("ok"))
        trans.groupBy("user_id")
          .agg(count(lit(1)).as("n_trans"), sum("ok").as("n_ok"))
          .withColumn("fit_bin",
            expr("(n_ok * 10) div n_trans"))
          .groupBy("fit_bin")
          .agg(count(lit(1)).as("n_users"), sum("n_trans").as("n_trans"),
            sum("n_ok").as("n_ok"))
          .orderBy("fit_bin")
      },
      Some(s"""|WITH t AS (
               |  SELECT user_id, event_type,
               |    lag(event_type) OVER (PARTITION BY user_id
               |      ORDER BY ts, event_id) AS prev
               |  FROM events
               |), scored AS (
               |  SELECT user_id,
               |    CASE WHEN (prev || '>' || event_type) IN
               |      ($ConformanceAllowed) THEN 1 ELSE 0 END AS ok
               |  FROM t WHERE prev IS NOT NULL
               |), per_user AS (
               |  SELECT user_id, count(*) AS n_trans,
               |    CAST(sum(ok) AS BIGINT) AS n_ok
               |  FROM scored GROUP BY 1
               |)
               |SELECT (n_ok * 10) // n_trans AS fit_bin,
               |  count(*) AS n_users, CAST(sum(n_trans) AS BIGINT) AS n_trans,
               |  CAST(sum(n_ok) AS BIGINT) AS n_ok
               |FROM per_user GROUP BY 1 ORDER BY fit_bin""".stripMargin)),

    QueryDef("q302_good_turing",
      "Good-Turing vocabulary statistics per source: frequency-of-frequencies and missing mass",
      // the corpus-coverage question behind every vocabulary cutoff: how
      // much probability mass belongs to words we have NOT seen? The
      // Good-Turing estimate is hapax mass P0 = N1/N, with the smoothed
      // hapax count r* = 2·N2/N1. Term frequencies are one map-combined
      // shuffle; frequency-of-frequencies and the estimates run on the
      // bounded per-source spectrum frame. All integers with e6 ratios.
      (s, dir) => {
        val tf = table(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        tf.groupBy("source").agg(
            sum("c").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
            sum(when(col("c") >= 3, 1L).otherwise(0L)).as("n3plus"))
          .withColumn("p0_e6",
            expr("(n1 * 1000000) div greatest(n_tokens, CAST(1 AS BIGINT))"))
          .withColumn("r1_star_e6",
            expr("(2 * n2 * 1000000) div greatest(n1, CAST(1 AS BIGINT))"))
          .orderBy("source")
      },
      Some("""|WITH tf AS (
              |  SELECT source, w, count(*) AS c FROM (
              |    SELECT source, unnest(string_split(text, ' ')) AS w
              |    FROM documents
              |  ) WHERE w <> '' GROUP BY 1, 2
              |)
              |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
              |  count(*) AS n_types,
              |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              |  CAST(sum(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n3plus,
              |  (CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |    * 1000000) // greatest(CAST(sum(c) AS BIGINT), 1) AS p0_e6,
              |  (2 * CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
              |    * 1000000) // greatest(CAST(sum(CASE WHEN c = 1 THEN 1
              |    ELSE 0 END) AS BIGINT), 1) AS r1_star_e6
              |FROM tf GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("q306_ndcg_eval",
      "learning-to-rank evaluation: exact NDCG@10 of the co-occurrence ranker on held-out orders",
      // q288's graded companion: hit@k says WHETHER a relevant item made
      // the cut, NDCG says WHERE — graded by purchased quantity and
      // discounted by rank. The discount table round(1e6/log2(i+1)) is a
      // driver literal in BOTH engines, so DCG and ideal-DCG are exact
      // integer dot products, and ndcg_e6 = dcg·1e6 div idcg needs no
      // float. Same leakage discipline as q288 (customer-hash split);
      // ranking is a rank-10 window per held-out order pair; evals with
      // no candidates score 0 through the left join, not by dropping.
      (s, dir) => {
        val wArr = "array(" + NdcgWeights.mkString(",") + ")"
        val ord = table(s, dir, "orders").select(col("o_custkey"),
          col("o_orderkey"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("du"))
        val wNext = Window.partitionBy("o_custkey").orderBy("du", "o_orderkey")
        val pairsO = ord
          .withColumn("o_next", lead("o_orderkey", 1).over(wNext))
          .filter(col("o_next").isNotNull)
          .select(col("o_custkey"), col("o_orderkey").as("o1"),
            col("o_next").as("o2"))
          .withColumn("is_test", expr(
            u60("concat('rec:', CAST(o_custkey AS STRING))", spark = true) +
              " % 5 = 0"))

        val itemsQ = table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"), col("l_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as("qty"))

        val trainCnt = pairsO.filter(!col("is_test"))
          .join(itemsQ.select(col("l_orderkey").as("o1"),
            col("l_partkey").as("pa")), "o1")
          .join(itemsQ.select(col("l_orderkey").as("o2"),
            col("l_partkey").as("pb")), "o2")
          .groupBy("pa", "pb").agg(count(lit(1)).as("cnt"))
        val testPairs = pairsO.filter(col("is_test"))
          .select(col("o_custkey"), col("o1"), col("o2"))
        val cand = testPairs
          .join(itemsQ.select(col("l_orderkey").as("o1"),
            col("l_partkey").as("pa")), "o1")
          .join(trainCnt, "pa")
          .groupBy(col("o_custkey"), col("o1"), col("o2"), col("pb"))
          .agg(sum("cnt").as("score"))
        val wRank = Window.partitionBy("o_custkey", "o1", "o2")
          .orderBy(col("score").desc, col("pb"))
        val dcg = cand
          .withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= 10)
          .join(itemsQ.select(col("l_orderkey").as("o2"),
            col("l_partkey").as("pb"), col("qty")), Seq("o2", "pb"), "left")
          .na.fill(0L, Seq("qty"))
          .groupBy("o_custkey", "o1", "o2")
          .agg(sum(expr(s"qty * element_at($wArr, rn)")).as("dcg"))
        val wIdeal = Window.partitionBy("l_orderkey")
          .orderBy(col("qty").desc, col("l_partkey"))
        val idcg = itemsQ
          .withColumn("rn", row_number().over(wIdeal))
          .filter(col("rn") <= 10)
          .groupBy(col("l_orderkey").as("o2"))
          .agg(sum(expr(s"qty * element_at($wArr, rn)")).as("idcg"))
        testPairs
          .join(dcg, Seq("o_custkey", "o1", "o2"), "left")
          .na.fill(0L, Seq("dcg"))
          .join(idcg, "o2")
          .withColumn("ndcg_e6",
            expr("(dcg * 1000000) div greatest(idcg, CAST(1 AS BIGINT))"))
          .groupBy(expr("ndcg_e6 div 100000").as("ndcg_bin"))
          .agg(count(lit(1)).as("n_evals"), sum("ndcg_e6").as("sum_ndcg_e6"))
          .orderBy("ndcg_bin")
      },
      Some {
        val h = u60("'rec:' || o_custkey", spark = false)
        val wList = "[" + NdcgWeights.mkString(", ") + "]"
        s"""|WITH pairso AS (
            |  SELECT o_custkey, o_orderkey AS o1,
            |    lead(o_orderkey) OVER (PARTITION BY o_custkey
            |      ORDER BY epoch_us(o_orderdate), o_orderkey) AS o2,
            |    ($h) % 5 = 0 AS is_test
            |  FROM orders
            |), itemsq AS (
            |  SELECT l_orderkey, l_partkey,
            |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            |  FROM lineitem GROUP BY 1, 2
            |), traincnt AS (
            |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
            |    CAST(count(*) AS BIGINT) AS cnt
            |  FROM pairso p
            |  JOIN itemsq a ON a.l_orderkey = p.o1
            |  JOIN itemsq b ON b.l_orderkey = p.o2
            |  WHERE NOT p.is_test AND p.o2 IS NOT NULL
            |  GROUP BY 1, 2
            |), testpairs AS (
            |  SELECT o_custkey, o1, o2 FROM pairso
            |  WHERE is_test AND o2 IS NOT NULL
            |), cand AS (
            |  SELECT t.o_custkey, t.o1, t.o2, c.pb,
            |    CAST(sum(c.cnt) AS BIGINT) AS score
            |  FROM testpairs t
            |  JOIN itemsq a ON a.l_orderkey = t.o1
            |  JOIN traincnt c ON c.pa = a.l_partkey
            |  GROUP BY 1, 2, 3, 4
            |), ranked AS (
            |  SELECT o_custkey, o1, o2, pb, rn FROM (
            |    SELECT o_custkey, o1, o2, pb,
            |      row_number() OVER (PARTITION BY o_custkey, o1, o2
            |        ORDER BY score DESC, pb) AS rn
            |    FROM cand
            |  ) WHERE rn <= 10
            |), dcg AS (
            |  SELECT r.o_custkey, r.o1, r.o2,
            |    CAST(sum(COALESCE(i.qty, 0) * ($wList)[r.rn]) AS BIGINT)
            |      AS dcg
            |  FROM ranked r
            |  LEFT JOIN itemsq i ON i.l_orderkey = r.o2
            |    AND i.l_partkey = r.pb
            |  GROUP BY 1, 2, 3
            |), idcg AS (
            |  SELECT l_orderkey AS o2,
            |    CAST(sum(qty * ($wList)[rn]) AS BIGINT) AS idcg
            |  FROM (
            |    SELECT l_orderkey, qty, row_number() OVER (
            |      PARTITION BY l_orderkey ORDER BY qty DESC, l_partkey) AS rn
            |    FROM itemsq
            |  ) WHERE rn <= 10 GROUP BY 1
            |), evals AS (
            |  SELECT (COALESCE(d.dcg, 0) * 1000000)
            |    // greatest(i.idcg, 1) AS ndcg_e6
            |  FROM testpairs t
            |  LEFT JOIN dcg d ON d.o_custkey = t.o_custkey
            |    AND d.o1 = t.o1 AND d.o2 = t.o2
            |  JOIN idcg i ON i.o2 = t.o2
            |)
            |SELECT ndcg_e6 // 100000 AS ndcg_bin, count(*) AS n_evals,
            |  CAST(sum(ndcg_e6) AS BIGINT) AS sum_ndcg_e6
            |FROM evals GROUP BY 1 ORDER BY ndcg_bin""".stripMargin
      }),

    QueryDef("q309_block_bootstrap",
      "circular block bootstrap of the daily mean per event type (autocorrelation-preserving)",
      // the time-series bootstrap q262's row resampler gets WRONG:
      // independent row draws destroy autocorrelation, so uncertainty on
      // a dependent series needs whole BLOCKS. 20 replicates × 6 circular
      // blocks of 5 consecutive days, block starts md5-drawn (the
      // hash-threshold idiom — identical integers both engines), each
      // replicate's mean an exact integer, and the replicate spread read
      // off by exact rank (4th/17th of 20 ≈ p15/p85). The day-indexed
      // series frame is domain-bounded; the replicate fan-out is
      // literal-sized (types × 20 × 6 × 5 rows).
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
          .withColumn("idx", row_number().over(
            Window.partitionBy("event_type").orderBy("day")) - 1)
          .withColumn("n_days", count(lit(1)).over(
            Window.partitionBy("event_type")))
          .pin
        val reps = (for { r <- 0 until 20; b <- 0 until 6; o <- 0 until 5 }
          yield (r.toLong, b.toLong, o.toLong)).toDF("r", "b", "o")
        val drawn = daily.select("event_type").distinct()
          .crossJoin(broadcast(reps))
          .withColumn("u", expr(u60(
            "concat('bboot:', event_type, ':', CAST(r AS STRING), ':', " +
              "CAST(b AS STRING))", spark = true)))
        val picked = drawn.join(daily.select(col("event_type"),
            col("idx"), col("vm"), col("n_days")),
            Seq("event_type"))
          .filter(expr("idx = (u % n_days + o) % n_days"))
        val repMeans = picked.groupBy("event_type", "r")
          .agg(sum("vm").as("s"), count(lit(1)).as("n"))
          .withColumn("mean_e3", expr("(s * 1000) div n"))
        val wRk = Window.partitionBy("event_type")
          .orderBy(col("mean_e3"), col("r"))
        val ranked = repMeans
          .withColumn("rk", row_number().over(wRk))
        val orig = daily.groupBy("event_type")
          .agg(expr("(sum(vm) * 1000) div count(*)").as("orig_mean_e3"),
            max("n_days").as("n_days"))
        orig
          .join(ranked.filter(col("rk") === 4)
            .select(col("event_type"), col("mean_e3").as("lo_e3")),
            "event_type")
          .join(ranked.filter(col("rk") === 17)
            .select(col("event_type"), col("mean_e3").as("hi_e3")),
            "event_type")
          .select(col("event_type"), col("n_days"), col("orig_mean_e3"),
            col("lo_e3"), col("hi_e3"))
          .orderBy("event_type")
      },
      Some {
        val h = u60("'bboot:' || event_type || ':' || r || ':' || b",
          spark = false)
        s"""|WITH daily AS (
            |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
            |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
            |      AS vm
            |  FROM events GROUP BY 1, 2
            |), idxd AS (
            |  SELECT event_type, vm,
            |    row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
            |      AS idx,
            |    count(*) OVER (PARTITION BY event_type) AS n_days
            |  FROM daily
            |), reps AS (
            |  SELECT t.event_type, r.r, b.b, o.o, ($h) AS u
            |  FROM (SELECT DISTINCT event_type FROM daily) t
            |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS r) r
            |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS b) b
            |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS o) o
            |), picked AS (
            |  SELECT rp.event_type, rp.r, d.vm
            |  FROM reps rp JOIN idxd d ON d.event_type = rp.event_type
            |    AND d.idx = (rp.u % d.n_days + rp.o) % d.n_days
            |), repmeans AS (
            |  SELECT event_type, r,
            |    (CAST(sum(vm) AS BIGINT) * 1000) // count(*) AS mean_e3
            |  FROM picked GROUP BY 1, 2
            |), ranked AS (
            |  SELECT event_type, mean_e3,
            |    row_number() OVER (PARTITION BY event_type
            |      ORDER BY mean_e3, r) AS rk
            |  FROM repmeans
            |), orig AS (
            |  SELECT event_type,
            |    (CAST(sum(vm) AS BIGINT) * 1000) // count(*) AS orig_mean_e3,
            |    CAST(count(*) AS BIGINT) AS n_days
            |  FROM idxd GROUP BY 1
            |)
            |SELECT o.event_type, o.n_days, o.orig_mean_e3,
            |  lo.mean_e3 AS lo_e3, hi.mean_e3 AS hi_e3
            |FROM orig o
            |JOIN ranked lo ON lo.event_type = o.event_type AND lo.rk = 4
            |JOIN ranked hi ON hi.event_type = o.event_type AND hi.rk = 17
            |ORDER BY o.event_type""".stripMargin
      }),

    QueryDef("q310_prefix_sum_cube",
      "2-D prefix-sum cube: O(1) rectangle aggregates audited against direct sums",
      // the OLAP pre-aggregation contract: materialize P(i,j) = cumulative
      // (day, hour) milli-sums once, then ANY rectangle aggregate is four
      // lookups (P(b,r) − P(a−1,r) − P(b,l−1) + P(a−1,l−1)) instead of a
      // scan — and the audit proves the materialization EXACT by comparing
      // every probe rectangle against the direct cell sum. The cell frame
      // is domain-bounded (days × 24); both cumulative passes are windows
      // over it; probes join the four corner rows via a broadcast of the
      // tiny prefix frame. Integer milli-sums end-to-end.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val sparse = table(s, dir, "events")
          .select(expr("ts div 86400000000000").as("d"),
            expr("(ts div 3600000000000) % 24").as("h"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
          .groupBy("d", "h").agg(sum("vm").as("vm"))
          .withColumn("di", dense_rank().over(
            Window.orderBy("d")).cast("long") - 1) // contiguous day index
        // DENSIFY: the prefix recurrence needs every (day, hour) cell —
        // a missing row would silently drop its whole running column
        val cells = sparse.select("di").distinct()
          .crossJoin(spark.range(0, 24).select(col("id").as("h")))
          .join(sparse.select(col("di"), col("h"), col("vm")),
            Seq("di", "h"), "left")
          .na.fill(0L, Seq("vm"))
          .pin
        val wH = Window.partitionBy("di").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wD = Window.partitionBy("h").orderBy("di")
          .rowsBetween(Window.unboundedPreceding, 0)
        val prefix = cells
          .withColumn("ph", sum("vm").over(wH))
          .withColumn("p", sum("ph").over(wD))
          .select(col("di"), col("h"), col("vm"), col("p"))
          .pin
        val probes = CubeProbes.toDF("ra", "rb", "ca", "cb")
        def corner(di: String, h: String, nm: String) =
          prefix.select(col("di").as(s"_d$nm"), col("h").as(s"_h$nm"),
            col("p").as(nm))
        val withCorners = broadcast(probes)
          .join(corner("di", "h", "p_br"),
            expr(s"_dp_br = rb AND _hp_br = cb"), "left")
          .join(corner("di", "h", "p_tr"),
            expr(s"_dp_tr = ra - 1 AND _hp_tr = cb"), "left")
          .join(corner("di", "h", "p_bl"),
            expr(s"_dp_bl = rb AND _hp_bl = ca - 1"), "left")
          .join(corner("di", "h", "p_tl"),
            expr(s"_dp_tl = ra - 1 AND _hp_tl = ca - 1"), "left")
        val direct = cells.crossJoin(broadcast(probes))
          .filter(col("di") >= col("ra") && col("di") <= col("rb") &&
            col("h") >= col("ca") && col("h") <= col("cb"))
          .groupBy("ra", "rb", "ca", "cb")
          .agg(sum("vm").as("direct_sum"))
        withCorners
          .withColumn("prefix_sum", expr(
            "COALESCE(p_br, 0) - COALESCE(p_tr, 0) " +
              "- COALESCE(p_bl, 0) + COALESCE(p_tl, 0)"))
          .join(direct, Seq("ra", "rb", "ca", "cb"), "left")
          .na.fill(0L, Seq("direct_sum"))
          .select(col("ra"), col("rb"), col("ca"), col("cb"),
            col("direct_sum"), col("prefix_sum"),
            (col("direct_sum") === col("prefix_sum")).as("exact"))
          .orderBy("ra", "ca", "rb", "cb")
      },
      Some {
        val values = CubeProbes
          .map { case (ra, rb, ca, cb) => s"($ra, $rb, $ca, $cb)" }
          .mkString(", ")
        s"""|WITH cells AS (
            |  SELECT d, h, vm, dense_rank() OVER (ORDER BY d) - 1 AS di
            |  FROM (
            |    SELECT epoch_ns(ts) // 86400000000000 AS d,
            |      (epoch_ns(ts) // 3600000000000) % 24 AS h,
            |      CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
            |        AS vm
            |    FROM events GROUP BY 1, 2)
            |), dense AS (
            |  SELECT dd.di, hh.h, COALESCE(c.vm, 0) AS vm
            |  FROM (SELECT DISTINCT di FROM cells) dd
            |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) hh
            |  LEFT JOIN cells c ON c.di = dd.di AND c.h = hh.h
            |), prefix AS (
            |  SELECT di, h, vm,
            |    CAST(sum(ph) OVER (PARTITION BY h ORDER BY di
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |      AS BIGINT) AS p
            |  FROM (
            |    SELECT di, h, vm, CAST(sum(vm) OVER (PARTITION BY di
            |      ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND
            |      CURRENT ROW) AS BIGINT) AS ph
            |    FROM dense)
            |), probes(ra, rb, ca, cb) AS (SELECT * FROM (VALUES $values)),
            |direct AS (
            |  SELECT p.ra, p.rb, p.ca, p.cb,
            |    CAST(sum(c.vm) AS BIGINT) AS direct_sum
            |  FROM probes p JOIN cells c ON c.di BETWEEN p.ra AND p.rb
            |    AND c.h BETWEEN p.ca AND p.cb
            |  GROUP BY 1, 2, 3, 4
            |)
            |SELECT p.ra, p.rb, p.ca, p.cb,
            |  COALESCE(d.direct_sum, 0) AS direct_sum,
            |  COALESCE(br.p, 0) - COALESCE(tr.p, 0) - COALESCE(bl.p, 0)
            |    + COALESCE(tl.p, 0) AS prefix_sum,
            |  COALESCE(d.direct_sum, 0) = COALESCE(br.p, 0)
            |    - COALESCE(tr.p, 0) - COALESCE(bl.p, 0) + COALESCE(tl.p, 0)
            |    AS exact
            |FROM probes p
            |LEFT JOIN prefix br ON br.di = p.rb AND br.h = p.cb
            |LEFT JOIN prefix tr ON tr.di = p.ra - 1 AND tr.h = p.cb
            |LEFT JOIN prefix bl ON bl.di = p.rb AND bl.h = p.ca - 1
            |LEFT JOIN prefix tl ON tl.di = p.ra - 1 AND tl.h = p.ca - 1
            |LEFT JOIN direct d ON d.ra = p.ra AND d.rb = p.rb
            |  AND d.ca = p.ca AND d.cb = p.cb
            |ORDER BY p.ra, p.ca, p.rb, p.cb""".stripMargin
      }),

    QueryDef("q311_srm_gate",
      "sample-ratio-mismatch gate: per-day chi-square detects a planted treatment-arm logging loss",
      // the first thing a trustworthy experiment platform checks: does
      // the OBSERVED arm split match the design? Assignment is a 50/50
      // user hash; the pipeline then PLANTS the classic bug — treatment-
      // arm events whose milli-value ≡ 0 mod 10 are dropped (a ~10%
      // one-sided logging loss) — and the per-day chi-square
      // (n_t − n_c)²·1e6 div (n_t + n_c) must light up against the
      // χ²(1, 0.05) = 3.8415 threshold while a clean split would not.
      // One scan, day-keyed aggregation; everything integer.
      (s, dir) => {
        table(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"),
            expr(u60("concat('srm:', CAST(user_id AS STRING))",
              spark = true) + " % 2").as("arm"),
            expr("CAST(floor(value * 1000) AS BIGINT) % 10").as("vslot"))
          .filter(!(col("arm") === 1 && col("vslot") === 0)) // planted loss
          .groupBy("day")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
          .withColumn("chi2_e6", expr(
            "((n_t - n_c) * (n_t - n_c) * 1000000) " +
              "div greatest(n_t + n_c, CAST(1 AS BIGINT))"))
          .withColumn("srm_flag", col("chi2_e6") > 3841459L)
          .orderBy("day")
      },
      Some {
        val h = u60("'srm:' || user_id", spark = false)
        s"""|WITH base AS (
            |  SELECT epoch_ns(ts) // 86400000000000 AS day,
            |    ($h) % 2 AS arm,
            |    CAST(floor(value * 1000) AS BIGINT) % 10 AS vslot
            |  FROM events
            |), kept AS (
            |  SELECT * FROM base WHERE NOT (arm = 1 AND vslot = 0)
            |), days AS (
            |  SELECT day,
            |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
            |      AS n_t,
            |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
            |      AS n_c
            |  FROM kept GROUP BY 1
            |)
            |SELECT day, n_t, n_c,
            |  ((n_t - n_c) * (n_t - n_c) * 1000000)
            |    // greatest(n_t + n_c, 1) AS chi2_e6,
            |  ((n_t - n_c) * (n_t - n_c) * 1000000)
            |    // greatest(n_t + n_c, 1) > 3841459 AS srm_flag
            |FROM days ORDER BY day""".stripMargin
      }),

    QueryDef("q312_joinability_discovery",
      "data-catalog joinability discovery: pairwise value containment across key columns",
      // the data-discovery question a catalog answers about an unfamiliar
      // lake: WHICH columns join? Every registered key column collapses
      // to its distinct-value set (map-combined, one tagged union), and
      // ONE value-keyed self-join yields every pairwise intersection —
      // never a per-pair scan. Directional containments |A∩B|/|A| and
      // |A∩B|/|B| (the FK detector: a true foreign key shows containment
      // 1.0 into its dimension) plus Jaccard, exact e6 integers; pairs
      // with empty intersection drop.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val cols = Seq(
          ("orders.o_custkey", "orders", "o_custkey"),
          ("customer.c_custkey", "customer", "c_custkey"),
          ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
          ("orders.o_orderkey", "orders", "o_orderkey"),
          ("lineitem.l_partkey", "lineitem", "l_partkey"),
          ("part.p_partkey", "part", "p_partkey"),
          ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
          ("supplier.s_suppkey", "supplier", "s_suppkey"),
          ("customer.c_nationkey", "customer", "c_nationkey"),
          ("nation.n_nationkey", "nation", "n_nationkey"),
          ("events.user_id", "events", "user_id"))
        val tagged = cols.map { case (name, t, c) =>
          table(s, dir, t).select(col(c).cast("long").as("v")).distinct()
            .select(lit(name).as("cname"), col("v"))
        }.reduce(_ unionByName _).pin
        val sizes = tagged.groupBy("cname").agg(count(lit(1)).as("n"))
        val inter = tagged.as("a").join(tagged.as("b"),
            col("a.v") === col("b.v") && col("a.cname") < col("b.cname"))
          .groupBy(col("a.cname").as("col_a"), col("b.cname").as("col_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.select(col("cname").as("col_a"), col("n").as("n_a")),
            "col_a")
          .join(sizes.select(col("cname").as("col_b"), col("n").as("n_b")),
            "col_b")
          .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
            col("n_inter"),
            expr("(n_inter * 1000000) div n_a").as("cont_a_in_b_e6"),
            expr("(n_inter * 1000000) div n_b").as("cont_b_in_a_e6"),
            expr("(n_inter * 1000000) div (n_a + n_b - n_inter)")
              .as("jaccard_e6"))
          .orderBy("col_a", "col_b")
      },
      Some("""|WITH tagged AS (
              |  SELECT 'orders.o_custkey' AS cname,
              |    CAST(o_custkey AS BIGINT) AS v FROM orders GROUP BY 2
              |  UNION ALL SELECT 'customer.c_custkey',
              |    CAST(c_custkey AS BIGINT) FROM customer GROUP BY 2
              |  UNION ALL SELECT 'lineitem.l_orderkey',
              |    CAST(l_orderkey AS BIGINT) FROM lineitem GROUP BY 2
              |  UNION ALL SELECT 'orders.o_orderkey',
              |    CAST(o_orderkey AS BIGINT) FROM orders GROUP BY 2
              |  UNION ALL SELECT 'lineitem.l_partkey',
              |    CAST(l_partkey AS BIGINT) FROM lineitem GROUP BY 2
              |  UNION ALL SELECT 'part.p_partkey',
              |    CAST(p_partkey AS BIGINT) FROM part GROUP BY 2
              |  UNION ALL SELECT 'lineitem.l_suppkey',
              |    CAST(l_suppkey AS BIGINT) FROM lineitem GROUP BY 2
              |  UNION ALL SELECT 'supplier.s_suppkey',
              |    CAST(s_suppkey AS BIGINT) FROM supplier GROUP BY 2
              |  UNION ALL SELECT 'customer.c_nationkey',
              |    CAST(c_nationkey AS BIGINT) FROM customer GROUP BY 2
              |  UNION ALL SELECT 'nation.n_nationkey',
              |    CAST(n_nationkey AS BIGINT) FROM nation GROUP BY 2
              |  UNION ALL SELECT 'events.user_id',
              |    CAST(user_id AS BIGINT) FROM events GROUP BY 2
              |), sizes AS (
              |  SELECT cname, count(*) AS n FROM tagged GROUP BY 1
              |), inter AS (
              |  SELECT a.cname AS col_a, b.cname AS col_b,
              |    CAST(count(*) AS BIGINT) AS n_inter
              |  FROM tagged a JOIN tagged b
              |    ON a.v = b.v AND a.cname < b.cname
              |  GROUP BY 1, 2
              |)
              |SELECT i.col_a, i.col_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
              |  (i.n_inter * 1000000) // sa.n AS cont_a_in_b_e6,
              |  (i.n_inter * 1000000) // sb.n AS cont_b_in_a_e6,
              |  (i.n_inter * 1000000) // (sa.n + sb.n - i.n_inter)
              |    AS jaccard_e6
              |FROM inter i
              |JOIN sizes sa ON sa.cname = i.col_a
              |JOIN sizes sb ON sb.cname = i.col_b
              |ORDER BY i.col_a, i.col_b""".stripMargin)),

    QueryDef("q313_rake_keywords",
      "RAKE keyword extraction: stopword-delimited phrases scored by corpus degree/frequency",
      // the classic unsupervised keyphrase extractor (Rose et al. 2010)
      // at corpus scale: phrases are maximal stopword-free word runs
      // (island trick — position minus non-stop rank is constant within a
      // run, so NO sequential pass), word score = degree/frequency over
      // ALL phrase occurrences (degree counts co-members including self),
      // and a phrase scores the sum of its words. Integer e6 scores, one
      // tokenize shuffle + bounded vocab/phrase aggregations; identical
      // phrase text ⇒ identical score, so the census dedupes exactly.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
        val words = table(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "p", "w")
          .filter(col("w") =!= "")
          .withColumn("is_stop", expr(s"w IN ($stopList)"))
        val isl = words.filter(!col("is_stop"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy("p")))
          .withColumn("isl", col("p") - col("rn"))
          .withColumn("plen", count(lit(1)).over(
            Window.partitionBy("doc_id", "isl")))
          .pin
        val wordScore = isl.groupBy("w")
          .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
          .withColumn("wscore_e6", expr("(deg * 1000000) div freq"))
        val phrases = isl.join(broadcast(wordScore.select("w", "wscore_e6")),
            "w")
          .groupBy("doc_id", "isl")
          .agg(expr("concat_ws(' ', transform(" +
            "sort_array(collect_list(struct(p, w))), x -> x.w))")
            .as("phrase"),
            sum("wscore_e6").as("score_e6"),
            count(lit(1)).as("n_words"))
        phrases.groupBy("phrase")
          .agg(count(lit(1)).as("n_occur"), max("score_e6").as("score_e6"),
            max("n_words").as("n_words"))
          .orderBy(col("score_e6").desc, col("phrase"))
          .limit(20)
      },
      Some {
        val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
        s"""|WITH words AS (
            |  SELECT doc_id, p, w FROM (
            |    SELECT doc_id,
            |      unnest(string_split(text, ' ')) AS w,
            |      unnest(generate_series(1, len(string_split(text, ' '))))
            |        AS p
            |    FROM documents
            |  ) WHERE w <> '' AND w NOT IN ($stopList)
            |), isl AS (
            |  SELECT doc_id, p, w,
            |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
            |      AS isl
            |  FROM words
            |), sized AS (
            |  SELECT doc_id, p, w, isl,
            |    count(*) OVER (PARTITION BY doc_id, isl) AS plen
            |  FROM isl
            |), wordscore AS (
            |  SELECT w, count(*) AS freq,
            |    CAST(sum(plen) AS BIGINT) AS deg,
            |    (CAST(sum(plen) AS BIGINT) * 1000000) // count(*)
            |      AS wscore_e6
            |  FROM sized GROUP BY 1
            |), phrases AS (
            |  SELECT s.doc_id, s.isl,
            |    string_agg(s.w, ' ' ORDER BY s.p) AS phrase,
            |    CAST(sum(ws.wscore_e6) AS BIGINT) AS score_e6,
            |    count(*) AS n_words
            |  FROM sized s JOIN wordscore ws ON ws.w = s.w
            |  GROUP BY 1, 2
            |)
            |SELECT phrase, count(*) AS n_occur,
            |  CAST(max(score_e6) AS BIGINT) AS score_e6,
            |  CAST(max(n_words) AS BIGINT) AS n_words
            |FROM phrases GROUP BY 1
            |ORDER BY score_e6 DESC, phrase LIMIT 20""".stripMargin
      }),

    QueryDef("q314_forgotten_audit",
      "right-to-be-forgotten propagation audit: deletion reach across raw, derived, and aggregate tiers",
      // the compliance question a deletion pipeline must PROVE: after
      // scrubbing a user set at the source (anti-join), what remains
      // linked in each derived tier? Raw events and gap-sessionization go
      // to zero (row-linked tiers rebuild clean), but the published DAILY
      // AGGREGATE carries the deleted users' contributions with no
      // user_id to anti-join on — the residue metric counts exactly how
      // many embedded rows a source-only scrub leaves inside
      // previously-published aggregates (the reason aggregate stores
      // need recomputation windows, not just tombstones). One events
      // scan per tier; the deletion set rides a broadcast anti-join.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val spark = s
        import spark.implicits._
        val e = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("ts div 86400000000000").as("day")).pin
        val scrubbed = e.filter(col("user_id") % 97 =!= 0)
        def sessions(src: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          src.withColumn("prev", lag("ts", 1).over(w))
            .withColumn("new_sess", expr(
              "CASE WHEN prev IS NULL OR ts - prev > 1800000000000 " +
                "THEN 1 ELSE 0 END"))
            .groupBy("user_id").agg(sum("new_sess").as("n_sessions"))
        }
        val evBefore = e.filter(col("user_id") % 97 === 0)
          .agg(count(lit(1)).as("n"))
        val evAfter = scrubbed.filter(col("user_id") % 97 === 0)
          .agg(count(lit(1)).as("n"))
        val seBefore = sessions(e).filter(col("user_id") % 97 === 0)
          .agg(coalesce(sum("n_sessions"), lit(0L)).as("n"))
        val seAfter = sessions(scrubbed).filter(col("user_id") % 97 === 0)
          .agg(coalesce(sum("n_sessions"), lit(0L)).as("n"))
        val residue = e.groupBy("day").agg(count(lit(1)).as("nb"))
          .join(scrubbed.groupBy("day").agg(count(lit(1)).as("na")),
            Seq("day"), "left")
          .na.fill(0L, Seq("na"))
          .agg(sum(expr("abs(nb - na)")).as("n"))
        def row(nm: String, before: org.apache.spark.sql.DataFrame,
                after: org.apache.spark.sql.DataFrame) =
          before.crossJoin(after.withColumnRenamed("n", "n2"))
            .select(lit(nm).as("tier"), col("n").as("n_before_linked"),
              col("n2").as("n_after_linked"))
        row("1_events", evBefore, evAfter)
          .unionByName(row("2_sessions", seBefore, seAfter))
          .unionByName(residue.crossJoin(residue.withColumnRenamed("n", "n2"))
            .select(lit("3_daily_aggregate_residue").as("tier"),
              col("n").as("n_before_linked"),
              lit(0L).as("n_after_linked")))
          .orderBy("tier")
      },
      Some("""|WITH e AS (
              |  SELECT user_id, event_id, epoch_ns(ts) AS tn,
              |    epoch_ns(ts) // 86400000000000 AS day
              |  FROM events
              |), scrubbed AS (SELECT * FROM e WHERE user_id % 97 <> 0),
              |sess AS (
              |  SELECT user_id, CAST(sum(CASE WHEN prev IS NULL
              |      OR tn - prev > 1800000000000 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_sessions
              |  FROM (
              |    SELECT user_id, tn, lag(tn) OVER (PARTITION BY user_id
              |      ORDER BY tn, event_id) AS prev
              |    FROM e) GROUP BY 1
              |), sess2 AS (
              |  SELECT user_id, CAST(sum(CASE WHEN prev IS NULL
              |      OR tn - prev > 1800000000000 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_sessions
              |  FROM (
              |    SELECT user_id, tn, lag(tn) OVER (PARTITION BY user_id
              |      ORDER BY tn, event_id) AS prev
              |    FROM scrubbed) GROUP BY 1
              |), resid AS (
              |  SELECT CAST(sum(abs(b.nb - COALESCE(a.na, 0))) AS BIGINT)
              |    AS n
              |  FROM (SELECT day, CAST(count(*) AS BIGINT) AS nb
              |        FROM e GROUP BY 1) b
              |  LEFT JOIN (SELECT day, CAST(count(*) AS BIGINT) AS na
              |        FROM scrubbed GROUP BY 1) a ON a.day = b.day
              |)
              |SELECT '1_events' AS tier,
              |  (SELECT count(*) FROM e WHERE user_id % 97 = 0)
              |    AS n_before_linked,
              |  (SELECT count(*) FROM scrubbed WHERE user_id % 97 = 0)
              |    AS n_after_linked
              |UNION ALL
              |SELECT '2_sessions',
              |  (SELECT COALESCE(CAST(sum(n_sessions) AS BIGINT), 0)
              |   FROM sess WHERE user_id % 97 = 0),
              |  (SELECT COALESCE(CAST(sum(n_sessions) AS BIGINT), 0)
              |   FROM sess2 WHERE user_id % 97 = 0)
              |UNION ALL
              |SELECT '3_daily_aggregate_residue',
              |  (SELECT n FROM resid), 0
              |ORDER BY tier""".stripMargin)),

    QueryDef("q316_capped_sessions",
      "capped sessionization: 12h idle-gap sessions under a hard 24h duration ceiling, per-user stats",
      // plain gap sessions are window-expressible (q103/q314 islands); a
      // DURATION CAP is not — the session clock restarts at the first
      // event past the cap, so each boundary depends on the previous one.
      // Sessionize.cappedSessionStats runs the recurrence as a per-user
      // codegen'd aggregate-HOF fold over the sorted timestamp list (one
      // shuffle on user_id, six-BIGINT comma-string state — the q299
      // idiom); DuckDB list_reduce replays the identical fold. Output per
      // user: event/session counts, cap-forced splits (sessions that
      // exist only because of the ceiling), and the largest session.
      (s, dir) => graft.operators.Sessionize.cappedSessionStats(
          table(s, dir, "events"), "user_id", "ts", "event_id",
          gapNs = 43200000000000L, capNs = 86400000000000L)
        .orderBy("user_id"),
      Some(CappedSessionsOracle)),

    QueryDef("q318_dsv2_sink_roundtrip",
      "DSv2 write path: two-phase-commit sink round-trip preserves every value exactly",
      // the q303 read-connector's WRITE twin (graft.sources.NwbSink): the
      // whole events frame flows out through the DSv2 sink — task-staged
      // zstd parquet published only at job commit, _SUCCESS-marked — and
      // back in through the stock parquet reader; the per-type census
      // (counts, exact integer sums, ts extrema) then has to equal the
      // oracle's direct scan of the ORIGINAL table, certifying both commit
      // completeness (no lost/duplicated task output) and value fidelity
      // (int64/double/string survive the Group-API encoding bit-exact).
      (s, dir) => {
        val outP = java.nio.file.Files.createTempDirectory("q318_sink")
        graft.streaming.StreamingOps.deleteOnExit(outP)
        val out = outP.toString
        table(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), col("value"))
          .write.format("graft-nwb").mode("overwrite").save(out)
        s.read.parquet(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("user_id").as("sum_users"),
            sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sum_v_e6"),
            countDistinct("event_id").as("n_distinct_ids"),
            min("ts").as("min_ts"), max("ts").as("max_ts"))
          .orderBy("event_type")
      },
      Some("""|SELECT event_type, count(*) AS n,
              |  CAST(sum(user_id) AS BIGINT) AS sum_users,
              |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
              |    AS sum_v_e6,
              |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
              |  min(epoch_ns(ts)) AS min_ts, max(epoch_ns(ts)) AS max_ts
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q319_brand_modularity",
      "Newman modularity of the brand partition over the co-purchase graph, exact integer decomposition",
      // does co-purchasing concentrate within part brands? Graph
      // .attributeModularity decomposes Q = Σ_c (e_c/m − (d_c/2m)²) onto
      // the exact integer grid contrib_num = 4·m·e_c − d_c² (denominator
      // 4m²), so the per-brand rows AND the global Q they sum to are
      // engine-exact. One degree agg + two label joins + a broadcast
      // scalar — no iteration (the partition comes from the attribute,
      // not a community search).
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val edges = graft.operators.Graph.coOccurrenceEdges(
          li, "l_orderkey", "l_partkey")
        val labels = table(s, dir, "part")
          .select(col("p_partkey").as("v"), col("p_brand").as("community"))
        graft.operators.Graph.attributeModularity(edges, labels)
          .orderBy("community")
      },
      Some("""|WITH e AS (
              |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              |  FROM lineitem x JOIN lineitem y
              |    ON x.l_orderkey = y.l_orderkey
              |  WHERE x.l_partkey < y.l_partkey
              |), deg AS (
              |  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
              |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
              |  ) GROUP BY 1
              |), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
              |lab AS (
              |  SELECT CAST(p_partkey AS BIGINT) AS v, p_brand AS community
              |  FROM part
              |), nodes AS (
              |  SELECT l.community, count(*) AS n_nodes,
              |    CAST(sum(d.d) AS BIGINT) AS d_sum
              |  FROM deg d JOIN lab l ON l.v = d.v GROUP BY 1
              |), inn AS (
              |  SELECT la.community, CAST(count(*) AS BIGINT) AS e_in
              |  FROM e JOIN lab la ON la.v = e.a JOIN lab lb ON lb.v = e.b
              |  WHERE la.community = lb.community GROUP BY 1
              |)
              |SELECT n.community, n.n_nodes, n.d_sum,
              |  COALESCE(i.e_in, 0) AS e_in,
              |  4 * (SELECT m FROM m) * COALESCE(i.e_in, 0)
              |    - n.d_sum * n.d_sum AS contrib_num
              |FROM nodes n LEFT JOIN inn i USING (community)
              |ORDER BY community""".stripMargin)),

    QueryDef("q320_two_hop_features",
      "exact 2-hop neighborhood size per node (friend-of-friend reach) on the co-purchase graph",
      // the link-prediction / fraud-fan-out feature: nodes at distance
      // EXACTLY 2 (through a neighbor, not a neighbor, not self).
      // Graph.twoHopFeatures: one wedge self-join over the symmetric edge
      // list, distinct, anti-join the 1-hop set — exact tier (the sketch
      // tier for power-law hubs is q122's HLL idiom).
      (s, dir) => graft.operators.Graph.twoHopFeatures(
          graft.operators.Graph.coOccurrenceEdges(
            table(s, dir, "lineitem"), "l_orderkey", "l_partkey"))
        .orderBy("v"),
      Some("""|WITH e AS (
              |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              |  FROM lineitem x JOIN lineitem y
              |    ON x.l_orderkey = y.l_orderkey
              |  WHERE x.l_partkey < y.l_partkey
              |), sym AS (
              |  SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
              |), deg AS (
              |  SELECT a AS v, CAST(count(*) AS BIGINT) AS d
              |  FROM sym GROUP BY 1
              |), hops AS (
              |  SELECT DISTINCT s1.a AS src, s2.b AS dst
              |  FROM sym s1 JOIN sym s2 ON s2.a = s1.b
              |  WHERE s1.a <> s2.b
              |), two AS (
              |  SELECT h.src AS v, CAST(count(*) AS BIGINT) AS n_two_hop
              |  FROM hops h LEFT JOIN sym s ON s.a = h.src AND s.b = h.dst
              |  WHERE s.a IS NULL GROUP BY 1
              |)
              |SELECT d.v, d.d, COALESCE(t.n_two_hop, 0) AS n_two_hop
              |FROM deg d LEFT JOIN two t ON t.v = d.v
              |ORDER BY d.v""".stripMargin)),

    QueryDef("q321_golden_record",
      "golden-record survivorship: latest-wins, first-wins, and deterministic mode rules per customer",
      // the MDM merge step after entity resolution (q130/q283 find the
      // cluster; this picks the surviving attributes): latest_status =
      // most recent order's status (recency rule), first_price_cents = the
      // earliest order's price (provenance rule), modal_priority = most frequent
      // priority with ties broken lexicographically (consensus rule —
      // mode with a deterministic tie is the part stock aggregates don't
      // give you). Two rank windows share one o_custkey exchange; the
      // mode is a (key, value) count + rank, all map-side combined.
      (s, dir) => {
        val o = table(s, dir, "orders")
        val wLatest = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        val wFirst = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val ranked = o.select(col("o_custkey"), col("o_orderstatus"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_cents"),
          row_number().over(wLatest).as("rl"),
          row_number().over(wFirst).as("rf"))
        val latest = ranked.filter(col("rl") === 1)
          .select(col("o_custkey"), col("o_orderstatus").as("latest_status"))
        val first = ranked.filter(col("rf") === 1)
          .select(col("o_custkey"), col("price_cents").as("first_price_cents"))
        val modal = o.groupBy("o_custkey", "o_orderpriority")
          .agg(count(lit(1)).as("c"))
          .withColumn("r", row_number().over(Window.partitionBy("o_custkey")
            .orderBy(col("c").desc, col("o_orderpriority"))))
          .filter(col("r") === 1)
          .select(col("o_custkey"),
            col("o_orderpriority").as("modal_priority"),
            col("c").as("modal_count"))
        o.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
          .join(latest, "o_custkey").join(first, "o_custkey")
          .join(modal, "o_custkey")
          .orderBy("o_custkey")
      },
      Some("""|WITH latest AS (
              |  SELECT o_custkey, o_orderstatus AS latest_status FROM (
              |    SELECT o_custkey, o_orderstatus, row_number() OVER (
              |      PARTITION BY o_custkey
              |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS r
              |    FROM orders) WHERE r = 1
              |), fi AS (
              |  SELECT o_custkey, first_price_cents FROM (
              |    SELECT o_custkey,
              |      CAST(floor(o_totalprice * 100) AS BIGINT)
              |        AS first_price_cents,
              |      row_number() OVER (
              |      PARTITION BY o_custkey
              |      ORDER BY o_orderdate, o_orderkey) AS r
              |    FROM orders) WHERE r = 1
              |), modal AS (
              |  SELECT o_custkey, o_orderpriority AS modal_priority,
              |    c AS modal_count FROM (
              |    SELECT o_custkey, o_orderpriority,
              |      CAST(count(*) AS BIGINT) AS c,
              |      row_number() OVER (PARTITION BY o_custkey
              |        ORDER BY count(*) DESC, o_orderpriority) AS r
              |    FROM orders GROUP BY 1, 2) WHERE r = 1
              |), n AS (
              |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
              |)
              |SELECT n.o_custkey, n.n_orders, l.latest_status,
              |  f.first_price_cents, m.modal_priority, m.modal_count
              |FROM n JOIN latest l USING (o_custkey)
              |JOIN fi f USING (o_custkey)
              |JOIN modal m USING (o_custkey)
              |ORDER BY n.o_custkey""".stripMargin)),

    QueryDef("q322_bitemporal_snapshot",
      "bitemporal time travel: the same valid-time cut under three transaction-time horizons",
      // the warehouse-correction question SCD2 alone can't answer: \"what
      // did we BELIEVE at transaction time T about the state at valid
      // time V?\". Each event is a version with valid_ns = event time and
      // tx_ns = arrival (event time + a deterministic 0-6h ingest delay,
      // event_id % 7 hours). One valid cut V = corpus start + 20 days is
      // snapshotted under three tx horizons — T=V (no hindsight), V+1d,
      // and full hindsight — and the per-user current version is the
      // (valid_ns, event_id) max among rows with valid_ns <= V AND
      // tx_ns <= T. Late arrivals flip users between snapshots; the three
      // branches share one scan + one broadcast scalar frame, each cut is
      // a rank window Spark rewrites to WindowGroupLimit.
      (s, dir) => {
        val day = 86400000000000L
        val e = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("ts").cast("long").as("valid_ns"),
            (col("ts").cast("long") +
              (col("event_id") % 7) * lit(3600000000000L)).as("tx_ns"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
        val g = e.agg(min("valid_ns").as("gmin"), max("valid_ns").as("gmax"))
        val withG = e.crossJoin(broadcast(g))
          .withColumn("v_cut", col("gmin") + lit(20L * day))
        def snap(label: String, txCut: org.apache.spark.sql.Column) = {
          val w = Window.partitionBy("user_id")
            .orderBy(col("valid_ns").desc, col("event_id").desc)
          withG.filter(col("valid_ns") <= col("v_cut") &&
              col("tx_ns") <= txCut)
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1)
            .select(lit(label).as("snapshot"), col("user_id"),
              col("event_id"), col("valid_ns"), col("tx_ns"), col("vm"))
        }
        snap("t1_as_of_valid", col("v_cut"))
          .unionByName(snap("t2_plus_1d", col("v_cut") + lit(day)))
          .unionByName(snap("t3_full_hindsight",
            col("gmax") + lit(7L * 3600000000000L)))
          .orderBy("snapshot", "user_id")
      },
      Some("""|WITH e AS (
              |  SELECT user_id, event_id, epoch_ns(ts) AS valid_ns,
              |    epoch_ns(ts) + (event_id % 7) * 3600000000000
              |      AS tx_ns,
              |    CAST(floor(value * 1000) AS BIGINT) AS vm
              |  FROM events
              |), g AS (
              |  SELECT min(valid_ns) AS gmin, max(valid_ns) AS gmax FROM e
              |), cuts AS (
              |  SELECT 't1_as_of_valid' AS snapshot,
              |    gmin + 20 * 86400000000000 AS v_cut,
              |    gmin + 20 * 86400000000000 AS t_cut FROM g
              |  UNION ALL
              |  SELECT 't2_plus_1d',
              |    gmin + 20 * 86400000000000,
              |    gmin + 21 * 86400000000000 FROM g
              |  UNION ALL
              |  SELECT 't3_full_hindsight',
              |    gmin + 20 * 86400000000000,
              |    gmax + 7 * 3600000000000 FROM g
              |)
              |SELECT snapshot, user_id, event_id, valid_ns, tx_ns, vm
              |FROM (
              |  SELECT c.snapshot, e.user_id, e.event_id, e.valid_ns,
              |    e.tx_ns, e.vm,
              |    row_number() OVER (PARTITION BY c.snapshot, e.user_id
              |      ORDER BY e.valid_ns DESC, e.event_id DESC) AS rk
              |  FROM e JOIN cuts c
              |    ON e.valid_ns <= c.v_cut AND e.tx_ns <= c.t_cut
              |)
              |WHERE rk = 1 ORDER BY snapshot, user_id""".stripMargin)),

    QueryDef("q325_slo_burn_rate",
      "SLO error-budget burn-rate gate: slow (daily) and fast (worst-hour) burn vs the corpus budget",
      // the SRE multi-window alert discipline (Beyer et al., SRE workbook
      // ch. 5) as a batch gate: budget = the corpus-wide error rate (e6
      // grid), each day's slow burn is its daily error rate over budget
      // (pct, integer //), fast burn is its WORST HOUR's rate over budget
      // — a single bad hour trips the fast gate long before the daily
      // average moves. Hour and day frames are bounded aggregates off one
      // scan; the budget scalar rides a broadcast cross join. Alerts:
      // slow > 200 pct, fast > 1000 pct.
      (s, dir) => {
        val day = 86400000000000L
        val hour = 3600000000000L
        val e = table(s, dir, "events")
          .select(expr(s"ts div $day").as("day"),
            expr(s"ts div $hour").as("hr"),
            when(col("event_type") === "error", 1L).otherwise(0L).as("bad"))
        val budget = e.agg(
          expr("(sum(bad) * 1000000) div count(1)").as("budget_e6"))
        val hours = e.groupBy("day", "hr")
          .agg(count(lit(1)).as("n"), sum("bad").as("nb"))
          .withColumn("rate_e6", expr("(nb * 1000000) div n"))
          .groupBy("day").agg(max("rate_e6").as("worst_hour_rate_e6"))
        val days = e.groupBy("day")
          .agg(count(lit(1)).as("n_total"), sum("bad").as("n_errors"))
          .withColumn("day_rate_e6", expr("(n_errors * 1000000) div n_total"))
        days.join(hours, "day")
          .crossJoin(broadcast(budget))
          .withColumn("slow_burn_pct",
            expr("(day_rate_e6 * 100) div greatest(budget_e6, CAST(1 AS BIGINT))"))
          .withColumn("fast_burn_pct",
            expr("(worst_hour_rate_e6 * 100) div greatest(budget_e6, CAST(1 AS BIGINT))"))
          .select(col("day"), col("n_total"), col("n_errors"),
            col("slow_burn_pct"), col("fast_burn_pct"),
            (col("slow_burn_pct") > 200).cast("int").as("slow_alert"),
            (col("fast_burn_pct") > 1000).cast("int").as("fast_alert"))
          .orderBy("day")
      },
      Some("""|WITH e AS (
              |  SELECT epoch_ns(ts) // 86400000000000 AS day,
              |    epoch_ns(ts) // 3600000000000 AS hr,
              |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad
              |  FROM events
              |), budget AS (
              |  SELECT (CAST(sum(bad) AS BIGINT) * 1000000) // count(*)
              |    AS budget_e6 FROM e
              |), hours AS (
              |  SELECT day, CAST(max(rate_e6) AS BIGINT)
              |      AS worst_hour_rate_e6
              |  FROM (
              |    SELECT day, hr,
              |      (CAST(sum(bad) AS BIGINT) * 1000000) // count(*)
              |        AS rate_e6
              |    FROM e GROUP BY 1, 2
              |  ) GROUP BY 1
              |), days AS (
              |  SELECT day, count(*) AS n_total,
              |    CAST(sum(bad) AS BIGINT) AS n_errors,
              |    (CAST(sum(bad) AS BIGINT) * 1000000) // count(*)
              |      AS day_rate_e6
              |  FROM e GROUP BY 1
              |)
              |SELECT d.day, d.n_total, d.n_errors,
              |  (d.day_rate_e6 * 100) // greatest(b.budget_e6, 1)
              |    AS slow_burn_pct,
              |  (h.worst_hour_rate_e6 * 100) // greatest(b.budget_e6, 1)
              |    AS fast_burn_pct,
              |  CAST((d.day_rate_e6 * 100) // greatest(b.budget_e6, 1) > 200
              |    AS INT) AS slow_alert,
              |  CAST((h.worst_hour_rate_e6 * 100)
              |    // greatest(b.budget_e6, 1) > 1000 AS INT) AS fast_alert
              |FROM days d JOIN hours h USING (day) CROSS JOIN budget b
              |ORDER BY d.day""".stripMargin)),

    QueryDef("q326_dpp_partitioned_join",
      "dynamic partition pruning: day-partitioned fact x filtered day dim, runtime-pruned scan",
      // the scale mechanism that makes dim-filtered fact joins cheap on a
      // partitioned lake: the fact copy is WRITTEN partitioned by day,
      // the dim is the filtered day set (day % 7 = 3), and at execution
      // Spark turns the dim's build-side keys into a runtime partition
      // filter on the fact scan — only ~1/7 of the partitions are read
      // (plan-asserted in DppSpec: `dynamicpruningexpression` in
      // PartitionFilters). The oracle replays the join from the raw
      // table, certifying pruning loses nothing.
      (s, dir) => {
        val day = 86400000000000L
        val base = table(s, dir, "events")
          .select(expr(s"ts div $day").as("day"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
        val factP = java.nio.file.Files.createTempDirectory("q326_fact")
        graft.streaming.StreamingOps.deleteOnExit(factP)
        val factDir = factP.toString
        base.write.mode("overwrite").partitionBy("day").parquet(factDir)
        val dimP = java.nio.file.Files.createTempDirectory("q326_dim")
        graft.streaming.StreamingOps.deleteOnExit(dimP)
        val dimDir = dimP.toString
        base.select("day").distinct()
          .write.mode("overwrite").parquet(dimDir)
        val fact = s.read.parquet(factDir)
        // cast the DIM key to the fact's inferred partition type: a cast on
        // the fact side would mask the partition column and defeat DPP
        // the SELECTIVE dim filter must live in THIS plan (DPP derives the
        // runtime partition filter from the build side's filtered keys)
        val dim = s.read.parquet(dimDir)
          .filter(col("day") % 7 === 3)
          .select(col("day").cast(fact.schema("day").dataType).as("day"))
        fact.join(dim, "day")
          .groupBy("day")
          .agg(count(lit(1)).as("n"), sum("vm").as("vm_milli"))
          .select(col("day").cast("long").as("day"), col("n"),
            col("vm_milli"))
          .orderBy("day")
      },
      Some("""|WITH e AS (
              |  SELECT epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(floor(value * 1000) AS BIGINT) AS vm
              |  FROM events
              |), d AS (
              |  SELECT DISTINCT day FROM e WHERE day % 7 = 3
              |)
              |SELECT e.day, count(*) AS n,
              |  CAST(sum(e.vm) AS BIGINT) AS vm_milli
              |FROM e JOIN d ON d.day = e.day
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q327_fifo_allocation",
      "FIFO lot allocation via prefix sums: per-part consumed/partial/on-hand receipt census",
      // the inventory / cost-basis primitive, WITHOUT the sequential queue
      // a naive FIFO needs: with total issued T per part, receipt i
      // (ordered by ship date) is consumed exactly
      // clamp(T − cum_qty_before_i, 0, qty_i) — a closed form over ONE
      // running-sum window, so the allocation is a single per-part window
      // pass instead of a fold. Receipts = non-returned rows, issues =
      // 'R' returns; output per part counts fully/partially consumed lots
      // and the unconsumed on-hand quantity.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_shipdate"),
            expr("CAST(l_quantity AS BIGINT)").as("qty"))
        val issues = li.filter(col("l_returnflag") === "R")
          .groupBy("l_partkey").agg(sum("qty").as("qty_issued"))
        val w = Window.partitionBy("l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, -1)
        val receipts = li.filter(col("l_returnflag") =!= "R")
          .withColumn("cum_before", coalesce(sum("qty").over(w), lit(0L)))
        receipts.join(issues, Seq("l_partkey"), "left")
          .na.fill(0L, Seq("qty_issued"))
          .withColumn("consumed", greatest(lit(0L),
            least(col("qty"), col("qty_issued") - col("cum_before"))))
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n_receipts"),
            sum("qty").as("qty_received"),
            max("qty_issued").as("qty_issued"),
            sum(when(col("consumed") === col("qty"), 1L).otherwise(0L))
              .as("n_full"),
            sum(when(col("consumed") > 0 && col("consumed") < col("qty"), 1L)
              .otherwise(0L)).as("n_partial"),
            (sum("qty") - sum("consumed")).as("qty_on_hand"))
          .orderBy("l_partkey")
      },
      Some("""|WITH li AS (
              |  SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
              |    l_shipdate, CAST(l_quantity AS BIGINT) AS qty
              |  FROM lineitem
              |), iss AS (
              |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS qty_issued
              |  FROM li WHERE l_returnflag = 'R' GROUP BY 1
              |), rec AS (
              |  SELECT l_partkey, qty,
              |    COALESCE(CAST(sum(qty) OVER (PARTITION BY l_partkey
              |      ORDER BY l_shipdate, l_orderkey, l_linenumber
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      AS BIGINT), 0) AS cum_before
              |  FROM li WHERE l_returnflag <> 'R'
              |), alloc AS (
              |  SELECT r.l_partkey, r.qty,
              |    COALESCE(i.qty_issued, 0) AS qty_issued,
              |    greatest(0, least(r.qty,
              |      COALESCE(i.qty_issued, 0) - r.cum_before)) AS consumed
              |  FROM rec r LEFT JOIN iss i USING (l_partkey)
              |)
              |SELECT l_partkey, count(*) AS n_receipts,
              |  CAST(sum(qty) AS BIGINT) AS qty_received,
              |  CAST(max(qty_issued) AS BIGINT) AS qty_issued,
              |  CAST(sum(CASE WHEN consumed = qty THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_full,
              |  CAST(sum(CASE WHEN consumed > 0 AND consumed < qty
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
              |  CAST(sum(qty) - sum(consumed) AS BIGINT) AS qty_on_hand
              |FROM alloc GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q328_lsh_planner",
      "MinHash-LSH S-curve planner: collision probability per Jaccard level for the q42 (8x4) config",
      // the design table behind the q42 banding choice: with b=8 bands of
      // r=4 rows, P(candidate | jaccard s) = 1 − (1 − s⁴)⁸. Every power
      // is an EXPLICIT left-associated multiply chain — IEEE multiply and
      // subtract are correctly rounded, so both engines walk identical
      // doubles (a pow() call would hand the result to two different
      // libms). 19 rows, no table scan — the planner is pure math the
      // engine serves next to the operator it parameterizes.
      (s, dir) => s.range(1, 20)
        .select((col("id") * 5).cast("long").as("s_e2"))
        .withColumn("sv", expr("CAST(s_e2 AS DOUBLE) / 100.0D"))
        .withColumn("s4", expr("sv * sv * sv * sv"))
        .withColumn("qv", expr("1.0D - s4"))
        .withColumn("p", expr("1.0D - qv*qv*qv*qv*qv*qv*qv*qv"))
        .select(col("s_e2"), round(col("p"), 6).as("p_collision"),
          (col("p") >= 0.5).cast("int").as("selected"))
        .orderBy("s_e2"),
      Some("""|WITH g AS (
              |  SELECT unnest(generate_series(1, 19)) * 5 AS s_e2
              |), c AS (
              |  SELECT CAST(s_e2 AS BIGINT) AS s_e2,
              |    CAST(s_e2 AS DOUBLE) / 100.0 AS sv
              |  FROM g
              |), d AS (SELECT s_e2, sv*sv*sv*sv AS s4 FROM c),
              |e AS (SELECT s_e2, 1.0 - s4 AS qv FROM d)
              |SELECT s_e2,
              |  round(1.0 - qv*qv*qv*qv*qv*qv*qv*qv, 6) AS p_collision,
              |  CAST(1.0 - qv*qv*qv*qv*qv*qv*qv*qv >= 0.5 AS INT)
              |    AS selected
              |FROM e ORDER BY s_e2""".stripMargin)),

    QueryDef("q329_supply_share_gate",
      "suppliers whose red-part quantity share beats a threshold (the TPC-H Q20 nested-IN shape)",
      // Q20's optimizer stress adapted to this schema: the nested
      // IN(parts) + correlated quantity comparison decorrelates into two
      // aggregates over ONE lineitem scan-shape — a left-semi against the
      // red part keys feeding the numerator aggregate, the plain total as
      // the denominator, and the correlated \"more than 13% of my own
      // total\" gate becomes an integer cross-column filter on the joined
      // per-supplier frame. No per-row subqueries survive.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_partkey"),
            expr("CAST(l_quantity AS BIGINT)").as("qty"))
        val redParts = table(s, dir, "part")
          .filter(col("p_name").like("%red%")).select("p_partkey")
        val green = li.join(redParts,
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_suppkey").agg(sum("qty").as("qty_red"))
        val total = li.groupBy("l_suppkey").agg(sum("qty").as("qty_total"))
        green.join(total, "l_suppkey")
          .filter(col("qty_red") * 100 > col("qty_total") * 13)
          .join(table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("qty_red"),
            col("qty_total"),
            expr("(qty_red * 1000000) div qty_total").as("share_e6"))
          .orderBy("s_suppkey")
      },
      Some("""|WITH li AS (
              |  SELECT l_suppkey, l_partkey,
              |    CAST(l_quantity AS BIGINT) AS qty
              |  FROM lineitem
              |), g AS (
              |  SELECT l_suppkey, CAST(sum(qty) AS BIGINT) AS qty_red
              |  FROM li
              |  WHERE l_partkey IN (
              |    SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
              |  GROUP BY 1
              |), t AS (
              |  SELECT l_suppkey, CAST(sum(qty) AS BIGINT) AS qty_total
              |  FROM li GROUP BY 1
              |)
              |SELECT s.s_suppkey, s.s_name, g.qty_red, t.qty_total,
              |  (g.qty_red * 1000000) // t.qty_total AS share_e6
              |FROM supplier s
              |JOIN g ON g.l_suppkey = s.s_suppkey
              |JOIN t ON t.l_suppkey = s.s_suppkey
              |WHERE g.qty_red * 100 > t.qty_total * 13
              |ORDER BY s.s_suppkey""".stripMargin)),

    QueryDef("q331_schema_evolution",
      "schema-evolution read: mergeSchema unifies an old batch (no vm) with a new batch (vm added)",
      // the lake reality a fixed-schema reader breaks on: month 1 was
      // written WITHOUT the vm column, month 2 WITH it. The mergeSchema
      // read unifies the footer schemas at planning time and null-fills
      // the missing column for old files — certified by a per-batch
      // census where the old batch must show n_with_vm = 0 and the new
      // batch full coverage, against an oracle that replays the same
      // column-availability split from the raw table. Schema merge is a
      // footer-only operation: no data rewrite, old files stay valid.
      (s, dir) => {
        val day = 86400000000000L
        val base = table(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            expr(s"ts div $day").as("day"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
        val cut = 15L
        val rootP = java.nio.file.Files.createTempDirectory("q331_evo")
        graft.streaming.StreamingOps.deleteOnExit(rootP)
        val root = rootP.toString
        val g = base.agg(min("day").as("d0")).head().getLong(0)
        base.filter(col("day") - g < cut)
          .select("event_id", "user_id", "day")
          .write.mode("overwrite").parquet(s"$root/batch=old")
        base.filter(col("day") - g >= cut)
          .write.mode("overwrite").parquet(s"$root/batch=new")
        s.read.option("mergeSchema", "true").parquet(root)
          .groupBy("batch")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("vm").isNotNull.cast("long")).as("n_with_vm"),
            coalesce(sum("vm"), lit(0L)).as("vm_sum"))
          .orderBy("batch")
      },
      Some("""|WITH e AS (
              |  SELECT epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(floor(value * 1000) AS BIGINT) AS vm
              |  FROM events
              |), g AS (SELECT min(day) AS d0 FROM e),
              |tagged AS (
              |  SELECT CASE WHEN day - (SELECT d0 FROM g) < 15
              |    THEN 'old' ELSE 'new' END AS batch, vm
              |  FROM e
              |)
              |SELECT batch, count(*) AS n_rows,
              |  CAST(sum(CASE WHEN batch = 'new' AND vm IS NOT NULL
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_vm,
              |  CAST(COALESCE(sum(CASE WHEN batch = 'new' THEN vm END), 0)
              |    AS BIGINT) AS vm_sum
              |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q332_isotonic_fit",
      "isotonic (nondecreasing) regression of daily means per type via the exact minimax formula",
      // monotone calibration without PAVA's sequential pooling: the L2
      // isotonic fit has the closed form fitted_i = max_{j<=i} min_{k>=i}
      // avg(y[j..k]) — over the BOUNDED per-type daily frame (n ≈ 30) the
      // n² interval averages come from one prefix-sum window and a rank
      // self-join, the inner min is a suffix-min window per (type, j),
      // and the outer max is a plain aggregate. Raw events shrink to the
      // daily frame FIRST, so the quadratic piece never touches corpus
      // rows. Integer e3 grid, truncating div identical in both engines.
      (s, dir) => {
        val day = 86400000000000L
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"), expr(s"ts div $day").as("day"))
          .agg(expr("sum(CAST(floor(value * 1000) AS BIGINT)) div count(1)")
            .as("y_e3"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val idx = daily.withColumn("rn", row_number().over(w))
          .withColumn("s", sum("y_e3").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        val jf = idx.select(col("event_type"), col("rn").as("jn"),
          (col("s") - col("y_e3")).as("s_before"))
        val kf = idx.select(col("event_type").as("et2"), col("rn").as("kn"),
          col("s").as("s_k"))
        val pairs = jf.join(kf,
            col("event_type") === col("et2") && col("jn") <= col("kn"))
          .select(col("event_type"), col("jn"), col("kn"),
            expr("(s_k - s_before) div (kn - jn + 1)").as("avg_e3"))
        val wSuf = Window.partitionBy("event_type", "jn").orderBy("kn")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val fitted = pairs.withColumn("m", min("avg_e3").over(wSuf))
          .groupBy(col("event_type"), col("kn").as("rn"))
          .agg(max("m").as("fitted_e3"))
        idx.select("event_type", "day", "rn", "y_e3")
          .join(fitted, Seq("event_type", "rn"))
          .select("event_type", "day", "y_e3", "fitted_e3")
          .orderBy("event_type", "day")
      },
      Some("""|WITH daily AS (
              |  SELECT event_type,
              |    epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
              |      // count(*) AS y_e3
              |  FROM events GROUP BY 1, 2
              |), idx AS (
              |  SELECT event_type, day, y_e3,
              |    row_number() OVER (PARTITION BY event_type ORDER BY day)
              |      AS rn,
              |    CAST(sum(y_e3) OVER (PARTITION BY event_type
              |      ORDER BY day) AS BIGINT) AS s
              |  FROM daily
              |), pairs AS (
              |  SELECT jx.event_type, jx.rn AS jn, kx.rn AS kn,
              |    (kx.s - (jx.s - jx.y_e3)) // (kx.rn - jx.rn + 1)
              |      AS avg_e3
              |  FROM idx jx JOIN idx kx
              |    ON kx.event_type = jx.event_type AND jx.rn <= kx.rn
              |), msuf AS (
              |  SELECT event_type, jn, kn,
              |    min(avg_e3) OVER (PARTITION BY event_type, jn
              |      ORDER BY kn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              |      AS m
              |  FROM pairs
              |), fitted AS (
              |  SELECT event_type, kn AS rn, CAST(max(m) AS BIGINT)
              |      AS fitted_e3
              |  FROM msuf GROUP BY 1, 2
              |)
              |SELECT i.event_type, i.day, i.y_e3, f.fitted_e3
              |FROM idx i JOIN fitted f
              |  ON f.event_type = i.event_type AND f.rn = i.rn
              |ORDER BY i.event_type, i.day""".stripMargin)),

    QueryDef("q336_personalized_pagerank",
      "personalized PageRank toward the Brand#13 seed set on the co-purchase graph, exact integer grid",
      // q144's proximity-flavored sibling (Graph.personalizedPageRankScaled):
      // the 15% teleport returns ONLY to the Brand#13 parts, so ranks
      // measure closeness to that brand — the \"related items\" primitive.
      // Same one-join-one-agg iteration shape on the same integer grid;
      // the oracle unrolls all 4 iterations with the per-seed teleport
      // CASE, so every rank (including exact 0 for unreachable nodes) is
      // engine-exact.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val seeds = table(s, dir, "part")
          .filter(col("p_brand") === "Brand#13")
          .select(col("p_partkey").as("v"))
        graft.operators.Graph.personalizedPageRankScaled(
            graft.operators.Graph.coOccurrenceEdges(
              li, "l_orderkey", "l_partkey"),
            seeds, iters = 4, scale = PprScale)
          .orderBy("v")
      },
      Some(s"""|WITH e AS (
              |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              |  FROM lineitem x JOIN lineitem y
              |    ON x.l_orderkey = y.l_orderkey
              |  WHERE x.l_partkey < y.l_partkey
              |), dirE AS (
              |  SELECT a AS src, b AS dst FROM e
              |  UNION ALL SELECT b AS src, a AS dst FROM e
              |), deg AS (
              |  SELECT src, count(*) AS deg FROM dirE GROUP BY 1
              |), nodes AS (SELECT src AS v FROM deg),
              |sd AS (
              |  SELECT DISTINCT CAST(p_partkey AS BIGINT) AS v FROM part
              |  WHERE p_brand = 'Brand#13'
              |    AND p_partkey IN (SELECT v FROM nodes)
              |), ns AS (SELECT count(*) AS n FROM sd),
              |r0 AS (
              |  SELECT n.v, CASE WHEN s.v IS NOT NULL
              |    THEN $PprScale // ns.n ELSE 0 END AS r
              |  FROM nodes n LEFT JOIN sd s ON s.v = n.v CROSS JOIN ns
              |),
              |${(1 to 4).map(pprIterSql).mkString(",\n")}
              |SELECT v, CAST(r AS BIGINT) AS pprank_scaled
              |FROM r4 ORDER BY v""".stripMargin)),

    QueryDef("q339_hits_bipartite",
      "HITS hubs & authorities on the customer-part purchase bipartite graph, integer max-rescaled rounds",
      // the OTHER classic link-analysis fixpoint: authorities (parts that
      // prolific buyers buy) and hubs (buyers of authoritative parts)
      // reinforce each other. Each round is two bounded passes over the
      // bipartite edge list — a sum aggregate then a 1-row max-rescale
      // onto the e6 integer grid (the normalization HITS needs, made
      // engine-exact by integer div instead of an L2 norm) — and the
      // oracle unrolls all 3 rounds. Edges ride one shuffle per pass.
      (s, dir) => {
        val edges = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
          .distinct()
        // TWO pinned copies of the bipartite edge list, one partitioned+
        // sorted per half-round join key (Graph.pinByKey): the u-keyed and
        // p-keyed joins each reuse their copy's layout, so the edges never
        // re-shuffle inside the rounds — 6 per-round edge exchanges traded
        // for 1 extra one-time exchange at build. r19: the pins are SIZED
        // from the counted edge list (persist before counting, the
        // boundedSssp idiom), so every per-round stage runs over
        // right-sized partitions instead of 32 near-empty ones.
        val edgesP = edges.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nE = edgesP.count()
        val beU = graft.operators.Graph.pinByKey(edgesP, "u", nE)
        val beP = graft.operators.Graph.pinByKey(beU, "p", nE)
        edgesP.unpersist(blocking = false)
        import graft.operators.Checkpoints.Pinnable
        var h = beU.select(col("u")).distinct()
          .withColumn("s", lit(HitsScale))
        var a: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to 3) {
          val ar = beU.join(h, "u").groupBy("p").agg(sum("s").as("raw"))
          val am = ar.agg(max("raw").as("mx"))
          a = ar.crossJoin(broadcast(am))
            .select(col("p"), expr(s"(raw * $HitsScale) div mx").as("s"))
            .pin
          val hr = beP.join(a, "p").groupBy("u").agg(sum("s").as("raw"))
          val hm = hr.agg(max("raw").as("mx"))
          h = hr.crossJoin(broadcast(hm))
            .select(col("u"), expr(s"(raw * $HitsScale) div mx").as("s"))
            .pin
        }
        a.select(lit("authority").as("kind"), col("p").as("id"),
            col("s").as("score_e6"))
          .unionByName(h.select(lit("hub").as("kind"), col("u").as("id"),
            col("s").as("score_e6")))
          .orderBy("kind", "id")
      },
      Some(s"""|WITH be AS (
              |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
              |  FROM orders o JOIN lineitem l
              |    ON l.l_orderkey = o.o_orderkey
              |), h0 AS (
              |  SELECT DISTINCT u, CAST($HitsScale AS BIGINT) AS s FROM be
              |),
              |${(1 to 3).map(hitsRoundSql).mkString(",\n")}
              |SELECT 'authority' AS kind, p AS id, s AS score_e6 FROM a3
              |UNION ALL
              |SELECT 'hub', u, s FROM h3
              |ORDER BY kind, id""".stripMargin)),

    QueryDef("q348_dq_expectations",
      "declarative data-quality expectation suite: one conditional-aggregate " +
        "pass compiles the whole rule list (completeness, set/range/shape " +
        "conformance, uniqueness) into exact-integer verdicts",
      // Expectations.verify: row-local rules ride ONE scan's map-side
      // conditional sums; each Unique rule adds one hash aggregate on its
      // column. Verdicts are the integer compare num*1e6 >= thr*den — no
      // float ratio crosses the engine boundary. value_under_50 is the
      // planted FAILING rule (the suite must exercise the false branch);
      // unique_user_id exercises a fractional uniqueness metric.
      (s, dir) => graft.operators.Expectations.verify(
        table(s, dir, "events"),
        Seq(
          graft.operators.Expectations.Complete(
            "complete_event_type", "event_type", 1000000L),
          graft.operators.Expectations.Complete(
            "complete_value", "value", 1000000L),
          graft.operators.Expectations.Satisfies(
            "props_shape", "props LIKE '{\"k\": %}'", 1000000L),
          graft.operators.Expectations.Satisfies(
            "type_in_set",
            "event_type IN ('click','view','purchase','signup','error')",
            1000000L),
          graft.operators.Expectations.Satisfies(
            "value_in_range", "value >= 0.0 AND value <= 1000.0", 990000L),
          graft.operators.Expectations.Satisfies(
            "value_under_50", "value <= 50.0", 990000L),
          graft.operators.Expectations.Unique(
            "unique_event_id", "event_id", 1000000L),
          graft.operators.Expectations.Unique(
            "unique_user_id", "user_id", 10000L))),
      Some("""|WITH c AS (
              |  SELECT CAST(count(*) AS BIGINT) AS d,
              |    CAST(count(*) FILTER (WHERE event_type IS NOT NULL) AS BIGINT) AS complete_event_type,
              |    CAST(count(*) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS complete_value,
              |    CAST(count(*) FILTER (WHERE props LIKE '{"k": %}') AS BIGINT) AS props_shape,
              |    CAST(count(*) FILTER (WHERE event_type IN ('click','view','purchase','signup','error')) AS BIGINT) AS type_in_set,
              |    CAST(count(*) FILTER (WHERE value >= 0.0 AND value <= 1000.0) AS BIGINT) AS value_in_range,
              |    CAST(count(*) FILTER (WHERE value <= 50.0) AS BIGINT) AS value_under_50
              |  FROM events
              |), u1 AS (
              |  SELECT CAST(count(*) FILTER (WHERE c2 = 1) AS BIGINT) AS nu,
              |         CAST(coalesce(sum(c2), 0) AS BIGINT) AS du
              |  FROM (SELECT count(*) AS c2 FROM events GROUP BY event_id) t
              |), u2 AS (
              |  SELECT CAST(count(*) FILTER (WHERE c2 = 1) AS BIGINT) AS nu,
              |         CAST(coalesce(sum(c2), 0) AS BIGINT) AS du
              |  FROM (SELECT count(*) AS c2 FROM events GROUP BY user_id) t
              |), m AS (
              |  SELECT 'complete_event_type' AS rule, complete_event_type AS metric_num, d AS metric_den, CAST(1000000 AS BIGINT) AS min_ratio_e6 FROM c
              |  UNION ALL SELECT 'complete_value', complete_value, d, CAST(1000000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'props_shape', props_shape, d, CAST(1000000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'type_in_set', type_in_set, d, CAST(1000000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'value_in_range', value_in_range, d, CAST(990000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'value_under_50', value_under_50, d, CAST(990000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'unique_event_id', nu, du, CAST(1000000 AS BIGINT) FROM u1
              |  UNION ALL SELECT 'unique_user_id', nu, du, CAST(10000 AS BIGINT) FROM u2
              |)
              |SELECT rule, metric_num, metric_den, min_ratio_e6,
              |  metric_num * 1000000 >= min_ratio_e6 * metric_den AS pass
              |FROM m ORDER BY rule""".stripMargin)),

    QueryDef("q349_fellegi_sunter_em",
      "Fellegi-Sunter record linkage: unsupervised EM over the blocked " +
        "comparison-pattern census (fixed-round, exact e6 integer grids)",
      // The published probabilistic-linkage model (Fellegi & Sunter 1969;
      // the Splink/RecordLinkage core): a deterministic 30% of customers
      // gets a perturbed duplicate (name kept 80%, balance jittered +-$50,
      // segment kept 90% — md5-threshold draws), candidate pairs come from
      // (nation x $1000-balance-band) blocks, and EM estimates p/m_k/u_k
      // from the 2^3 agreement-pattern census alone — no labels. The EM
      // runs over the CENSUS (8 rows), not the pairs: at 100 TB the only
      // corpus-sized work is one blocked self-join collapsing map-side to
      // the pattern histogram. Cross-engine exactness: every E-step weight
      // is floored onto the e6 grid before the (order-free, integer) sums,
      // every M-step ratio is an integer division, and BOTH engines run
      // the same generated SQL text (dialect div/materialization only).
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        table(s, dir, "customer").createOrReplaceTempView("fs_customer")
        val cens = s.sql("WITH " + fsCensusCtes("fs_customer", spark = true) +
          " SELECT g1, g2, g3, n FROM cens").pin
        cens.createOrReplaceTempView("fs_cens")
        s.sql("WITH cens AS (SELECT * FROM fs_cens),\n" + FsR0 + ",\n" +
          fsTail(spark = true, rounds = 6))
      },
      Some("WITH " + fsCensusCtes("customer", spark = false) + ",\n" +
        FsR0 + ",\n" + fsTail(spark = false, rounds = 6))),

    QueryDef("q351_agg_pushdown_audit",
      "DSv2 aggregate pushdown: per-channel count/min/max over ~1e9 virtual " +
        "synthetic rows answered closed-form at the scan, rolled up above",
      // SupportsPushDownAggregates on graft-synthetic: the grouped
      // count/min/max over the (channel, t) lattice is COMPLETELY pushed —
      // the scan emits 64 constant rows and never generates a trace sample,
      // so a 10^9-virtual-row aggregate costs the same as a 10^2 one (the
      // plan-level no-Aggregate assertion lives in SyntheticSourceSpec).
      // The modulo roll-up above it runs in Spark over the 64 pushed rows,
      // certifying the pushed schema composes with normal planning. The
      // oracle computes the same lattice arithmetic from generate_series.
      (s, dir) => {
        val src = s.read.format("graft.sources.SyntheticSource")
          .option("nchannels", 96).option("ntime", 10000000)
          .option("seed", 5).option("channelsPerPartition", 4).load()
        src.filter(col("channel") >= 16 && col("channel") < 80)
          .groupBy("channel")
          .agg(count(lit(1)).as("n"), min("t").as("lo"), max("t").as("hi"))
          // the HAVING-shaped no-op filter makes the pushed aggregate's
          // output load-bearing for EVERY consumer: under the bench
          // harness's count(), the optimizer would otherwise prune both
          // aggregates into a distinct on (channel % 8) — an expression
          // group-by the source can't answer — and walk the full lattice
          .filter(col("n") === 10000000L)
          .groupBy((col("channel") % 8).as("grp"))
          .agg(count(lit(1)).as("n_channels"),
            sum(col("n")).cast("long").as("samples"),
            min("lo").as("min_t"), max("hi").as("max_t"))
          .orderBy("grp")
      },
      Some("""|WITH ch AS (
              |  SELECT CAST(c AS INT) AS channel
              |  FROM (SELECT unnest(generate_series(16, 79)) AS c)
              |), per AS (
              |  SELECT channel, CAST(10000000 AS BIGINT) AS n,
              |    CAST(0 AS INT) AS lo, CAST(9999999 AS INT) AS hi
              |  FROM ch
              |)
              |SELECT channel % 8 AS grp, CAST(count(*) AS BIGINT) AS n_channels,
              |  CAST(sum(n) AS BIGINT) AS samples,
              |  min(lo) AS min_t, max(hi) AS max_t
              |FROM per GROUP BY 1 ORDER BY grp""".stripMargin)),

    QueryDef("q355_randomized_response",
      "local-DP randomized response (Warner 1965, categorical variant): " +
        "md5-coin perturbation + exact integer debiasing per event type",
      // completes the privacy family's LOCAL side (q268 is central DP):
      // each row reports its true type w.p. 3/4, else a uniform of the 5
      // types — both draws are md5-threshold coins, so the perturbed
      // release is reproducible in any engine. With report-truth prob
      // 3/4 + 1/20 = 4/5 and cross-type prob 1/20, E[o_t] =
      // (15 n_t + n)/20, so 15*estimate = 20*o_t - n stays integer-exact
      // (no float division crosses the engine boundary); err_x15 audits
      // the debiasing against the true counts. One scan, two tiny aggs.
      (s, dir) => {
        table(s, dir, "events").createOrReplaceTempView("rr_events")
        s.sql(rrSql(spark = true))
      },
      Some(rrSql(spark = false))),

    QueryDef("q359_observed_expectations",
      "observed data-quality expectations: the suite's metrics ride the " +
        "pipeline's OWN action (df.observe) — zero extra scans — and the " +
        "rendered report must equal q348's offline verdicts",
      // the production deployment shape of q348: a pipeline writes (here:
      // one count() stands in for the write), the row-local rules ride the
      // same pass as an Observation, and the report renders afterward from
      // the collected metric map. The oracle is the scan-based census — so
      // the driver certifies that the zero-extra-scan path computes the
      // SAME verdicts the offline suite does.
      (s, dir) => {
        val (instrumented, obs) = graft.operators.Expectations.observed(
          table(s, dir, "events"), Q359Rules)
        instrumented.count() // the pipeline's action; metrics materialize here
        graft.operators.Expectations.report(s, obs, Q359Rules)
      },
      Some("""|WITH c AS (
              |  SELECT CAST(count(*) AS BIGINT) AS d,
              |    CAST(count(*) FILTER (WHERE event_type IS NOT NULL) AS BIGINT) AS complete_event_type,
              |    CAST(count(*) FILTER (WHERE props LIKE '{"k": %}') AS BIGINT) AS props_shape,
              |    CAST(count(*) FILTER (WHERE event_type IN ('click','view','purchase','signup','error')) AS BIGINT) AS type_in_set,
              |    CAST(count(*) FILTER (WHERE value >= 0.0 AND value <= 1000.0) AS BIGINT) AS value_in_range,
              |    CAST(count(*) FILTER (WHERE value <= 50.0) AS BIGINT) AS value_under_50
              |  FROM events
              |), m AS (
              |  SELECT 'complete_event_type' AS rule, complete_event_type AS metric_num, d AS metric_den, CAST(1000000 AS BIGINT) AS min_ratio_e6 FROM c
              |  UNION ALL SELECT 'props_shape', props_shape, d, CAST(1000000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'type_in_set', type_in_set, d, CAST(1000000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'value_in_range', value_in_range, d, CAST(990000 AS BIGINT) FROM c
              |  UNION ALL SELECT 'value_under_50', value_under_50, d, CAST(990000 AS BIGINT) FROM c
              |)
              |SELECT rule, metric_num, metric_den, min_ratio_e6,
              |  metric_num * 1000000 >= min_ratio_e6 * metric_den AS pass
              |FROM m ORDER BY rule""".stripMargin))
  )

  private val Q359Rules = Seq(
    graft.operators.Expectations.Complete(
      "complete_event_type", "event_type", 1000000L),
    graft.operators.Expectations.Satisfies(
      "props_shape", "props LIKE '{\"k\": %}'", 1000000L),
    graft.operators.Expectations.Satisfies(
      "type_in_set",
      "event_type IN ('click','view','purchase','signup','error')",
      1000000L),
    graft.operators.Expectations.Satisfies(
      "value_in_range", "value >= 0.0 AND value <= 1000.0", 990000L),
    graft.operators.Expectations.Satisfies(
      "value_under_50", "value <= 50.0", 990000L))

  /** q355's shared SQL (dialect only in the md5 draw): the perturbation,
    * census, and exact-rational debias. */
  private def rrSql(spark: Boolean): String = {
    val keep = u60("concat(CAST(event_id AS STRING), ':rr_keep')", spark)
    val pick = u60("concat(CAST(event_id AS STRING), ':rr_pick')", spark)
    val tbl = if (spark) "rr_events" else "events"
    s"""WITH flips AS (
       |  SELECT event_type AS true_t,
       |    CASE WHEN $keep < 864691128455135232 THEN event_type
       |         ELSE CASE ($pick % 5)
       |           WHEN 0 THEN 'click' WHEN 1 THEN 'error'
       |           WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
       |           ELSE 'view' END
       |    END AS rep_t
       |  FROM $tbl
       |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM $tbl),
       |rep AS (
       |  SELECT rep_t, CAST(count(*) AS BIGINT) AS n_reported
       |  FROM flips GROUP BY rep_t
       |), tru AS (
       |  SELECT true_t, CAST(count(*) AS BIGINT) AS n_true
       |  FROM flips GROUP BY true_t
       |)
       |SELECT t.true_t AS event_type, t.n_true, r.n_reported,
       |  20 * r.n_reported - tot.n AS est_x15,
       |  20 * r.n_reported - tot.n - 15 * t.n_true AS err_x15
       |FROM tru t JOIN rep r ON r.rep_t = t.true_t CROSS JOIN tot
       |ORDER BY event_type""".stripMargin
  }

  /** q349 fixture + comparison-vector census CTEs, dialect-substituted.
    * Blocks are strictly positive before the integer division so Spark's
    * truncating `div` and DuckDB's flooring `//` agree. */
  private def fsCensusCtes(tbl: String, spark: Boolean): String = {
    val pick = u60("concat(CAST(orid AS STRING), ':fs_pick')", spark)
    val nameU = u60("concat(CAST(orid AS STRING), ':fs_name')", spark)
    val balU = u60("concat(CAST(orid AS STRING), ':fs_bal')", spark)
    val segU = u60("concat(CAST(orid AS STRING), ':fs_seg')", spark)
    val div = if (spark) "div" else "//"
    val mat = if (spark) "" else "MATERIALIZED "
    s"""base AS (
       |  SELECT c_custkey AS rid, c_name AS name,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
       |    c_mktsegment AS seg, c_nationkey AS nat
       |  FROM $tbl
       |), dup AS (
       |  SELECT orid + 10000000 AS rid,
       |    CASE WHEN $nameU < 922337203685477580 THEN name
       |         ELSE name || '~' END AS name,
       |    cents + ($balU % 10001) - 5000 AS cents,
       |    CASE WHEN $segU < 1037629354146162278 THEN seg
       |         ELSE 'PERTURBED' END AS seg,
       |    nat
       |  FROM (SELECT rid AS orid, name, cents, seg, nat FROM base) b
       |  WHERE $pick < 345876451382054092
       |), uni AS (
       |  SELECT rid, name, cents, seg,
       |    nat * 1000 + ((cents + 200000) $div 100000) AS blk
       |  FROM (SELECT * FROM base UNION ALL SELECT * FROM dup) u
       |), cens AS $mat(
       |  SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS g1,
       |      CASE WHEN abs(a.cents - b.cents) <= 5000 THEN 1 ELSE 0 END AS g2,
       |      CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g3
       |    FROM uni a JOIN uni b ON a.blk = b.blk AND a.rid < b.rid
       |  ) g GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  /** q349 EM start point: p=0.1, m_k=0.9, u_k=0.1 on the e6 grid. */
  private def FsR0: String =
    "r0 AS (SELECT CAST(100000 AS BIGINT) AS p_e6, " +
      "CAST(900000 AS BIGINT) AS m1_e6, CAST(900000 AS BIGINT) AS m2_e6, " +
      "CAST(900000 AS BIGINT) AS m3_e6, CAST(100000 AS BIGINT) AS u1_e6, " +
      "CAST(100000 AS BIGINT) AS u2_e6, CAST(100000 AS BIGINT) AS u3_e6)"

  /** One q349 EM round: E-step posteriors floored onto the e6 grid, M-step
    * as integer divisions over order-free BIGINT sums (CAST before the
    * multiply keeps DuckDB's HUGEINT out of the result). Long range holds
    * to ~9e12 pattern-weighted rows; beyond that the sums move to DECIMAL. */
  private def fsEmRound(k: Int, spark: Boolean): String = {
    val div = if (spark) "div" else "//"
    def par(c: String) = s"CAST(r.${c}_e6 AS DOUBLE) / 1000000.0"
    def lik(m: Boolean) = (1 to 3).map { i =>
      val c = if (m) s"m$i" else s"u$i"
      s"(CASE WHEN c.g$i = 1 THEN ${par(c)} ELSE 1.0 - ${par(c)} END)"
    }.mkString(" * ")
    s"""e$k AS (
       |  SELECT c.g1, c.g2, c.g3, c.n,
       |    (${par("p")}) * ${lik(true)} AS lm,
       |    (1.0 - ${par("p")}) * ${lik(false)} AS lu
       |  FROM cens c CROSS JOIN r${k - 1} r
       |), w$k AS (
       |  SELECT g1, g2, g3, n,
       |    CAST(floor(lm / (lm + lu) * 1000000.0) AS BIGINT) AS w_e6
       |  FROM e$k
       |), r$k AS (
       |  SELECT CAST(sum(n * w_e6) AS BIGINT) $div CAST(sum(n) AS BIGINT) AS p_e6,
       |    (CAST(sum(n * w_e6 * g1) AS BIGINT) * 1000000) $div CAST(sum(n * w_e6) AS BIGINT) AS m1_e6,
       |    (CAST(sum(n * w_e6 * g2) AS BIGINT) * 1000000) $div CAST(sum(n * w_e6) AS BIGINT) AS m2_e6,
       |    (CAST(sum(n * w_e6 * g3) AS BIGINT) * 1000000) $div CAST(sum(n * w_e6) AS BIGINT) AS m3_e6,
       |    (CAST(sum(n * (1000000 - w_e6) * g1) AS BIGINT) * 1000000) $div CAST(sum(n * (1000000 - w_e6)) AS BIGINT) AS u1_e6,
       |    (CAST(sum(n * (1000000 - w_e6) * g2) AS BIGINT) * 1000000) $div CAST(sum(n * (1000000 - w_e6)) AS BIGINT) AS u2_e6,
       |    (CAST(sum(n * (1000000 - w_e6) * g3) AS BIGINT) * 1000000) $div CAST(sum(n * (1000000 - w_e6)) AS BIGINT) AS u3_e6
       |  FROM w$k
       |)""".stripMargin
  }

  /** q349 unrolled EM rounds + the report: one row per agreement pattern
    * with its final match posterior, plus the seven fitted parameters. */
  private def fsTail(spark: Boolean, rounds: Int): String = {
    val iters = (1 to rounds).map(k => fsEmRound(k, spark)).mkString(",\n")
    val params = Seq("p", "m1", "m2", "m3", "u1", "u2", "u3").map { c =>
      s"UNION ALL SELECT '$c', CAST(-1 AS INT), CAST(-1 AS INT), " +
        s"CAST(-1 AS INT), CAST(0 AS BIGINT), ${c}_e6 FROM r$rounds"
    }.mkString("\n")
    s"""$iters
       |SELECT 'pattern' AS kind, g1, g2, g3, n, w_e6 AS value_e6 FROM w$rounds
       |$params
       |ORDER BY kind, g1, g2, g3""".stripMargin
  }

  /** One unrolled personalized-PageRank iteration for the q336 oracle —
    * replays [[graft.operators.Graph.personalizedPageRankScaled]]'s
    * integer recurrence with the seed-only teleport. */
  private def pprIterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT n.v,
       |    COALESCE((85 * f.s) // 100, 0)
       |      + CASE WHEN sdj.v IS NOT NULL
       |          THEN (15 * $PprScale) // (100 * ns.n) ELSE 0 END AS r
       |  FROM nodes n
       |  LEFT JOIN (
       |    SELECT de.dst AS v, CAST(sum(pr.r // dg.deg) AS BIGINT) AS s
       |    FROM dirE de
       |    JOIN r${k - 1} pr ON de.src = pr.v
       |    JOIN deg dg ON de.src = dg.src
       |    GROUP BY 1
       |  ) f ON f.v = n.v
       |  LEFT JOIN sd sdj ON sdj.v = n.v
       |  CROSS JOIN ns
       |)""".stripMargin





}
