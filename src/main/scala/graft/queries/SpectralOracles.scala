package graft.queries

/** Direct-DFT DuckDB oracle SQL for the spectral (FFT-backed) queries.
  *
  * At verify scale (sf0.01, ~1.2k samples/channel) an O(n²) DFT is cheap in
  * SQL, so every FFT operator gets an exact hash-checked oracle instead of a
  * rows-only check. The SQL mirrors graft.dsp bit-for-bit semantically:
  * 5-smooth fast padding lengths, reflect-limited smart_pad, rfft packing
  * rules, the resample Nyquist-bin halve/double rule (resample.py:86-88),
  * hamming notch masks (linenoise_notch.py:8-92), and the L2-normalized
  * Gaussian filterbank (wavelet_transform.py:15-37).
  *
  * The trick that keeps these DFTs cheap: every linear stage that only
  * MODIFIES a few bins (notch, identity-resample's Nyquist halving) is
  * expressed as `x - inverse_dft(modified_bins)` so its DFT runs over ~25
  * bins, not np/2. Only genuinely spectral outputs (wavelet bands,
  * rate-changing resample) pay the full O(bins × time) sum.
  *
  * Developed and cross-checked against Spark output by
  * tools/proto_oracle.py (kept in sync manually; the prototype is the
  * executable form of this file's derivation).
  */
object SpectralOracles {

  /** Shared events->channelized rect fragment (same as QueryDef.EventsRectSql
    * but without the leading WITH, for composition). */
  private val rect: String = """
ranked AS (
  SELECT CAST(user_id % 8 AS INT) AS channel,
         CAST(value AS DOUBLE) AS value,
         CAST(row_number() OVER (PARTITION BY user_id % 8 ORDER BY ts, event_id) - 1 AS BIGINT) AS t_idx
  FROM events
), minlen AS (
  SELECT min(cnt) AS n FROM (SELECT count(*) AS cnt FROM ranked GROUP BY channel) t
), rect AS (
  SELECT r.channel, r.t_idx, r.value FROM ranked r, minlen m WHERE r.t_idx < m.n
)"""

  /** SQL emulation of java.lang.Math.rint (round half to even) -> BIGINT. */
  private def rint(x: String): String =
    s"CAST(CASE WHEN ($x) - floor($x) > 0.5 THEN floor($x) + 1 " +
      s"WHEN ($x) - floor($x) < 0.5 THEN floor($x) " +
      s"ELSE floor($x) + (CAST(floor($x) AS BIGINT) % 2) END AS BIGINT)"

  /** 5-smooth next_fast_len >= n (n from the 'minlen' CTE). */
  private val fastlen: String = """
fastlen AS (
  SELECT min(CAST(l AS BIGINT)) AS fast FROM (
    SELECT power(2, a.g) * power(3, b.g) * power(5, c.g) AS l
    FROM (SELECT unnest(generate_series(0, 31)) AS g) a,
         (SELECT unnest(generate_series(0, 20)) AS g) b,
         (SELECT unnest(generate_series(0, 14)) AS g) c),
    minlen m
  WHERE l >= m.n AND l <= 2 * m.n
)"""

  /** padPlan(n, FastPad, ratio) constants for a resample newFreq/oldFreq. */
  private def resampleConsts(newFreq: Double, oldFreq: Double): String = {
    val num = s"CAST(ceil(m.n * $newFreq / $oldFreq) AS BIGINT)"
    s"""
consts AS (
  SELECT m.n AS n, f.fast AS np,
         (f.fast - m.n) // 2 AS pl,
         f.fast - m.n - (f.fast - m.n) // 2 AS pr,
         $num AS num,
         CAST($num AS DOUBLE) / CAST(m.n AS DOUBLE) AS ratio
  FROM minlen m, fastlen f
), consts2 AS (
  SELECT c.*,
         ${rint("c.ratio * c.np")} AS newlen,
         ${rint("c.ratio * c.n")} AS finallen,
         ${rint("c.ratio * c.pl")} AS rm0
  FROM consts c
), plan AS (
  SELECT c.*, c.newlen - c.finallen - c.rm0 AS rm1 FROM consts2 c
), idx AS (
  SELECT unnest(generate_series(0, c.np - 1)) AS i FROM plan c
)"""
  }

  /** smart_pad of `src` (keys..., t_idx, value) -> `out` (keys..., i, p) of
    * length np per key (Signal.smartPad: reflect-limited, zero-fill). */
  private def padCtes(src: String, keys: Seq[String], out: String): String = {
    val kl = keys.mkString(", ")
    val ekeys = keys.map(k => s"e.$k").mkString(", ")
    val join = keys.map(k => s"rv.$k = e.$k").mkString(" AND ")
    s"""
${out}_edges AS (
  SELECT $kl,
         max(CASE WHEN t_idx = 0 THEN value END) AS x0,
         max(CASE WHEN t_idx = c.n - 1 THEN value END) AS xl
  FROM $src, plan c GROUP BY $kl
), $out AS (
  SELECT $ekeys, x.i,
    CASE
      WHEN x.i >= c.pl AND x.i < c.pl + c.n THEN rv.value
      WHEN x.i < c.pl AND (c.pl - x.i) <= c.n - 1 THEN 2.0 * e.x0 - rv.value
      WHEN x.i >= c.pl + c.n AND (x.i - c.pl - c.n) < LEAST(c.pr, c.n - 1)
        THEN 2.0 * e.xl - rv.value
      ELSE 0.0 END AS p
  FROM idx x
  CROSS JOIN plan c
  CROSS JOIN ${out}_edges e
  LEFT JOIN $src rv ON $join AND rv.t_idx =
    CASE WHEN x.i >= c.pl AND x.i < c.pl + c.n THEN x.i - c.pl
         WHEN x.i < c.pl THEN c.pl - x.i
         ELSE 2 * c.n - 2 - (x.i - c.pl) END
)"""
  }

  /** FFT notch as a linear correction: `out` = src - irfft(fd * win), win
    * nonzero only within ±1 Hz of each noise harmonic below Nyquist. */
  private def notchCtes(padded: String, src: String, keys: Seq[String],
                        out: String, rate: Double, noise: Double = 60.0): String = {
    val fstep = s"(1.0 / (c.np * (1.0 / $rate)))"
    val pkeys = keys.map(k => s"p.$k").mkString(", ")
    val bkeysList = keys.map(k => s"b.$k").mkString(", ")
    val bjoin = keys.map(k => s"b.$k = s.$k").mkString(" AND ")
    val cojoin = keys.map(k => s"co.$k = s.$k").mkString(" AND ")
    val skeys = keys.map(k => s"s.$k").mkString(", ")
    s"""
${out}_mask AS (
  SELECT k.k, h.h
  FROM (SELECT unnest(generate_series(1, c.np // 2)) AS k FROM plan c) k
  CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS h) h
  CROSS JOIN plan c
  WHERE h.h * $noise < $rate / 2.0
    AND k.k * $fstep > h.h * $noise - 1.0
    AND k.k * $fstep < h.h * $noise + 1.0
), ${out}_wk AS (
  SELECT k, CASE WHEN m = 1 THEN 1.0
                 ELSE 0.54 - 0.46 * cos(2 * pi() * wi / (m - 1)) END AS w
  FROM (SELECT k, count(*) OVER (PARTITION BY h) AS m,
               row_number() OVER (PARTITION BY h ORDER BY k) - 1 AS wi
        FROM ${out}_mask) t
), ${out}_bins AS (
  SELECT $pkeys, w.k, w.w,
         sum(p.p * cos(2 * pi() * w.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * w.k * p.i / c.np)) AS im
  FROM $padded p CROSS JOIN ${out}_wk w CROSS JOIN plan c
  GROUP BY $pkeys, w.k, w.w
), ${out}_corr AS (
  SELECT $bkeysList, s.t_idx,
         2.0 / c.np * sum(b.w * (b.re * cos(2 * pi() * b.k * (s.t_idx + c.pl) / c.np)
                               - b.im * sin(2 * pi() * b.k * (s.t_idx + c.pl) / c.np))) AS cval
  FROM ${out}_bins b
  JOIN $src s ON $bjoin
  CROSS JOIN plan c
  GROUP BY $bkeysList, s.t_idx, c.np
), $out AS (
  SELECT $skeys, s.t_idx, s.value - co.cval AS value
  FROM $src s JOIN ${out}_corr co ON $cojoin AND co.t_idx = s.t_idx
)"""
  }

  /** Rate-changing FFT resample of `padded` -> `out` (keys..., t_idx, value)
    * of finallen samples per key (resample.py:43-102 semantics). */
  private def resampleFullCtes(padded: String, keys: Seq[String], out: String): String = {
    val pkeys = keys.map(k => s"p.$k").mkString(", ")
    val bkeys = keys.map(k => s"b.$k").mkString(", ")
    val akeys = keys.map(k => s"a.$k").mkString(", ")
    val ykeys = keys.map(k => s"y.$k").mkString(", ")
    s"""
${out}_ks AS (
  SELECT unnest(generate_series(0, LEAST(c.np // 2, c.newlen // 2))) AS k
  FROM plan c
), ${out}_bins AS (
  SELECT $pkeys, k.k,
         sum(p.p * cos(2 * pi() * k.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * k.k * p.i / c.np)) AS im
  FROM $padded p CROSS JOIN ${out}_ks k CROSS JOIN plan c
  GROUP BY $pkeys, k.k
), ${out}_adj AS (
  SELECT $bkeys, b.k,
    b.re * c.ratio * CASE WHEN LEAST(c.newlen, c.np) % 2 = 0
                           AND b.k = LEAST(c.newlen, c.np) // 2
                           AND LEAST(c.newlen, c.np) // 2 < c.np // 2 + 1
                          THEN CASE WHEN c.newlen < c.np THEN 2.0 ELSE 0.5 END
                          ELSE 1.0 END AS re,
    CASE WHEN b.k = 0 OR (c.np % 2 = 0 AND b.k = c.np // 2) THEN 0.0
         ELSE b.im END
      * c.ratio * CASE WHEN LEAST(c.newlen, c.np) % 2 = 0
                        AND b.k = LEAST(c.newlen, c.np) // 2
                        AND LEAST(c.newlen, c.np) // 2 < c.np // 2 + 1
                       THEN CASE WHEN c.newlen < c.np THEN 2.0 ELSE 0.5 END
                       ELSE 1.0 END AS im
  FROM ${out}_bins b CROSS JOIN plan c
), ${out}_y AS (
  SELECT $akeys, t.t,
    sum((CASE WHEN a.k = 0 OR (c.newlen % 2 = 0 AND a.k = c.newlen // 2)
              THEN 1.0 ELSE 2.0 END)
        * (a.re * cos(2 * pi() * a.k * t.t / c.newlen)
           - (CASE WHEN c.newlen % 2 = 0 AND a.k = c.newlen // 2 THEN 0.0 ELSE a.im END)
             * sin(2 * pi() * a.k * t.t / c.newlen))) / c.newlen AS v
  FROM ${out}_adj a
  CROSS JOIN (SELECT unnest(generate_series(0, c2.newlen - 1)) AS t FROM plan c2) t
  CROSS JOIN plan c
  WHERE a.k <= c.newlen // 2
  GROUP BY $akeys, t.t, c.newlen
), $out AS (
  SELECT $ykeys, y.t - c.rm0 AS t_idx, y.v AS value
  FROM ${out}_y y CROSS JOIN plan c
  WHERE y.t >= c.rm0 AND y.t < c.newlen - c.rm1
)"""
  }

  /** Analytic wavelet trace `out` (channel, band, t_idx, zre, zim) for the
    * human/hgOnly filterbank over padded relation `src`. */
  private def waveletCtes(rate: Double, src: String, out: String): String = {
    val fstep = s"(1.0 / (c.np * (1.0 / $rate)))"
    s"""
${out}_bands AS (
  SELECT CAST(row_number() OVER (ORDER BY cf) - 1 AS INT) AS band, cf, cf / 8.0 AS sd
  FROM (SELECT power(10, log10(4.0749286538265)
                        + g * (log10(200.0) - log10(4.0749286538265)) / 39) AS cf
        FROM (SELECT unnest(generate_series(0, 39)) AS g) t0) t1
  WHERE cf >= 70.0 AND cf <= 150.0
), ${out}_gk AS (
  SELECT b.band, k.k,
         exp(-pow(k.k * $fstep - b.cf, 2) / (2 * b.sd * b.sd)) AS g
  FROM (SELECT unnest(generate_series(0, c.np // 2)) AS k FROM plan c) k
  CROSS JOIN ${out}_bands b CROSS JOIN plan c
), ${out}_gnorm AS (
  SELECT gk.band,
         sqrt(sum((CASE WHEN gk.k = 0 OR gk.k = c.np // 2 THEN 1 ELSE 2 END)
                  * gk.g * gk.g)) AS nrm
  FROM ${out}_gk gk CROSS JOIN plan c GROUP BY gk.band
), ${out}_xbins AS (
  SELECT p.channel, k.k,
         sum(p.p * cos(2 * pi() * k.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * k.k * p.i / c.np)) AS im
  FROM $src p
  CROSS JOIN (SELECT unnest(generate_series(1, (c.np + 1) // 2 - 1)) AS k FROM plan c) k
  CROSS JOIN plan c
  GROUP BY p.channel, k.k
), ${out}_zbins AS (
  SELECT x.channel, gk.band, x.k,
         2.0 * x.re * gk.g / gn.nrm AS re,
         2.0 * x.im * gk.g / gn.nrm AS im
  FROM ${out}_xbins x
  JOIN ${out}_gk gk ON gk.k = x.k
  JOIN ${out}_gnorm gn ON gn.band = gk.band
), $out AS (
  SELECT z.channel, z.band, t.t - c.pl AS t_idx,
         sum(z.re * cos(2 * pi() * z.k * t.t / c.np)
             - z.im * sin(2 * pi() * z.k * t.t / c.np)) / c.np AS zre,
         sum(z.re * sin(2 * pi() * z.k * t.t / c.np)
             + z.im * cos(2 * pi() * z.k * t.t / c.np)) / c.np AS zim
  FROM ${out}_zbins z
  CROSS JOIN (SELECT unnest(generate_series(c2.pl, c2.pl + c2.n - 1)) AS t FROM plan c2) t
  CROSS JOIN plan c
  GROUP BY z.channel, z.band, t.t, c.np, c.pl
)"""
  }

  /** q30: resample(events rect @1000Hz -> 250Hz), FastPad, trim, round 6. */
  def q30(newFreq: Double = 250.0, oldFreq: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(newFreq, oldFreq)},
${padCtes("rect", Seq("channel"), "padded")},
${resampleFullCtes("padded", Seq("channel"), "resamp")}
SELECT channel, CAST(NULL AS INT) AS band, t_idx, round(value, 6) AS value
FROM resamp ORDER BY channel, t_idx"""

  /** q31: 60 Hz notch, linear-correction form. */
  def q31(rate: Double = 1000.0, noise: Double = 60.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${notchCtes("padded", "rect", Seq("channel"), "notched", rate, noise)}
SELECT channel, CAST(NULL AS INT) AS band, t_idx, round(value, 6) AS value
FROM notched ORDER BY channel, t_idx"""

  /** q32 (amplitude) / q35 (phase): wavelet filterbank trace. */
  def q32(rate: Double = 1000.0,
          valueExpr: String = "sqrt(zre * zre + zim * zim)"): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")}
SELECT channel, band, t_idx, round($valueExpr, 6) AS value
FROM ztrace ORDER BY channel, band, t_idx"""

  def q35(rate: Double = 1000.0): String = q32(rate, "atan2(zim, zre)")

  /** q207: instantaneous frequency — q35's wavelet phase chain composed
    * with a per-(channel, band) lagged phase difference, wrapped into
    * (-pi, pi] by floor arithmetic and scaled to Hz. Phases are pinned to
    * the cross-engine round(.,6) grid first (the q35 hash contract), so
    * the difference/wrap/scale chain runs on identical doubles; per-band
    * means sum ROUNDED micro-Hz integers (order-free). */
  def q207(rate: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")},
ph AS (
  SELECT channel, band, t_idx, round(atan2(zim, zre), 6) AS p
  FROM ztrace
), dp AS (
  SELECT channel, band,
    p - lag(p) OVER (PARTITION BY channel, band ORDER BY t_idx) AS d
  FROM ph
), instf AS (
  SELECT channel, band,
    (d - 2 * pi() * floor((d + pi()) / (2 * pi()))) * $rate / (2 * pi()) AS f
  FROM dp WHERE d IS NOT NULL
)
SELECT channel, band, count(*) AS n,
  round(CAST(sum(CAST(round(f * 1e6, 0) AS BIGINT)) AS DOUBLE)
    / count(*) / 1e6, 6) AS mean_if_hz,
  count(*) FILTER (WHERE f < 0) AS n_negative
FROM instf GROUP BY channel, band
ORDER BY channel, band"""

  /** q192: amplitude-envelope correlation — q32's wavelet amplitude chain
    * composed with an integer-grid Pearson correlation between channel
    * pairs within each band. Amplitudes are pinned to the cross-engine-
    * identical round(.,6) grid FIRST (the q32 hash contract), then floored
    * to milli units, so every correlation input is the same exact integer
    * in both engines. */
  def q192(rate: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")},
amp AS (
  SELECT channel, band, t_idx,
    CAST(floor(round(sqrt(zre * zre + zim * zim), 6) * 1000) AS BIGINT) AS am
  FROM ztrace
), st AS (
  SELECT channel, band, count(*) AS n,
    CAST(sum(am) AS BIGINT) AS sx,
    CAST(sum(CAST(am AS HUGEINT) * am) AS HUGEINT) AS sxx
  FROM amp GROUP BY channel, band
), xy AS (
  SELECT a.band, a.channel AS c1, b.channel AS c2,
    CAST(sum(CAST(a.am AS HUGEINT) * b.am) AS HUGEINT) AS sxy
  FROM amp a
  JOIN amp b ON b.band = a.band AND b.t_idx = a.t_idx AND b.channel > a.channel
  GROUP BY a.band, a.channel, b.channel
)
SELECT xy.band AS band, xy.c1, xy.c2,
  round(CAST(s1.n * xy.sxy - s1.sx * s2.sx AS DOUBLE) /
    sqrt(CAST(s1.n * s1.sxx - s1.sx * s1.sx AS DOUBLE) *
         CAST(s2.n * s2.sxx - s2.sx * s2.sx AS DOUBLE)), 6) AS envelope_r
FROM xy
JOIN st s1 ON s1.channel = xy.c1 AND s1.band = xy.band
JOIN st s2 ON s2.channel = xy.c2 AND s2.band = xy.band
ORDER BY xy.band, xy.c1, xy.c2"""

  /** q244: phase-amplitude coupling (Tort modulation index) — the q32/q35
    * wavelet chain composed downstream: phase of the LOWEST hg band bins
    * the amplitude of the HIGHEST hg band into 18 phase bins. Phase and
    * amplitude are pinned to the cross-engine round(.,6) grid FIRST (the
    * q32/q35 hash contract), the bin index is floor arithmetic on those
    * identical doubles, amplitudes floor to milli integers (q192's idiom),
    * and MI sums ROUNDED micro-nat p*ln(p) contributions (q185's idiom). */
  def q244(rate: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")},
bands AS (SELECT min(band) AS lo, max(band) AS hi FROM ztrace),
ph AS (
  SELECT channel, t_idx, round(atan2(zim, zre), 6) AS p
  FROM ztrace, bands WHERE band = lo
), am AS (
  SELECT channel, t_idx, round(sqrt(zre * zre + zim * zim), 6) AS a
  FROM ztrace, bands WHERE band = hi
), j AS (
  SELECT ph.channel,
    CAST(least(floor((p + pi()) * 9 / pi()), 17) AS INT) AS bin,
    CAST(floor(a * 1000) AS BIGINT) AS am_milli
  FROM ph JOIN am ON am.channel = ph.channel AND am.t_idx = ph.t_idx
), g AS (
  SELECT channel, bin, count(*) AS n, CAST(sum(am_milli) AS BIGINT) AS s
  FROM j GROUP BY 1, 2
), t AS (SELECT channel, CAST(sum(s) AS BIGINT) AS tot FROM g GROUP BY 1),
c AS (
  SELECT g.channel, bin, n, s,
    CASE WHEN s > 0 THEN CAST(floor((CAST(s AS DOUBLE) / tot
      * ln(CAST(s AS DOUBLE) / tot) * 1e6) + 0.5) AS BIGINT) ELSE 0 END
      AS contrib_micro
  FROM g JOIN t USING (channel)
), mi AS (
  SELECT channel, CAST(floor(((ln(18.0) + CAST(sum(contrib_micro) AS DOUBLE)
    / 1e6) / ln(18.0) * 1e6) + 0.5) AS BIGINT) AS mi_ppm
  FROM c GROUP BY 1
)
SELECT c.channel, bin, n, s AS amp_milli, contrib_micro, mi_ppm
FROM c JOIN mi USING (channel)
ORDER BY c.channel, bin"""

  /** q245: high-gamma burst census — the q32 amplitude chain composed with
    * threshold-crossing run statistics: per (channel, t) the hg envelope is
    * the SUM of per-band milli-floored amplitudes (exact integers), the
    * threshold is 1.5x the channel's integer mean on the same grid
    * ((3*(S div N)) div 2 — pure floor arithmetic), and bursts are maximal
    * above-threshold runs found by the rownumber-difference island idiom. */
  def q245(rate: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")},
env AS (
  SELECT channel, t_idx,
    CAST(sum(CAST(floor(round(sqrt(zre * zre + zim * zim), 6) * 1000)
      AS BIGINT)) AS BIGINT) AS e
  FROM ztrace GROUP BY channel, t_idx
), thr AS (
  SELECT channel,
    (3 * (CAST(sum(e) AS BIGINT) // count(*))) // 2 AS thr
  FROM env GROUP BY channel
), above AS (
  SELECT env.channel, t_idx,
    t_idx - row_number() OVER (PARTITION BY env.channel ORDER BY t_idx) AS grp
  FROM env JOIN thr ON thr.channel = env.channel
  WHERE e > thr
), runs AS (
  SELECT channel, grp, count(*) AS runlen FROM above GROUP BY 1, 2
)
SELECT thr.channel, thr.thr AS thr_milli,
  CAST(coalesce(count(runs.grp), 0) AS BIGINT) AS n_bursts,
  CAST(coalesce(sum(runlen), 0) AS BIGINT) AS burst_samples,
  CAST(coalesce(max(runlen), 0) AS BIGINT) AS max_run,
  round(coalesce(CAST(sum(runlen) AS DOUBLE) / count(runs.grp), 0.0), 6)
    AS mean_run
FROM thr LEFT JOIN runs ON runs.channel = thr.channel
GROUP BY thr.channel, thr.thr
ORDER BY thr.channel"""

  /** q247: spectral edge frequency — the q32 amplitude chain reduced to
    * per-(channel, band) integer power (floor of the round(.,6)-pinned
    * amplitude squared, milli grid), cumulated in band order (= ascending
    * cf), edge = first band where 20*cum >= 19*total (95%). */
  def q247(rate: Double = 1000.0): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(rate, rate)},
${padCtes("rect", Seq("channel"), "padded")},
${waveletCtes(rate, "padded", "ztrace")},
pw AS (
  SELECT channel, band,
    CAST(sum(CAST(floor(round(sqrt(zre * zre + zim * zim), 6)
      * round(sqrt(zre * zre + zim * zim), 6) * 1000) AS BIGINT))
      AS BIGINT) AS p
  FROM ztrace GROUP BY channel, band
), cum AS (
  SELECT channel, band, p,
    CAST(sum(p) OVER (PARTITION BY channel ORDER BY band) AS BIGINT) AS c,
    CAST(sum(p) OVER (PARTITION BY channel) AS BIGINT) AS tot
  FROM pw
)
SELECT channel, CAST(min(CASE WHEN 20 * c >= 19 * tot THEN band END) AS INT)
    AS sef_band,
  max(tot) AS total_power_milli,
  CAST(max(CASE WHEN 20 * c >= 19 * tot THEN NULL
    ELSE c END) AS BIGINT) AS cum_below_edge
FROM cum GROUP BY channel ORDER BY channel"""

  /** q34: bit-exact replica of the synthetic generator (graft.model
    * .Synthetic): splitmix64 counter RNG via HUGEINT mod-2^64 arithmetic
    * (64x64 multiplies split into 32-bit halves to stay inside INT128),
    * Box-Muller gauss draws, boxcar(50) smoothing as a window sum, global
    * population std, modulated 100 Hz carrier and the closed-form 60 Hz
    * harmonic sum. NOTE: DuckDB identifiers are case-insensitive — harmonic
    * trig columns are c6/s6 because cH would collide with ch. */
  /** chans..smoothed: the splitmix64 + Box-Muller + boxcar(50) raw
    * noise pipeline shared by q34 (full synthetic source), q303
    * (DSv2 source scan) and q361 (storage-partitioned join, which
    * instantiates it twice with distinct seeds) — 8 channels x 800
    * samples. `prefix` namespaces the CTE names so two instantiations can
    * share one WITH clause. */
  private[queries] def rawNoiseCtesFor(seed: Long, prefix: String = ""): String = {
    val p = prefix
    s"""|${p}chans AS (SELECT unnest(generate_series(0, 7)) AS ch),
             |${p}ks AS (SELECT unnest(generate_series(0, 799)) AS k),
             |${p}ctr AS (
             |  SELECT c.ch, s.k, w.which,
             |    (($seed::HUGEINT * 7146057691288625177 + c.ch::HUGEINT * 11400714819323198485
             |      + 2 * s.k + w.which) % 18446744073709551616)::UBIGINT AS x0
             |  FROM ${p}chans c CROSS JOIN ${p}ks s
             |  CROSS JOIN (SELECT unnest([0, 1]) AS which) w
             |),
             |${p}m1 AS (SELECT ch, k, which,
             |  ((x0::HUGEINT + 11400714819323198485) % 18446744073709551616)::UBIGINT AS x FROM ${p}ctr),
             |${p}m2 AS (SELECT ch, k, which,
             |  ((((xor(x, x >> 30)) % 4294967296)::HUGEINT * 13787848793156543929 + (((((xor(x, x >> 30)) >> 32)::HUGEINT * 13787848793156543929) % 4294967296) << 32)) % 18446744073709551616)::UBIGINT AS x FROM ${p}m1),
             |${p}m3 AS (SELECT ch, k, which,
             |  ((((xor(x, x >> 27)) % 4294967296)::HUGEINT * 10723151780598845931 + (((((xor(x, x >> 27)) >> 32)::HUGEINT * 10723151780598845931) % 4294967296) << 32)) % 18446744073709551616)::UBIGINT AS x FROM ${p}m2),
             |${p}m4 AS (SELECT ch, k, which, xor(x, x >> 31) AS x FROM ${p}m3),
             |${p}us AS (SELECT ch, k, which, ((x >> 11)::DOUBLE + 0.5) / 9007199254740992.0 AS u FROM ${p}m4),
             |${p}noise AS (
             |  SELECT ch, k,
             |    sqrt(-2.0 * ln(max(CASE WHEN which = 0 THEN u END)))
             |      * cos(2.0 * pi() * max(CASE WHEN which = 1 THEN u END)) / 100.0 AS v
             |  FROM ${p}us GROUP BY ch, k
             |),
             |${p}smoothed AS (
             |  SELECT ch, k,
             |    sum(v) OVER (PARTITION BY ch ORDER BY k ROWS BETWEEN 25 PRECEDING AND 24 FOLLOWING)
             |      / 50.0 AS v
             |  FROM ${p}noise
             |),""".stripMargin
  }

  private val RawNoiseCtes: String = rawNoiseCtesFor(42L)

  def q34(): String =
    s"""|WITH $RawNoiseCtes
             |stats AS (
             |  SELECT sum(v) / count(*) AS mu,
             |         sqrt(sum(v * v) / count(*) - (sum(v) / count(*)) ** 2) AS sd
             |  FROM smoothed
             |),
             |phctr AS (
             |  SELECT c.ch, s.stream_kind,
             |    CASE WHEN s.stream_kind < 2 THEN
             |      ((42::HUGEINT * 11400714819323198485
             |        + (1000 * (s.stream_kind + 1) + c.ch)::HUGEINT * 15111065706836454659
             |        + 0 + 10140184033053478359) % 18446744073709551616)::UBIGINT
             |    ELSE
             |      ((((42::HUGEINT * 7146057691288625177
             |          + (3000 + c.ch)::HUGEINT * 11400714819323198485) % 18446744073709551616)
             |        + (s.stream_kind - 2) + 11400714819323198485) % 18446744073709551616)::UBIGINT
             |    END AS x
             |  FROM chans c CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS stream_kind) s
             |),
             |ph1 AS (SELECT ch, stream_kind,
             |  ((((xor(x, x >> 30)) % 4294967296)::HUGEINT * 13787848793156543929 + (((((xor(x, x >> 30)) >> 32)::HUGEINT * 13787848793156543929) % 4294967296) << 32)) % 18446744073709551616)::UBIGINT AS x FROM phctr),
             |ph2 AS (SELECT ch, stream_kind,
             |  ((((xor(x, x >> 27)) % 4294967296)::HUGEINT * 10723151780598845931 + (((((xor(x, x >> 27)) >> 32)::HUGEINT * 10723151780598845931) % 4294967296) << 32)) % 18446744073709551616)::UBIGINT AS x FROM ph1),
             |ph3 AS (SELECT ch, stream_kind, xor(x, x >> 31) AS x FROM ph2),
             |phu AS (SELECT ch, stream_kind, ((x >> 11)::DOUBLE + 0.5) / 9007199254740992.0 AS u FROM ph3),
             |chparams AS (
             |  SELECT ch,
             |    2.0 * pi() * max(CASE WHEN stream_kind = 0 THEN u END) AS phc,
             |    2.0 * pi() * max(CASE WHEN stream_kind = 1 THEN u END) AS phm,
             |    sqrt(-2.0 * ln(max(CASE WHEN stream_kind = 2 THEN u END)))
             |      * cos(2.0 * pi() * max(CASE WHEN stream_kind = 3 THEN u END)) AS weight
             |  FROM phu GROUP BY ch
             |),
             |terms AS (
             |  SELECT s.ch, s.k, s.v / (st.sd * 2.0) AS base,
             |    2.0 * s.k / 799.0 AS t, p.phc, p.phm, p.weight
             |  FROM smoothed s CROSS JOIN stats st JOIN chparams p ON p.ch = s.ch
             |),
             |ln0 AS (
             |  SELECT ch, k, base, phc, phm, weight, t,
             |    cos(2.0 * pi() * 60.0 * t) AS c, sin(2.0 * pi() * 60.0 * t) AS sn,
             |    cos(6.0 * 2.0 * pi() * 60.0 * t) AS c6, sin(6.0 * 2.0 * pi() * 60.0 * t) AS s6
             |  FROM terms
             |),
             |ln1 AS (
             |  SELECT ch, k, base, phc, phm, weight, t, c, sn,
             |    1.0 - 0.015625 * c6 AS ar, -0.015625 * s6 AS ai,
             |    1.0 - 0.5 * c AS dr, -0.5 * sn AS di
             |  FROM ln0
             |)
             |SELECT ch AS channel, CAST(NULL AS INTEGER) AS band, k AS t_idx,
             |  round(base
             |    + sin(2.0 * pi() * t * 100.0 + phc) * (sin(2.0 * pi() * t * 1.0 + phm) ** 2 + 0.2)
             |    + weight * ((0.5 * (c * ai + sn * ar)) * dr - (0.5 * (c * ar - sn * ai)) * di)
             |      / (dr * dr + di * di), 6) AS value
             |FROM ln1
             |ORDER BY channel, t_idx""".stripMargin

  /** q33: full preprocess_block + tutorial tail. The identity resample
    * (1000 -> 1000, ratio 1) is NOT a numeric no-op: the even-np Nyquist bin
    * is halved (resample.py:86-88), i.e. y1 = x - X_nyq/(2·np)·(-1)^(t+pl). */
  /** q303: the DSv2 source scan certified through the same splitmix64
    * rebuild as q34 — per-channel aggregates of e9-rounded raw samples,
    * channels restricted to the pushed-down [lo, hi] range. */
  def q303(chLo: Int, chHi: Int): String =
    s"""|WITH ${RawNoiseCtes.trim.stripSuffix(",")}
        |SELECT ch AS channel, count(*) AS n_samples,
        |  CAST(sum(CAST(round(v * 1000000000) AS BIGINT)) AS BIGINT)
        |    AS sum_v_e9,
        |  CAST(max(CAST(round(v * 1000000000) AS BIGINT)) AS BIGINT)
        |    AS max_v_e9
        |FROM smoothed WHERE ch >= $chLo AND ch <= $chHi
        |GROUP BY 1 ORDER BY channel""".stripMargin

  def q33(rate: Double = 1000.0, finalRate: Double = 250.0,
          noise: Double = 60.0, baseline: Int = 50): String =
    s"""WITH $rect, $fastlen, ${resampleConsts(finalRate, rate)},
${padCtes("rect", Seq("channel"), "padded0")},
s1nyq AS (
  SELECT p.channel, sum(p.p * (1 - 2 * (p.i % 2))) AS xnyq
  FROM padded0 p GROUP BY p.channel
), y1 AS (
  SELECT r.channel, r.t_idx,
         r.value - CASE WHEN c.np % 2 = 0
                        THEN nq.xnyq / (2.0 * c.np) * (1 - 2 * ((r.t_idx + c.pl) % 2))
                        ELSE 0.0 END AS value
  FROM rect r JOIN s1nyq nq ON nq.channel = r.channel CROSS JOIN plan c
),
${padCtes("y1", Seq("channel"), "padded1")},
${notchCtes("padded1", "y1", Seq("channel"), "y2", rate, noise)},
car AS (
  SELECT t_idx,
         list_aggregate(list_slice(list_sort(list(value)), 2, 7), 'sum') / 6 AS car
  FROM y2 GROUP BY t_idx
), y3 AS (
  SELECT y2.channel, y2.t_idx, y2.value - ca.car AS value
  FROM y2 JOIN car ca ON ca.t_idx = y2.t_idx
),
${padCtes("y3", Seq("channel"), "padded3")},
${waveletCtes(rate, "padded3", "ztrace")},
amp AS (
  SELECT channel, band, t_idx, sqrt(zre * zre + zim * zim) AS value FROM ztrace
),
${padCtes("amp", Seq("channel", "band"), "padded4")},
${resampleFullCtes("padded4", Seq("channel", "band"), "resamp")},
stats AS (
  SELECT channel, band, avg(value) AS mu,
         sqrt(avg(value * value) - avg(value) * avg(value)) AS sd
  FROM resamp WHERE t_idx < $baseline GROUP BY channel, band
)
SELECT r.channel, CAST(NULL AS INT) AS band, r.t_idx,
       round(avg((r.value - s.mu) / s.sd), 6) AS value
FROM resamp r JOIN stats s ON s.channel = r.channel AND s.band = r.band
GROUP BY r.channel, r.t_idx
ORDER BY r.channel, r.t_idx"""

  /** q361: storage-partitioned join — two independently-seeded synthetic
    * corpora (8 ch x 800 t) aggregated per channel and joined on channel.
    * The `exchanges_in_plan` column is computed Spark-side from the
    * EXECUTED physical plan (count of Exchange / query-stage shuffle nodes
    * anywhere in the join) and pinned to 0 here — the shuffle-elision of
    * the DSv2 KeyGroupedPartitioning join is itself driver-certified, not
    * just spec-certified. */
  def q361(seedLeft: Long, seedRight: Long, rightTMax: Int): String =
    s"""|WITH ${rawNoiseCtesFor(seedLeft, "a_")}
        |${rawNoiseCtesFor(seedRight, "b_")}
        |l AS (
        |  SELECT ch, count(*) AS n_left,
        |    CAST(sum(CAST(round(v * 1000000000) AS BIGINT)) AS BIGINT)
        |      AS sum_left_e9
        |  FROM a_smoothed GROUP BY ch),
        |r AS (
        |  SELECT ch, count(*) AS n_right,
        |    CAST(sum(CAST(round(v * 1000000000) AS BIGINT)) AS BIGINT)
        |      AS sum_right_e9
        |  FROM b_smoothed WHERE k < $rightTMax GROUP BY ch)
        |SELECT l.ch AS channel, l.n_left, l.sum_left_e9,
        |       r.n_right, r.sum_right_e9, CAST(0 AS INT) AS exchanges_in_plan
        |FROM l JOIN r ON r.ch = l.ch ORDER BY channel""".stripMargin

  /** q363: both stored series replayed from the events table; the
    * exchange count the Spark side measured structurally is pinned 0. */
  def q363(): String =
    s"""|WITH sa AS (
        |  SELECT CAST(event_id % 8 AS INT) AS channel, value FROM events
        |),
        |sb AS (
        |  SELECT CAST(event_id % 8 AS INT) AS channel, value FROM events
        |  WHERE event_type = 'click'
        |),
        |l AS (
        |  SELECT channel, count(*) AS n_left,
        |    CAST(sum(CAST(round(value * 1000000000) AS BIGINT)) AS BIGINT)
        |      AS sum_left_e9
        |  FROM sa GROUP BY 1),
        |r AS (
        |  SELECT channel, count(*) AS n_right,
        |    CAST(sum(CAST(round(value * 1000000000) AS BIGINT)) AS BIGINT)
        |      AS sum_right_e9
        |  FROM sb GROUP BY 1)
        |SELECT l.channel, l.n_left, l.sum_left_e9,
        |       r.n_right, r.sum_right_e9, CAST(0 AS INT) AS exchanges_in_plan
        |FROM l JOIN r USING (channel) ORDER BY channel""".stripMargin
}
