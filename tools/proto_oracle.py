#!/usr/bin/env python3
"""Dev prototype for the direct-DFT DuckDB oracles (q30/q31/q32/q33/q35).

Builds candidate oracle SQL, runs it in DuckDB over an sf dir, and compares
against the Spark outputs already dumped by graft.Verify. Once a query
matches, the SQL template is ported into graft.queries (SpectralOracles).

The trick that keeps these O(n^2) DFTs cheap: every linear stage that only
MODIFIES a few bins (notch, identity-resample's Nyquist halving) is expressed
as `x - inverse_dft(modified_bins)` so the DFT runs over ~25 bins, not np/2.
Only genuinely spectral outputs (wavelet bands, rate-changing resample) pay
the full bin sum.

Usage: python3 tools/proto_oracle.py <sfDir> <verifyOutDir> [query...]
"""
import glob
import sys

import duckdb
import pandas as pd

# ---------------------------------------------------------------------------
# shared fragments (must mirror graft.dsp exactly)
# ---------------------------------------------------------------------------

RECT = """
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


def rint(x):
    """SQL emulation of java.lang.Math.rint (round half to even) -> BIGINT."""
    return (f"CAST(CASE WHEN ({x}) - floor({x}) > 0.5 THEN floor({x}) + 1 "
            f"WHEN ({x}) - floor({x}) < 0.5 THEN floor({x}) "
            f"ELSE floor({x}) + (CAST(floor({x}) AS BIGINT) % 2) END AS BIGINT)")


# 5-smooth next_fast_len >= n (n from the 'minlen' CTE)
FASTLEN = """
fastlen AS (
  SELECT min(CAST(l AS BIGINT)) AS fast FROM (
    SELECT power(2, a.g) * power(3, b.g) * power(5, c.g) AS l
    FROM (SELECT unnest(generate_series(0, 31)) AS g) a,
         (SELECT unnest(generate_series(0, 20)) AS g) b,
         (SELECT unnest(generate_series(0, 14)) AS g) c),
    minlen m
  WHERE l >= m.n AND l <= 2 * m.n
)"""


def resample_consts(new_freq, old_freq):
    """padPlan(n, FastPad, ratio) constants for a resample new/old."""
    num = f"CAST(ceil(m.n * {new_freq!r} / {old_freq!r}) AS BIGINT)"
    return f"""
consts AS (
  SELECT m.n AS n, f.fast AS np,
         (f.fast - m.n) // 2 AS pl,
         f.fast - m.n - (f.fast - m.n) // 2 AS pr,
         {num} AS num,
         CAST({num} AS DOUBLE) / CAST(m.n AS DOUBLE) AS ratio
  FROM minlen m, fastlen f
), consts2 AS (
  SELECT c.*,
         {rint("c.ratio * c.np")} AS newlen,
         {rint("c.ratio * c.n")} AS finallen,
         {rint("c.ratio * c.pl")} AS rm0
  FROM consts c
), plan AS (
  SELECT c.*, c.newlen - c.finallen - c.rm0 AS rm1 FROM consts2 c
), idx AS (
  SELECT unnest(generate_series(0, c.np - 1)) AS i FROM plan c
)"""


def pad_ctes(src, keys, out):
    """smart_pad of `src` (keys..., t_idx, value) -> `{out}` (keys..., i, p)
    of length np per key. Mirrors Signal.smartPad (utils.py reflect-limited
    pad with zero fill for overlong pads)."""
    kl = ", ".join(keys)
    ekeys = ", ".join(f"e.{k}" for k in keys)
    join = " AND ".join(f"rv.{k} = e.{k}" for k in keys)
    return f"""
{out}_edges AS (
  SELECT {kl},
         max(CASE WHEN t_idx = 0 THEN value END) AS x0,
         max(CASE WHEN t_idx = c.n - 1 THEN value END) AS xl
  FROM {src}, plan c GROUP BY {kl}
), {out} AS (
  SELECT {ekeys}, x.i,
    CASE
      WHEN x.i >= c.pl AND x.i < c.pl + c.n THEN rv.value
      WHEN x.i < c.pl AND (c.pl - x.i) <= c.n - 1 THEN 2.0 * e.x0 - rv.value
      WHEN x.i >= c.pl + c.n AND (x.i - c.pl - c.n) < LEAST(c.pr, c.n - 1)
        THEN 2.0 * e.xl - rv.value
      ELSE 0.0 END AS p
  FROM idx x
  CROSS JOIN plan c
  CROSS JOIN {out}_edges e
  LEFT JOIN {src} rv ON {join} AND rv.t_idx =
    CASE WHEN x.i >= c.pl AND x.i < c.pl + c.n THEN x.i - c.pl
         WHEN x.i < c.pl THEN c.pl - x.i
         ELSE 2 * c.n - 2 - (x.i - c.pl) END
)"""


def notch_ctes(padded, src, keys, out, rate, noise=60.0):
    """FFT notch as a linear correction: `{out}` = src - irfft(fd * win),
    where win is nonzero only on bins within ±1 Hz of each noise harmonic
    below Nyquist (Signal.notch / linenoise_notch.py:8-92). Trim at ratio=1
    returns exactly the data region, so out[t] = src[t] - corr[t + pl]."""
    fstep = f"(1.0 / (c.np * (1.0 / {rate!r})))"
    pkeys = ", ".join(f"p.{k}" for k in keys)
    bjoin = " AND ".join(f"b.{k} = s.{k}" for k in keys)
    cojoin = " AND ".join(f"co.{k} = s.{k}" for k in keys)
    return f"""
{out}_mask AS (
  SELECT k.k, h.h
  FROM (SELECT unnest(generate_series(1, c.np // 2)) AS k FROM plan c) k
  CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS h) h
  CROSS JOIN plan c
  WHERE h.h * {noise!r} < {rate!r} / 2.0
    AND k.k * {fstep} > h.h * {noise!r} - 1.0
    AND k.k * {fstep} < h.h * {noise!r} + 1.0
), {out}_wk AS (
  SELECT k, CASE WHEN m = 1 THEN 1.0
                 ELSE 0.54 - 0.46 * cos(2 * pi() * wi / (m - 1)) END AS w
  FROM (SELECT k, count(*) OVER (PARTITION BY h) AS m,
               row_number() OVER (PARTITION BY h ORDER BY k) - 1 AS wi
        FROM {out}_mask) t
), {out}_bins AS (
  SELECT {pkeys}, w.k, w.w,
         sum(p.p * cos(2 * pi() * w.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * w.k * p.i / c.np)) AS im
  FROM {padded} p CROSS JOIN {out}_wk w CROSS JOIN plan c
  GROUP BY {pkeys}, w.k, w.w
), {out}_corr AS (
  SELECT {", ".join(f"b.{k}" for k in keys)}, s.t_idx,
         2.0 / c.np * sum(b.w * (b.re * cos(2 * pi() * b.k * (s.t_idx + c.pl) / c.np)
                               - b.im * sin(2 * pi() * b.k * (s.t_idx + c.pl) / c.np))) AS cval
  FROM {out}_bins b
  JOIN {src} s ON {bjoin}
  CROSS JOIN plan c
  GROUP BY {", ".join(f"b.{k}" for k in keys)}, s.t_idx, c.np
), {out} AS (
  SELECT {", ".join(f"s.{k}" for k in keys)}, s.t_idx, s.value - co.cval AS value
  FROM {src} s JOIN {out}_corr co ON {cojoin} AND co.t_idx = s.t_idx
)"""


def resample_full_ctes(padded, keys, out):
    """Rate-changing FFT resample of `{padded}` -> `{out}` (keys..., t_idx,
    value) of finallen samples per key, using the plan's num/ratio/newlen
    (Signal.resample / resample.py:43-102). Direct O(bins x time) DFT."""
    pkeys = ", ".join(f"p.{k}" for k in keys)
    bkeys = ", ".join(f"b.{k}" for k in keys)
    akeys = ", ".join(f"a.{k}" for k in keys)
    ykeys = ", ".join(f"y.{k}" for k in keys)
    return f"""
{out}_ks AS (
  SELECT unnest(generate_series(0, LEAST(c.np // 2, c.newlen // 2))) AS k
  FROM plan c
), {out}_bins AS (
  SELECT {pkeys}, k.k,
         sum(p.p * cos(2 * pi() * k.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * k.k * p.i / c.np)) AS im
  FROM {padded} p CROSS JOIN {out}_ks k CROSS JOIN plan c
  GROUP BY {pkeys}, k.k
), {out}_adj AS (
  -- rfft packed format: Im at DC and (even np) Nyquist is exactly 0;
  -- Nyquist-bin halve/double rule (resample.py:86-88); scale by ratio
  SELECT {bkeys}, b.k,
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
  FROM {out}_bins b CROSS JOIN plan c
), {out}_y AS (
  SELECT {akeys}, t.t,
    sum((CASE WHEN a.k = 0 OR (c.newlen % 2 = 0 AND a.k = c.newlen // 2)
              THEN 1.0 ELSE 2.0 END)
        * (a.re * cos(2 * pi() * a.k * t.t / c.newlen)
           - (CASE WHEN c.newlen % 2 = 0 AND a.k = c.newlen // 2 THEN 0.0 ELSE a.im END)
             * sin(2 * pi() * a.k * t.t / c.newlen))) / c.newlen AS v
  FROM {out}_adj a
  CROSS JOIN (SELECT unnest(generate_series(0, c2.newlen - 1)) AS t FROM plan c2) t
  CROSS JOIN plan c
  WHERE a.k <= c.newlen // 2
  GROUP BY {akeys}, t.t, c.newlen
), {out} AS (
  SELECT {ykeys}, y.t - c.rm0 AS t_idx, y.v AS value
  FROM {out}_y y CROSS JOIN plan c
  WHERE y.t >= c.rm0 AND y.t < c.newlen - c.rm1
)"""


def wavelet_ctes(rate, src, out):
    """Analytic wavelet trace `{out}` (channel, band, t_idx, zre, zim) for
    the human/hgOnly filterbank over `{src}` (a padded (channel, i, p)
    relation of length np). Mirrors Signal.waveletBands + Kernels.gaussian
    (wavelet_transform.py:15-37, 238-322)."""
    fstep = f"(1.0 / (c.np * (1.0 / {rate!r})))"
    return f"""
{out}_bands AS (
  SELECT CAST(row_number() OVER (ORDER BY cf) - 1 AS INT) AS band, cf, cf / 8.0 AS sd
  FROM (SELECT power(10, log10(4.0749286538265)
                        + g * (log10(200.0) - log10(4.0749286538265)) / 39) AS cf
        FROM (SELECT unnest(generate_series(0, 39)) AS g) t0) t1
  WHERE cf >= 70.0 AND cf <= 150.0
), {out}_gk AS (
  SELECT b.band, k.k,
         exp(-pow(k.k * {fstep} - b.cf, 2) / (2 * b.sd * b.sd)) AS g
  FROM (SELECT unnest(generate_series(0, c.np // 2)) AS k FROM plan c) k
  CROSS JOIN {out}_bands b CROSS JOIN plan c
), {out}_gnorm AS (
  SELECT gk.band,
         sqrt(sum((CASE WHEN gk.k = 0 OR gk.k = c.np // 2 THEN 1 ELSE 2 END)
                  * gk.g * gk.g)) AS nrm
  FROM {out}_gk gk CROSS JOIN plan c GROUP BY gk.band
), {out}_xbins AS (
  SELECT p.channel, k.k,
         sum(p.p * cos(2 * pi() * k.k * p.i / c.np)) AS re,
         -sum(p.p * sin(2 * pi() * k.k * p.i / c.np)) AS im
  FROM {src} p
  CROSS JOIN (SELECT unnest(generate_series(1, (c.np + 1) // 2 - 1)) AS k FROM plan c) k
  CROSS JOIN plan c
  GROUP BY p.channel, k.k
), {out}_zbins AS (
  SELECT x.channel, gk.band, x.k,
         2.0 * x.re * gk.g / gn.nrm AS re,
         2.0 * x.im * gk.g / gn.nrm AS im
  FROM {out}_xbins x
  JOIN {out}_gk gk ON gk.k = x.k
  JOIN {out}_gnorm gn ON gn.band = gk.band
), {out} AS (
  SELECT z.channel, z.band, t.t - c.pl AS t_idx,
         sum(z.re * cos(2 * pi() * z.k * t.t / c.np)
             - z.im * sin(2 * pi() * z.k * t.t / c.np)) / c.np AS zre,
         sum(z.re * sin(2 * pi() * z.k * t.t / c.np)
             + z.im * cos(2 * pi() * z.k * t.t / c.np)) / c.np AS zim
  FROM {out}_zbins z
  CROSS JOIN (SELECT unnest(generate_series(c2.pl, c2.pl + c2.n - 1)) AS t FROM plan c2) t
  CROSS JOIN plan c
  GROUP BY z.channel, z.band, t.t, c.np, c.pl
)"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q30_sql(new_freq=250.0, old_freq=1000.0):
    """resample(events rect @1000Hz -> 250Hz), FastPad, trim, round 6."""
    return f"""WITH {RECT}, {FASTLEN}, {resample_consts(new_freq, old_freq)},
{pad_ctes("rect", ["channel"], "padded")},
{resample_full_ctes("padded", ["channel"], "resamp")}
SELECT channel, CAST(NULL AS INT) AS band, t_idx, round(value, 6) AS value
FROM resamp ORDER BY channel, t_idx"""


def q31_sql(rate=1000.0, noise=60.0):
    """notch: y = x - irfft(fd * hamming_mask), linear-correction form."""
    return f"""WITH {RECT}, {FASTLEN}, {resample_consts(rate, rate)},
{pad_ctes("rect", ["channel"], "padded")},
{notch_ctes("padded", "rect", ["channel"], "notched", rate, noise)}
SELECT channel, CAST(NULL AS INT) AS band, t_idx, round(value, 6) AS value
FROM notched ORDER BY channel, t_idx"""


def q32_sql(rate=1000.0, value_expr="sqrt(zre * zre + zim * zim)"):
    return f"""WITH {RECT}, {FASTLEN}, {resample_consts(rate, rate)},
{pad_ctes("rect", ["channel"], "padded")},
{wavelet_ctes(rate, "padded", "ztrace")}
SELECT channel, band, t_idx, round({value_expr}, 6) AS value
FROM ztrace ORDER BY channel, band, t_idx"""


def q35_sql(rate=1000.0):
    return q32_sql(rate, value_expr="atan2(zim, zre)")


def q33_sql(rate=1000.0, final=250.0, noise=60.0, baseline=50):
    """Full preprocess_block (pipelines.py:15-111) + tutorial tail:
    resample(->1000, identity ratio: only the even-np Nyquist bin is halved,
    so y1 = x - X_nyq/(2 np) * (-1)^(t+pl)) -> notch -> trimmed-mean CAR ->
    wavelet amplitude (human, hgOnly) -> resample to 250 Hz -> z-score vs
    50-sample baseline -> average across bands."""
    return f"""WITH {RECT}, {FASTLEN}, {resample_consts(final, rate)},
{pad_ctes("rect", ["channel"], "padded0")},
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
{pad_ctes("y1", ["channel"], "padded1")},
{notch_ctes("padded1", "y1", ["channel"], "y2", rate, noise)},
car AS (
  SELECT t_idx,
         list_aggregate(list_slice(list_sort(list(value)), 2, 7), 'sum') / 6 AS car
  FROM y2 GROUP BY t_idx
), y3 AS (
  SELECT y2.channel, y2.t_idx, y2.value - ca.car AS value
  FROM y2 JOIN car ca ON ca.t_idx = y2.t_idx
),
{pad_ctes("y3", ["channel"], "padded3")},
{wavelet_ctes(rate, "padded3", "ztrace")},
amp AS (
  SELECT channel, band, t_idx, sqrt(zre * zre + zim * zim) AS value FROM ztrace
),
{pad_ctes("amp", ["channel", "band"], "padded4")},
{resample_full_ctes("padded4", ["channel", "band"], "resamp")},
stats AS (
  SELECT channel, band, avg(value) AS mu,
         sqrt(avg(value * value) - avg(value) * avg(value)) AS sd
  FROM resamp WHERE t_idx < {baseline} GROUP BY channel, band
)
SELECT r.channel, CAST(NULL AS INT) AS band, r.t_idx,
       round(avg((r.value - s.mu) / s.sd), 6) AS value
FROM resamp r JOIN stats s ON s.channel = r.channel AND s.band = r.band
GROUP BY r.channel, r.t_idx
ORDER BY r.channel, r.t_idx"""


QUERIES = {
    "q30_resample": q30_sql(),
    "q31_notch": q31_sql(),
    "q32_wavelet_amplitude": q32_sql(),
    "q33_pipeline_high_gamma": q33_sql(),
    "q35_wavelet_phase": q35_sql(),
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in QUERIES.items():
        if only and name not in only:
            continue
        duck = con.execute(sql).fetchdf()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark = pd.concat([pd.read_parquet(f) for f in files])
        keys = [c for c in ("channel", "band", "t_idx") if c in duck.columns]
        a = spark.sort_values(keys).reset_index(drop=True)
        b = duck.sort_values(keys).reset_index(drop=True)
        print(f"[{name}] spark={len(a)} duck={len(b)} rows")
        if len(a) != len(b):
            continue
        d = (a["value"] - b["value"]).abs()
        # spark dump rounds to 6 decimals: semantic agreement = diffs at most
        # one quantum of the 6th decimal (rounding-boundary flips)
        print(f"  max|diff|={d.max():.3e}  n>1.5e-6: {(d > 1.5e-6).sum()}"
              f"  n>1e-9: {(d > 1e-9).sum()}")
        if d.max() > 1.5e-6:
            bad = d[d > 1.5e-6].index[:5]
            print(a.loc[bad], "\n", b.loc[bad])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None)
