#!/usr/bin/env python3
"""Order-invariance sweep over the full query registry — the empirical
audit behind the r16 float-parity inventory (NOTES.md).

Two modes, both comparing EXACT typed values (the driver hashes doubles
bitwise, so "close" is a fail):

  spark mode:  python3 tools/det_sweep.py spark <outDirA> <outDirB>
    Compares two graft.Verify output trees produced under DIFFERENT
    parallelism (e.g. SPARK_GRAFT_CPUS=3 vs 13 — different task layout,
    different partial-aggregate merge order). Any query whose result
    differs carries an order-dependent float somewhere in its plan.

  duck mode:   python3 tools/det_sweep.py duck <sfDir> <outDir>
    Runs every oracle SQL twice — PRAGMA threads=1 vs threads=8 — and
    compares. Any difference means the oracle itself is merge-order-
    dependent (the other half of the q377 failure mode: parity needs
    BOTH engines order-invariant, not just Spark).
"""
import glob
import json
import os
import sys

import pandas as pd


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def diff(a, b):
    a, b = canon(a), canon(b)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in "iu" and bv.dtype.kind in "iu":
            av, bv = av.astype("int64"), bv.astype("int64")
        elif av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype("float64"), bv.astype("float64")
        try:
            bad = ~(av.eq(bv) | (av.isna() & bv.isna()))
        except (TypeError, ValueError):
            bad = pd.Series([x != y and not (pd.isna(x) and pd.isna(y))
                             for x, y in zip(av, bv)])
        if bad.any():
            i = bad.idxmax()
            return f"VALUE col={c} row={i} {av[i]!r} vs {bv[i]!r} (n={int(bad.sum())})"
    return None


def read_out(d):
    files = glob.glob(f"{d}/*.parquet")
    return pd.concat([pd.read_parquet(f) for f in files]) if files else None


def spark_mode(dir_a, dir_b):
    names = sorted(os.path.basename(d.rstrip("/"))
                   for d in glob.glob(f"{dir_a}/*/"))
    ok = fail = skip = 0
    for name in names:
        a, b = read_out(f"{dir_a}/{name}"), read_out(f"{dir_b}/{name}")
        if a is None or b is None:
            print(f"[{name}] MISSING in {'A' if a is None else 'B'}")
            skip += 1
            continue
        d = diff(a, b)
        if d:
            print(f"[{name}] ORDER-DEPENDENT: {d}")
            fail += 1
        else:
            ok += 1
    print(f"\nspark sweep: {ok} invariant, {fail} order-dependent, {skip} missing")
    return fail


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_mode(sf_dir, out_dir):
    import duckdb
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    def run_all(threads):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        res = {}
        for name, sql in sorted(oracles.items()):
            try:
                res[name] = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                res[name] = f"ERR {e}"
        con.close()
        return res

    r1, r8 = run_all(1), run_all(8)
    ok = fail = 0
    for name in sorted(oracles):
        a, b = r1[name], r8[name]
        if isinstance(a, str) or isinstance(b, str):
            print(f"[{name}] {a if isinstance(a, str) else b}")
            fail += 1
            continue
        d = diff(a, b)
        if d:
            print(f"[{name}] ORACLE ORDER-DEPENDENT: {d}")
            fail += 1
        else:
            ok += 1
    print(f"\nduck sweep: {ok} invariant, {fail} order-dependent/err")
    return fail


def emitted_classify(out_dir):
    """Classify every float column each query EMITS (r17, VERDICT item 6):

      gridK — every value is the correctly-rounded double of a K-decimal
              number (a floor-grid / rounded emission; cross-engine parity
              then rests only on the OPERAND being bit-identical)
      raw   — full-precision doubles (must be exact-by-replicated-
              expression, like the q91 quantile interpolation, or the
              driver's bitwise hash can flip)

    Returns {query: [(col, class, n)]} for queries with any float column.
    """
    import numpy as np
    inv = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        df = read_out(d)
        if df is None:
            continue
        cols = []
        for c in df.columns:
            if df[c].dtype.kind != "f":
                continue
            v = df[c].dropna().values.astype("float64")
            if len(v) == 0:
                cols.append((c, "all-null", 0))
                continue
            onk = None
            for k in range(0, 10):
                g = np.floor(v * 10 ** k + 0.5) / 10 ** k
                if np.array_equal(g, v):
                    onk = k
                    break
            cols.append((c, f"grid{onk}" if onk is not None else "raw", len(v)))
        if cols:
            inv[name] = cols
    return inv


def emitted_mode(out_dir, sf_dir=None):
    """Print the emitted-float inventory; with sf_dir, rerun ONLY the
    float-emitting queries' oracles at extreme thread counts (1 vs 32) and
    compare bitwise against the Verify outputs — the targeted regression
    guard for the r17 grid conversions."""
    inv = emitted_classify(out_dir)
    raw = {q: cs for q, cs in inv.items() if any(k == "raw" for _, k, _ in cs)}
    print(f"emitted-float queries: {len(inv)}  (raw-valued: {len(raw)})")
    for q, cs in sorted(raw.items()):
        print(f"  [raw] {q}: " + ", ".join(f"{c}={k}(n={n})" for c, k, n in cs))
    if sf_dir is None:
        return 0
    import duckdb
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    targets = sorted(set(inv) & set(oracles))
    fail = 0
    for threads in (1, 32):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in targets:
            spark_df = read_out(f"{out_dir}/{name}")
            try:
                duck_df = con.execute(oracles[name]).df()
            except Exception as e:  # noqa: BLE001
                print(f"[{name}] threads={threads} ORACLE ERR {e}")
                fail += 1
                continue
            d = diff(spark_df, duck_df)
            if d:
                print(f"[{name}] threads={threads} PARITY: {d}")
                fail += 1
        con.close()
    print(f"\nemitted sweep: {len(targets)} float-emitting queries x "
          f"threads 1/32: {fail} failures")
    return fail


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "spark":
        rc = spark_mode(*sys.argv[2:4])
    elif mode == "duck":
        rc = duck_mode(*sys.argv[2:4])
    elif mode == "emitted":
        rc = emitted_mode(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown mode {mode}")
    sys.exit(1 if rc else 0)
