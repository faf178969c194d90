#!/usr/bin/env python3
"""Dev-time replica of the driver's correctness gate: for each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same sf dir and
compare values exactly (sorted columns, sorted rows).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def oracle_type_errors(rel):
    """Driver replica: DuckDB HUGEINT/DECIMAL hash differently from Spark
    int64/double — any such column in an oracle result is an automatic
    fail (wrap the aggregate in CAST(... AS BIGINT) oracle-side)."""
    bad = []
    for c, ty in zip(rel.columns, rel.types):
        t = str(ty)
        if t == "HUGEINT" or t.startswith("DECIMAL"):
            bad.append(f"{c}:{t}")
    return bad


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # driver hashes typed values — int-kind vs int-kind must agree on
        # width; float compare is EXACT (the driver hashes doubles bitwise)
        if av.dtype.kind in "iu" and bv.dtype.kind in "iu":
            av, bv = av.astype("int64"), bv.astype("int64")
        elif av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype("float64"), bv.astype("float64")
        bad = ~(av.eq(bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = bad.idxmax()
            return (f"VALUE MISMATCH col={c} row={i} "
                    f"spark={av[i]!r} duck={bv[i]!r} "
                    f"(n_bad={int(bad.sum())})")
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    import glob
    import os
    ok = fail = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[{name}] NO OUTPUT PARQUET")
            fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"[{name}] rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY (suspicious)'}")
            ok += 1 if len(spark_df) > 0 else 0
            fail += 0 if len(spark_df) > 0 else 1
            continue
        try:
            rel = con.sql(oracles[name])
            type_errs = oracle_type_errors(rel)
            duck_df = rel.fetchdf()
        except Exception as e:
            print(f"[{name}] ORACLE SQL ERROR: {e}")
            fail += 1
            continue
        if type_errs:
            print(f"[{name}] FAIL: ORACLE TYPE (driver hash mismatch): "
                  f"{type_errs}")
            fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"[{name}] FAIL: {err}")
            fail += 1
        else:
            print(f"[{name}] OK ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
