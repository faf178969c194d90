#!/usr/bin/env python3
"""Stage-by-stage debugger for the DFT oracle SQL (dev-only).

Pulls the rect CTE from DuckDB, runs the trusted numpy reimplementation
(gen_dsp_golden) on it, and compares against both the Spark verify output and
the SQL oracle's intermediate CTEs.
"""
import glob
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "tools")
from gen_dsp_golden import resample, npads, smart_pad, next_fast_len

import proto_oracle as po

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in po.TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

# stage 0: rect from SQL
rect = con.execute(f"WITH {po.RECT} SELECT * FROM rect ORDER BY channel, t_idx").fetchdf()
chans = sorted(rect.channel.unique())
series = {c: rect[rect.channel == c].sort_values("t_idx").value.to_numpy() for c in chans}
n = len(series[chans[0]])
print(f"rect: {len(chans)} channels x {n} samples")

# stage 1: numpy resample on rect values vs spark parquet
spark = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{OUT}/q30_resample/*.parquet")])
spark = spark.sort_values(["channel", "t_idx"]).reset_index(drop=True)
exp = []
for c in chans:
    y = resample(series[c], 250.0, 1000.0)
    exp.append(pd.DataFrame({"channel": c, "t_idx": np.arange(len(y)), "value": np.round(y, 6)}))
exp = pd.concat(exp).reset_index(drop=True)
print(f"numpy rows={len(exp)} spark rows={len(spark)}")
if len(exp) == len(spark):
    d = (exp.value.to_numpy() - spark.value.to_numpy())
    print(f"numpy-vs-spark max|diff| = {np.abs(d).max():.3e}")
else:
    print("ROW MISMATCH between numpy-on-rect and spark")

# stage 2: SQL plan constants vs numpy
plan = con.execute(
    f"WITH {po.RECT}, {po.FASTLEN}, {po.resample_consts(250.0, 1000.0)} SELECT * FROM plan"
).fetchdf()
print("\nSQL plan:", plan.to_dict("records"))
pads, to_removes, new_len = npads(n, "fast", ratio=float(int(np.ceil(n * 0.25))) / n)
print("numpy: n=%d np=%d pl=%d pr=%d num=%d newlen=%d finallen=%d rm=%s" % (
    n, next_fast_len(n), pads[0], pads[1], int(np.ceil(n * 0.25)),
    new_len, int(round(float(int(np.ceil(n * 0.25))) / n * n)), to_removes))

# stage 3: padded CTE vs numpy smart_pad, channel 0
padded = con.execute(
    f"WITH {po.RECT}, {po.FASTLEN}, {po.resample_consts(250.0, 1000.0)}, {po.PADDED} "
    "SELECT i, p FROM padded WHERE channel = 0 ORDER BY i").fetchdf()
np_pad = smart_pad(series[0], pads)
print(f"\npadded: sql={len(padded)} numpy={len(np_pad)}")
m = min(len(padded), len(np_pad))
dp = np.abs(padded.p.to_numpy()[:m] - np_pad[:m])
print(f"padded max|diff|={dp.max():.3e} at i={dp.argmax()}")
bad = np.where(dp > 1e-9)[0]
print(f"n bad: {len(bad)}; first bad idx: {bad[:10]}")
