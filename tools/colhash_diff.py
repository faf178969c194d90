#!/usr/bin/env python3
"""Diff two graft.Verify output trees by their `_colhash.json` artifacts
(r17): localizes a parity mismatch to query -> column without reading any
parquet. This is the forensic step a driver hash-red starts with — run
Verify locally, then diff against the driver's tree (or a prior run).

Usage: python3 tools/colhash_diff.py <outDirA> <outDirB>

Exit 1 if any query differs. For each differing query prints the columns
whose value hashes differ (schema/row-count differences first), plus the
first rows of each side when available.

Artifact format v2 (r18): per-column hashes are order-free 128-bit sums of
per-row md5s, computed distributed (no driver collect); a `__row__`
pseudo-column hashes full row tuples so a re-pairing of identical
per-column multisets still flips a hash. v2 trees are NOT comparable with
v1 (r17) trees — regenerate both sides with the current graft.Verify.
A `{"error": ...}` artifact marks a colhash failure (vs a missing file).
"""
import glob
import json
import os
import sys


def load(tree):
    out = {}
    for p in glob.glob(f"{tree}/*/_colhash.json"):
        name = os.path.basename(os.path.dirname(p))
        try:
            with open(p) as f:
                out[name] = json.load(f)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)}
    return out


def main(dir_a, dir_b):
    a, b = load(dir_a), load(dir_b)
    names = sorted(set(a) | set(b))
    bad = 0
    for n in names:
        if n not in a or n not in b:
            print(f"[{n}] MISSING in {'A' if n not in a else 'B'}")
            bad += 1
            continue
        ja, jb = a[n], b[n]
        if "error" in ja or "error" in jb:
            print(f"[{n}] ARTIFACT ERROR: {ja.get('error') or jb.get('error')}")
            bad += 1
            continue
        if ja.get("n") != jb.get("n"):
            print(f"[{n}] ROW COUNT {ja.get('n')} vs {jb.get('n')}")
            bad += 1
            continue
        ca, cb = ja.get("columns", {}), jb.get("columns", {})
        if set(ca) != set(cb):
            print(f"[{n}] SCHEMA {sorted(ca)} vs {sorted(cb)}")
            bad += 1
            continue
        diff_cols = [c for c in sorted(ca) if ca[c] != cb[c]]
        if diff_cols:
            print(f"[{n}] VALUE HASH differs in columns: {', '.join(diff_cols)}")
            for side, j in (("A", ja), ("B", jb)):
                head = j.get("head", [])
                if head:
                    print(f"    {side} head[0]: {head[0]}")
            bad += 1
    print(f"\ncolhash diff: {len(names)} queries, {bad} differing")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
