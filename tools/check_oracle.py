#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark). This
script replays what the driver does per round: run graft.Verify to dump
each SparkEntry query result to parquet + oracle_sql.json, then run each
oracle SQL in DuckDB over the same testdata tables and compare rows,
schema (column names), and a value hash with columns sorted by name.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--no-verify] [names...]
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pandas as pd

# position-independent flag parse: `check_oracle.py --no-verify` must not
# consume the flag as sfDir and launch a full Verify run against it
FLAGS = set(a for a in sys.argv[1:] if a.startswith("--"))
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT_DIR = _pos[1] if len(_pos) > 1 else "/tmp/verify_out"
ONLY = _pos[2:]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    names = " ".join(ONLY)
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR} {names}'.rstrip()]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, cwd="/root/repo", env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so hashing is representation-independent
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.map(cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    if "--no-verify" not in FLAGS:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    names = ONLY or sorted(oracle)
    n_pass = n_fail = 0
    for name in names:
        pq_dir = f"{OUT_DIR}/{name}"
        if not os.path.isdir(pq_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        got = duckdb.sql(f"SELECT * FROM '{pq_dir}/*.parquet'").df()
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print("  spark:", g.loc[i].to_dict())
                print("  duck :", w.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
