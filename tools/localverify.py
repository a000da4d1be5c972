#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (Spark) into OUT_DIR, then executes each oracle_sql.json
entry in DuckDB over the same parquet tables and compares values exactly
(columns sorted by name, rows as-emitted). Usage:

    python3 tools/localverify.py [sfdir] [outdir] [--skip-spark] [only_query ...]
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
    else "/tmp/graft_verify"
SKIP_SPARK = "--skip-spark" in sys.argv
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_spark():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    names = " ".join(ONLY)
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR} {names}']
    r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                       text=True)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        sys.exit(1)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def compare(name, sql, con):
    res_dir = os.path.join(OUT_DIR, name)
    if not os.path.isdir(res_dir):
        return f"FAIL {name}: no spark output"
    mine = con.execute(
        f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}"
    mine, oracle = normalize(mine), normalize(oracle)
    if list(mine.columns) != list(oracle.columns):
        return (f"FAIL {name}: columns spark={list(mine.columns)} "
                f"oracle={list(oracle.columns)}")
    if len(mine) != len(oracle):
        return f"FAIL {name}: rows spark={len(mine)} oracle={len(oracle)}"
    schema_notes = []
    for c in mine.columns:
        if str(mine[c].dtype) != str(oracle[c].dtype):
            schema_notes.append(f"{c}: {mine[c].dtype} vs {oracle[c].dtype}")
    bad = []
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            idx = (~eq).idxmax()
            bad.append(f"{c} ({int((~eq).sum())} diff, e.g. row {idx}: "
                       f"{a[idx]!r} vs {b[idx]!r})")
    if bad:
        return f"FAIL {name}: value diffs: {'; '.join(bad[:5])}"
    note = f" [schema: {', '.join(schema_notes)}]" if schema_notes else ""
    return f"PASS {name} ({len(mine)} rows){note}"


def main():
    if not SKIP_SPARK:
        run_spark()
    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        msg = compare(name, sql, con)
        print(msg)
        failures += msg.startswith("FAIL")
    # queries without an oracle: rows-only
    for name in sorted(os.listdir(OUT_DIR)):
        p = os.path.join(OUT_DIR, name)
        if os.path.isdir(p) and name not in oracles:
            n = len(con.execute(
                f"SELECT 1 FROM read_parquet('{p}/*.parquet')").fetchall())
            print(f"ROWS {name}: {n} rows (no oracle)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
