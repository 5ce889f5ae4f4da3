#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare (test tooling).

Usage:
  sbt "runMain graft.Verify <sfDir> /tmp/verify_out [q...]"
  python3 test-oracle/check_oracle.py <sfDir> /tmp/verify_out [q...]

For each dumped query: runs the oracle SQL from oracle_sql.json in DuckDB
(views over the sf parquet tables), loads the Spark parquet result, sorts
both row sets canonically, and compares schema + values exactly.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["lineitem", "orders", "customer", "nation", "region", "part",
          "supplier", "events", "documents", "embeddings"]


def canon(rows):
    def key(r):
        return tuple("\0N" if v is None else repr(v) for v in r)
    return sorted([tuple(r) for r in rows], key=key)


def eq_val(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"{name}: MISSING spark dump")
            n_bad += 1
            continue
        try:
            orows = con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_bad += 1
            continue
        srows = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
        a, b = canon(srows), canon(orows)
        if len(a) != len(b):
            print(f"{name}: ROWS spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if len(ra) != len(rb) or not all(eq_val(x, y) for x, y in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            print(f"{name}: VALUE MISMATCH at sorted row {bad[0]}:\n  spark={bad[1]}\n  oracle={bad[2]}")
            n_bad += 1
        else:
            print(f"{name}: OK ({len(a)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
