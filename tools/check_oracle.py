#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views named
after the fixture tables, and compares values column-name-sorted (the
driver hashes values after sorting columns by name; row order matters).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: bit-inequality must show up
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    ok = bad = 0
    import os
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # partial verify run (Verify's query-filter arg)
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            bad += 1
            continue
        mismatch = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = norm(got[c].iloc[i]), norm(want[c].iloc[i])
                if a != b:
                    mismatch = (i, c, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={a} duckdb={b}")
            bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} failed")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
