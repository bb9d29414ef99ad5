#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (builder-side dev tool
only — the Scala engine never depends on this).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/<name>/ parquet (Spark result) and <out>/oracle_sql.json, runs
each oracle against DuckDB views over the sf parquet tables, sorts columns
by name, and compares row-by-row.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_bad += 1
            continue
        erows = [[canon(x) for x in row] for row in
                 zip(*[exp.column(c).to_pylist() for c in ecols])] if exp.num_rows else []
        grows = [[canon(x) for x in row] for row in
                 zip(*[got.column(c).to_pylist() for c in gcols])] if got.num_rows else []
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
            n_bad += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; "
                  f"first at {i} (cols {ecols}):\n  spark={g}\n  duckdb={e}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(erows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
