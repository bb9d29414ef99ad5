#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (builder-side dev tool
only — the Scala engine never depends on this).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Faithful to the driver's comparator as reverse-engineered from r01:
  * Spark result read from parquet via pandas/pyarrow (DECIMAL columns stay
    decimal.Decimal objects, arrays stay numpy arrays);
  * oracle run in DuckDB and fetched via .df() (DECIMAL → float64,
    HUGEINT → float64/object);
  * columns sorted by name, rows sorted by all columns (raises on
    unhashable array cells — exactly like the driver did on r01 q51);
  * values compared by type-sensitive repr, so Decimal('1.2000') vs 1.2
    FAILS here even though the values are equal — that is the point.
"""
import datetime
import glob
import math
import json
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, Decimal):
        return f"Decimal:{v}"  # type-sensitive on purpose (driver hash is)
    if isinstance(v, (float, np.floating)):
        return "NaN" if math.isnan(v) else repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, str):
        return f"str:{v}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"{type(v).__name__}:{v}"


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return cols, [[canon(v) for v in row] for row in df.itertuples(index=False)]


def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            ecols, erows = frame_rows(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            gcols, grows = frame_rows(
                pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"FAIL {name}: spark result error: {e}")
            n_bad += 1
            continue
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_bad += 1
            continue
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
            n_bad += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows))
               if g != e]
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
