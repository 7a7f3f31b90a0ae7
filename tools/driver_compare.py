#!/usr/bin/env python3
"""Replicates the DRIVER's correctness gate (not tools/compare.py's tuple
compare): reads each Verify parquet dump with pandas, runs the oracle SQL in
DuckDB, sorts columns by name, row-sorts BOTH frames with pandas sort_values
over all columns (this is the step that crashed on ndarray cells in round 2),
then compares row count, dtypes-kind schema, and exact cell values.

Usage: python3 tools/driver_compare.py /root/testdata/sf0.01 /tmp/out [name...]
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def read_dump(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise RuntimeError("no dump")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a.shape != b.shape:
        return False, "shape"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # the real driver hashes raw cell values, so int64 0 vs float64
            # 0.0 (e.g. a DuckDB HUGEINT window-sum pandas-converts to
            # float) is a HASH MISMATCH there even though it compares
            # numerically equal here — flag the kind divergence loudly
            if av.dtype.kind != bv.dtype.kind:
                return False, (f"col {c}: dtype kind {av.dtype.kind} != "
                               f"{bv.dtype.kind} (driver hash would differ)")
            av = av.astype(float)
            bv = bv.astype(float)
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                i = int(np.argmin(same))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
        else:
            same = av == bv
            if not np.asarray(same).all():
                i = int(np.argmin(np.asarray(same)))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    return True, ""


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = only or sorted(oracle)
    ok = fail = 0
    for name in names:
        sql = oracle.get(name)
        try:
            spark_df = read_dump(out_dir, name)
        except Exception as e:
            print(f"FAIL {name}: dump unreadable: {e}")
            fail += 1
            continue
        if sql is None:
            try:
                canon(spark_df)
                print(f"rows {name}: {len(spark_df)} (no oracle, sortable)")
            except Exception as e:
                print(f"FAIL {name}: rows-only sort crashed: {type(e).__name__} {e}")
                fail += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
            a, b = canon(spark_df), canon(oracle_df)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} != {list(b.columns)}")
            fail += 1
            continue
        eq, why = cells_equal(a, b)
        if eq:
            ok += 1
        else:
            print(f"FAIL {name}: {why}")
            fail += 1
    print(f"== {ok} ok, {fail} fail, {len(names)} total")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3:] if len(sys.argv) > 3 else None))
