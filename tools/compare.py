#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the testdata tables and diffs against the Verify parquet dumps.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # subset runs compare what was dumped, not the whole suite
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    ok = fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
            m = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            mcols, mrows = m.columns, m.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            fail += 1
            continue
        oc, orws = norm_rows(ocols, orows)
        mc, mrws = norm_rows(mcols, mrows)
        if oc != mc:
            print(f"FAIL {name}: columns oracle={oc} mine={mc}")
            fail += 1
        elif len(orws) != len(mrws):
            print(f"FAIL {name}: rows oracle={len(orws)} mine={len(mrws)}")
            fail += 1
        elif orws != mrws:
            bad = next(i for i, (a, b) in enumerate(zip(orws, mrws)) if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  oracle: {orws[bad]}")
            print(f"  mine:   {mrws[bad]}")
            fail += 1
        else:
            print(f"ok   {name} ({len(orws)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
