#!/usr/bin/env python3
"""sf1-scale variant of tools/compare.py: a FRESH DuckDB connection per
oracle (a shared connection accumulates allocations and dies with
bad-alloc mid-suite at sf1 — SURVEY §6 round-8 note) plus a spill
temp_directory and a memory cap.

Usage: python3 tools/compare_fresh.py <sf_dir> <out_dir> [name...]
"""
import json
import os
import sys

import duckdb

from compare import TABLES, norm_rows


def run_one(sf_dir, out_dir, name, sql, low_mem=False, wide_mem=False):
    con = duckdb.connect()
    try:
        con.sql("SET temp_directory='/tmp/duck_spill'")
        con.sql("SET memory_limit='24GB'")
        if low_mem:
            # heavy multi-CTE oracles (pp_select_v3 at sf1) OOM with the
            # default thread count: DuckDB's blocking-operator memory
            # scales with threads. Fewer threads + no insertion-order
            # preservation + a bigger cap lets the same SQL complete.
            con.sql("SET threads=4")
            con.sql("SET preserve_insertion_order=false")
            con.sql("SET memory_limit='100GB'")
        if wide_mem:
            # ...and the OPPOSITE regime exists too: the bp_bpe_encode
            # windowed-CTE chain at sf1 bad-allocs under threads=4 but
            # completes in ~30 s at threads=16 (r13 find — allocation
            # pattern, not total memory: 119 GB was free at the failure).
            con.sql("SET threads=16")
            con.sql("SET preserve_insertion_order=false")
            con.sql("SET memory_limit='100GB'")
        for t in TABLES:
            # driver fixtures are single files; ScaleData writes Spark
            # directory-parquet — glob in that case
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        o = con.sql(sql)
        ocols, orows = o.columns, o.fetchall()
        m = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        mcols, mrows = m.columns, m.fetchall()
    finally:
        con.close()
    oc, orws = norm_rows(ocols, orows)
    mc, mrws = norm_rows(mcols, mrows)
    if oc != mc:
        return False, f"columns oracle={oc} mine={mc}"
    if len(orws) != len(mrws):
        return False, f"rows oracle={len(orws)} mine={len(mrws)}"
    if orws != mrws:
        bad = next(i for i, (a, b) in enumerate(zip(orws, mrws)) if a != b)
        return False, f"first diff at sorted-row {bad}: oracle={orws[bad]} mine={mrws[bad]}"
    return True, f"{len(orws)} rows"


def main(sf_dir, out_dir, only):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in sorted(oracle) if not only or n in only]
    ok = fail = 0
    for name in names:
        try:
            good, msg = run_one(sf_dir, out_dir, name, oracle[name])
        except duckdb.OutOfMemoryException:
            try:
                good, msg = run_one(sf_dir, out_dir, name, oracle[name],
                                    low_mem=True)
                msg += ", low-mem retry"
            except duckdb.OutOfMemoryException:
                try:
                    good, msg = run_one(sf_dir, out_dir, name, oracle[name],
                                        wide_mem=True)
                    msg += ", wide-mem retry"
                except Exception as e:
                    good, msg = False, f"exec error (after both retries): {e}"
            except Exception as e:
                good, msg = False, f"exec error (after low-mem retry): {e}"
        except Exception as e:
            good, msg = False, f"exec error: {e}"
        if good:
            print(f"ok   {name} ({msg})")
            ok += 1
        else:
            print(f"FAIL {name}: {msg}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {len(names)} total")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
