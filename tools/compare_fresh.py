#!/usr/bin/env python3
"""sf1-scale variant of tools/compare.py: a FRESH DuckDB connection per
oracle (a shared connection accumulates allocations and dies with
bad-alloc mid-suite at sf1 — SURVEY §6 round-8 note) plus a spill
temp_directory and a memory cap.

By default every oracle additionally runs in its OWN python subprocess:
one DuckDB segfault or allocator corruption (observed once at sf1 after
a low-mem retry, r13) then kills only that gate's process instead of
cascading bad-allocs through every later oracle. `--in-process` restores
the single-process loop (faster for small sweeps on known-good oracles).

Usage: python3 tools/compare_fresh.py <sf_dir> <out_dir> [--in-process] [name...]
"""
import json
import os
import subprocess
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


def run_with_retries(sf_dir, out_dir, name, sql):
    """The three-rung memory protocol: default -> low-mem -> wide-mem."""
    try:
        return run_one(sf_dir, out_dir, name, sql)
    except duckdb.OutOfMemoryException:
        try:
            good, msg = run_one(sf_dir, out_dir, name, sql, low_mem=True)
            return good, msg + ", low-mem retry"
        except duckdb.OutOfMemoryException:
            try:
                good, msg = run_one(sf_dir, out_dir, name, sql, wide_mem=True)
                return good, msg + ", wide-mem retry"
            except Exception as e:
                return False, f"exec error (after both retries): {e}"
        except Exception as e:
            return False, f"exec error (after low-mem retry): {e}"
    except Exception as e:
        return False, f"exec error: {e}"


def main(sf_dir, out_dir, only, isolate=True):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in sorted(oracle) if not only or n in only]
    ok = fail = 0
    for name in names:
        if isolate:
            # one process per oracle: a segfault (negative returncode)
            # or a poisoned allocator dies with this gate only
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 sf_dir, out_dir, "--in-process", name],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = (r.stdout.strip().splitlines() or [""])[0]
            if r.returncode == 0 and line.startswith("ok"):
                print(line)
                ok += 1
            else:
                detail = line if line else (r.stderr.strip().splitlines()
                                            or ["no output"])[-1]
                if r.returncode < 0:
                    detail += f" [subprocess died with signal {-r.returncode}]"
                print(f"FAIL {name}: {detail}" if not line.startswith("FAIL")
                      else detail)
                fail += 1
        else:
            good, msg = run_with_retries(sf_dir, out_dir, name, oracle[name])
            if good:
                print(f"ok   {name} ({msg})")
                ok += 1
            else:
                print(f"FAIL {name}: {msg}")
                fail += 1
    print(f"\n{ok} ok, {fail} fail, {len(names)} total")
    return 1 if fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    in_process = "--in-process" in args
    args = [a for a in args if a != "--in-process"]
    sys.exit(main(args[0], args[1], set(args[2:]), isolate=not in_process))
