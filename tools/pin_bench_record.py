#!/usr/bin/env python3
"""Promote quiet bench runs to the committed bench_full_r<N>.json record.

graft.Bench writes every FULL run to bench_full_run.json (gitignored) and
never touches the committed record — promotion is this deliberate step.
Feed it N run files captured on a quiet host; it pins a per-gate value
that is robust against the r14 failure mode (min-of-N harvesting 2-3.5x
fluke minima on a whole gate family and manufacturing phantom risers):

  pinned[gate] = min of runs, UNLESS that min is < 0.5x the median of the
                 constituent runs (a fluke window), in which case the
                 second-smallest value is pinned instead.

It ALSO pins the per-gate MEDIAN of the constituent runs ("medians" in
the output). The min is the structural round-over-round comparator; the
median is what graft.Bench's 2x contention guard keys on — a min pinned
on a fast morning host made the guard re-run every CPU-bound sub-second
gate on a slower session host (r16 finding #2), while the median tracks
what a typical quiet run actually measures.

It then sanity-checks the pinned map against the previous committed
record: any gate pinned <0.45x the prior record is listed loudly (history
says whole-suite medians drift ~5-7% run-over-run; a 2x+ drop on a gate
nobody touched is a measurement artifact until proven otherwise).

Usage:
  python3 tools/pin_bench_record.py --out bench_full_r15.json run1.json run2.json ...
  (add --prior bench_full_rNN.json to override the newest committed record;
   --allow 'gate1,gate2' acknowledges genuinely-improved gates)
"""
import argparse, json, re, statistics, sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load(p):
    d = json.loads(Path(p).read_text())
    return {k: v for k, v in d["queries"].items() if v >= 0}, d


def newest_record():
    best = None
    for f in REPO.glob("bench_full_r*.json"):
        m = re.fullmatch(r"bench_full_r(\d+)\.json", f.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), f)
    return best[1] if best else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--prior")
    ap.add_argument("--allow", default="",
                    help="comma list of gates allowed to beat prior by >2.2x")
    a = ap.parse_args()
    allow = {g for g in a.allow.split(",") if g}

    loaded = [load(p) for p in a.runs]
    runs = [ok for ok, _ in loaded]
    raw_gates = set().union(*[set(d["queries"]) for _, d in loaded])
    gates = set().union(*[set(r) for r in runs])
    # present in a run file but failed (v<0) in EVERY run — would
    # otherwise vanish silently from the pinned record
    always_failed = sorted(raw_gates - gates)
    missing = [g for g in gates if any(g not in r for r in runs)]
    if missing:
        print(f"WARN: {len(missing)} gates absent/failed in some run: "
              f"{sorted(missing)[:8]}...", file=sys.stderr)

    pinned, medians, demoted = {}, {}, []
    for g in sorted(gates):
        vals = sorted(r[g] for r in runs if g in r)
        med = statistics.median(vals)
        medians[g] = med
        if len(vals) >= 3 and vals[0] < 0.5 * med:
            pinned[g] = vals[1]          # fluke window: pin 2nd-smallest
            demoted.append((g, vals[0], vals[1], med))
        else:
            pinned[g] = vals[0]
    for g, fluke, kept, med in demoted:
        print(f"fluke-min demoted: {g}  min={fluke:.2f} -> pinned={kept:.2f} "
              f"(median {med:.2f})")

    prior_path = Path(a.prior) if a.prior else newest_record()
    suspect, disappeared = [], []
    if prior_path and prior_path.exists():
        prior = load(prior_path)[0]
        # a gate in the prior record but absent from every run (or failed
        # in every run) must not vanish silently — the total would shrink
        # and round-over-round comparisons mislead
        disappeared = sorted(g for g in prior if g not in pinned)
        bad_gone = [g for g in disappeared if g not in allow]
        if bad_gone:
            print(f"\nREFUSING to pin: {len(bad_gone)} gates present in the "
                  f"prior record ({prior_path.name}) are absent from every "
                  "run — the record would quietly shrink. Pass --allow for "
                  "gates deliberately removed:", file=sys.stderr)
            for g in bad_gone:
                state = "failed in all runs" if g in always_failed else "absent"
                print(f"  {g} ({state})", file=sys.stderr)
            sys.exit(2)
        for g, v in pinned.items():
            pv = prior.get(g)
            if pv and pv > 0.3 and v < 0.45 * pv and g not in allow:
                suspect.append((g, v, pv))
    if suspect:
        print(f"\nREFUSING to pin: {len(suspect)} gates beat the prior record "
              f"({prior_path.name}) by >2.2x — measurement artifact until "
              "explained. Re-run on a quiet host or pass --allow for gates "
              "with a real code-change explanation:", file=sys.stderr)
        for g, v, pv in suspect:
            print(f"  {g}: pinned {v:.2f} vs prior {pv:.2f}", file=sys.stderr)
        sys.exit(2)

    total = sum(pinned.values())
    qs = ",".join(f'"{k}":{v:.3f}' for k, v in pinned.items())
    ms = ",".join(f'"{k}":{v:.3f}' for k, v in medians.items())
    sf = loaded[0][1].get("sf", "")
    # deliberate removals (--allow) are not failures; non-allowed
    # disappearances hard-exit above, so they never reach this line
    failed = len([g for g in always_failed if g not in allow]) + \
        len([g for g in disappeared
             if g not in allow and g not in always_failed])
    line = (f'{{"metric":"total","value":{total:.3f},"unit":"sec",'
            f'"queries":{{{qs}}},"medians":{{{ms}}},"sf":"{sf}",'
            f'"failed":{failed},"pinned_from":{len(runs)}}}')
    Path(a.out).write_text(line + "\n")
    print(f"\npinned {len(pinned)} gates, total {total:.1f} s "
          f"(min over {len(runs)} runs, {len(demoted)} fluke minima demoted, "
          f"{failed} dropped/failed) -> {a.out}")


if __name__ == "__main__":
    main()
