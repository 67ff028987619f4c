#!/usr/bin/env python
"""Bench-regression gate: fail when any shared query slows >factor vs a
reference bench, at comparable steal.

Usage:
    python bench_gate.py NEW.json REF.json [--factor 1.5] [--max-steal 1.0]

Accepts either format:
- a raw ``bench.py`` JSON line (keys: queries, steal_pct, ...)
- a driver ``BENCH_r{N}.json`` (the same object under the "parsed" key)

Steal guard: hypervisor steal waves inflate wall times ~10x on this host
class; a run whose steal_pct exceeds --max-steal is WEATHER, not a
regression — the gate reports and exits 0 (rerun at calm steal instead of
chasing phantom slowdowns).

Exit codes: 0 = no regression (or weather-skipped), 1 = regression(s),
2 = usage/parse error.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise ValueError(f"{path}: no 'queries' key (not a bench JSON?)")
    return d


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("new")
    ap.add_argument("ref")
    ap.add_argument("--factor", type=float, default=1.5,
                    help="fail ratio: new/ref above this is a regression")
    ap.add_argument("--max-steal", type=float, default=1.0,
                    help="steal_pct above this on either run = weather, "
                         "gate skips (exit 0)")
    args = ap.parse_args(argv)

    try:
        new, ref = load_bench(args.new), load_bench(args.ref)
    except (OSError, ValueError, json.JSONDecodeError) as e:
        print(f"bench_gate: {e}", file=sys.stderr)
        return 2

    for label, d in (("new", new), ("ref", ref)):
        steal = float(d.get("steal_pct", 0.0))
        if steal > args.max_steal:
            print(
                f"bench_gate: SKIP — {label} run recorded steal_pct="
                f"{steal}% > {args.max_steal}% (hypervisor weather; rerun "
                "at calm steal before judging regressions)"
            )
            return 0

    shared = sorted(set(new["queries"]) & set(ref["queries"]))
    if not shared:
        print("bench_gate: no shared queries between runs", file=sys.stderr)
        return 2
    regressions, improved = [], 0
    for q in shared:
        nv, rv = float(new["queries"][q]), float(ref["queries"][q])
        if rv <= 0:
            continue
        ratio = nv / rv
        if ratio > args.factor:
            regressions.append((q, rv, nv, ratio))
        elif ratio < 1.0:
            improved += 1
    print(
        f"bench_gate: {len(shared)} shared queries, {improved} faster, "
        f"{len(regressions)} regressed >{args.factor}x "
        f"(steal new={new.get('steal_pct')}% ref={ref.get('steal_pct')}%)"
    )
    for q, rv, nv, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"  REGRESSION {q}: {rv:.3f}s -> {nv:.3f}s ({ratio:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
