#!/usr/bin/env python3
"""Scaling-exponent table between two per-entry bench dumps
(bench_full.json format: {entry: seconds}).

    python3 tools/scaling.py <small.json> <big.json> [decades] [--md]

`decades` is the data-scale ratio in powers of ten between the two runs
(default 1.0, i.e. sf0.1 -> sf1). For each entry prints

    exponent = log10(t_big / t_small) / decades

so 1.0 = linear, <1 = sublinear (fixed overhead amortizing), >1 =
super-linear. Entries under MIN_SECONDS in the SMALL run are dominated
by fixed per-query overhead (session setup, plan compile, replay
machinery) and get a `fixed` tag instead of a flag; everything else
with exponent > FLAG_AT is flagged `SUPRA` for a hand audit — the
cheap way to catch a hidden quadratic tail before quoting decade-scale
readiness. Dev-only driver-side tool, like check.py.
"""
import json
import math
import sys

MIN_SECONDS = 1.0   # below this, fixed overhead >> data-dependent work
FLAG_AT = 1.15      # linear-with-logs tolerance


def main():
    small_p, big_p = sys.argv[1], sys.argv[2]
    decades = float(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("-") else 1.0
    md = "--md" in sys.argv
    def load(p):
        # Drop Bench's in-run retry records (_rN_<entry>) and calib meta
        # keys; the plain entry key already holds the median of retries.
        return {k: v for k, v in json.load(open(p)).items()
                if not k.startswith("_")}
    small = load(small_p)
    big = load(big_p)
    shared = sorted(set(small) & set(big))
    missing = sorted(set(small) ^ set(big))
    rows = []
    for name in shared:
        ts, tb = small[name], big[name]
        exp = math.log10(tb / ts) / decades if ts > 0 else float("nan")
        # `fixed`: small at BOTH scales — per-query fixed overhead, the
        # exponent is meaningless. A small entry that grows LARGE is the
        # opposite (a data-dependent blow-up) and must flag as SUPRA.
        tag = ""
        if exp > FLAG_AT:
            tag = "fixed" if tb < 3 * MIN_SECONDS else "SUPRA"
        rows.append((name, ts, tb, exp, tag))
    rows.sort(key=lambda r: -r[3])
    if md:
        print("| entry | t_small s | t_big s | exponent | tag |")
        print("|---|---|---|---|---|")
        for name, ts, tb, exp, tag in rows:
            print(f"| {name} | {ts:.3f} | {tb:.3f} | {exp:.2f} | {tag} |")
    else:
        for name, ts, tb, exp, tag in rows:
            print(f"{exp:6.2f}  {ts:8.3f} -> {tb:8.3f}  {tag:5s}  {name}")
    supra = [r for r in rows if r[4] == "SUPRA"]
    fixed = [r for r in rows if r[4] == "fixed"]
    print(f"\n== {len(shared)} shared entries, {len(supra)} SUPRA "
          f"(>{FLAG_AT}x/decade above {MIN_SECONDS}s), "
          f"{len(fixed)} fixed-overhead-dominated, "
          f"{len(missing)} unshared: {missing[:6]}")


if __name__ == "__main__":
    main()
