"""Render the baseline-vs-final bench comparison table for the
optimization report.  Usage:
    python tools/bench_compare.py <baseline.json> <final.json>
Reads the LAST line of each file as the bench JSON."""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    return json.loads(open(path).read().strip().splitlines()[-1])


def main() -> None:
    base, now = load(sys.argv[1]), load(sys.argv[2])
    qb, qn = base["queries"], now["queries"]
    print(
        f"headline {base['value']} -> {now['value']} s "
        f"({base['value'] / now['value']:.3f}x); compute "
        f"{base['compute_total']} -> {now['compute_total']}; lifecycle "
        f"{base['lifecycle_total']} -> {now['lifecycle_total']}"
    )
    print(
        f"loadavg_start {now.get('loadavg_start')} cpus {now.get('cpus')} "
        f"default_parallelism {now.get('default_parallelism')}"
    )
    print()
    print("| query | baseline s | final s | speedup |")
    print("|---|---|---|---|")
    rows = sorted(
        ((qb[k] / qn[k], k) for k in qb if k in qn), reverse=True
    )
    for r, k in rows:
        print(f"| {k} | {qb[k]:.3f} | {qn[k]:.3f} | {r:.2f} |")
    import math

    gm = math.exp(
        sum(math.log(qb[k] / qn[k]) for k in qb if k in qn)
        / sum(1 for k in qb if k in qn)
    )
    print(f"\ngeomean speedup vs baseline: {gm:.3f}")


if __name__ == "__main__":
    main()
