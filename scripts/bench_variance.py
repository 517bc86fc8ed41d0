"""Compare two bench.py JSON outputs and report per-query variance.

Usage: python scripts/bench_variance.py run1.json run2.json [pct]

Flags queries whose two timings differ by more than ``pct`` (default 30%)
relative to the slower run — the round-over-round stability discipline the
bench maintains (sub-100ms queries are reported but not flagged: scheduler
noise dominates below that).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    qa, qb = a["queries"], b["queries"]
    flagged = []
    print(f"{'query':40s} {'run1':>8s} {'run2':>8s} {'delta%':>8s}")
    for name in qa:
        if name not in qb:
            continue
        x, y = qa[name], qb[name]
        hi = max(x, y)
        delta = abs(x - y) / hi * 100 if hi > 0 else 0.0
        mark = ""
        if delta > pct and hi >= 0.1:
            flagged.append((name, x, y, delta))
            mark = "  <-- FLAG"
        print(f"{name:40s} {x:8.3f} {y:8.3f} {delta:8.1f}{mark}")
    print(
        f"\ntotals: run1={a['value']:.2f}s run2={b['value']:.2f}s "
        f"({abs(a['value'] - b['value']) / max(a['value'], b['value']) * 100:.1f}% apart); "
        f"{len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} over {pct:.0f}%"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
