"""Compare two bench.py JSON artifacts per query.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json

Prints per-query wall ratios (new/old), flags >1.5x slowdowns, and
separates queries present in only one artifact — the same-session
caveat applies (PERF.md documents shared-host variance; treat ratios
inside ~1.5x as noise unless a scale probe corroborates).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept both bench.py's raw line and the driver's BENCH_r{N}.json
    wrapper (which nests the parsed line under 'parsed')."""
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    slow = []
    for name in shared:
        r = qn[name] / qo[name] if qo[name] else float("nan")
        mark = "  <-- slower" if r > 1.5 else ""
        if r > 1.5:
            slow.append(name)
        print(f"{name:34s} {qo[name]:8.2f} {qn[name]:8.2f} {r:6.2f}{mark}")
    print(
        f"\ntotals: old={old.get('value')} new={new.get('value')} "
        f"(old has {len(qo)} queries, new has {len(qn)})"
    )
    for name in sorted(set(qn) - set(qo)):
        print(f"only-new: {name} {qn[name]:.2f}s")
    for name in sorted(set(qo) - set(qn)):
        print(f"only-old: {name} {qo[name]:.2f}s")
    if slow:
        print(f"\n{len(slow)} queries >1.5x slower: {', '.join(slow)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
