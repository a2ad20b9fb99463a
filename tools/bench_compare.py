"""Compare two bench.py JSON artifacts per query, with automated
drift adjudication (r9 verdict ask #2).

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
       python tools/bench_compare.py --json OLD NEW   # machine-readable

Shared-host benchmarks drift UNIFORMLY when the host is loaded (the
r7-r9 adjudications: whole-artifact inflations of 1.2-1.5x with every
query moving together).  A query that moved AGAINST the pack is the
real signal, so the verdict here is computed, not eyeballed:

- ``median_ratio``: the median new/old wall ratio over shared queries
  — the uniform-drift estimate for the pair of runs.
- ``moved_against_pack``: shared queries whose ratio exceeds
  ``1.3 x median_ratio`` — slower than uniform drift explains.  These
  are watch items to re-measure on a quiet host (r9: edit-distance
  2.02 and table-checksums 1.94 against a 1.33 median would have
  auto-flagged).

PERF.md documents the rule; the threshold mirrors the manual
adjudications (uniform drift bands observed: +-15% around the
artifact-wide inflation; 1.3x median leaves that band with margin).
"""

from __future__ import annotations

import json
import statistics
import sys

PACK_FACTOR = 1.3  # flag ratios above this multiple of the median


def load(path: str) -> dict:
    """Accept both bench.py's raw line and the driver's BENCH_r{N}.json
    wrapper (which nests the parsed line under 'parsed')."""
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def compare(old: dict, new: dict) -> dict:
    """Pure comparison: per-query ratios + the drift verdict."""
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    ratios = {
        name: (qn[name] / qo[name] if qo[name] else float("nan"))
        for name in shared
    }
    med = statistics.median(ratios.values()) if ratios else float("nan")
    flagged = sorted(
        (name for name, r in ratios.items() if r > PACK_FACTOR * med),
        key=lambda n: -ratios[n],
    )
    return {
        "shared": shared,
        "ratios": ratios,
        "median_ratio": med,
        "pack_factor": PACK_FACTOR,
        "moved_against_pack": flagged,
        "only_new": sorted(set(qn) - set(qo)),
        "only_old": sorted(set(qo) - set(qn)),
        "total_old": old.get("value"),
        "total_new": new.get("value"),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    v = compare(old, new)
    if as_json:
        print(json.dumps(v, indent=1, sort_keys=True))
        return 0
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for name in v["shared"]:
        r = v["ratios"][name]
        mark = "  <-- moved against pack" if name in v["moved_against_pack"] else ""
        print(f"{name:34s} {qo[name]:8.2f} {qn[name]:8.2f} {r:6.2f}{mark}")
    print(
        f"\ntotals: old={v['total_old']} new={v['total_new']} "
        f"(old has {len(qo)} queries, new has {len(qn)})"
    )
    print(
        f"median_ratio={v['median_ratio']:.2f} over {len(v['shared'])} "
        f"shared queries (uniform-drift estimate; flag > "
        f"{PACK_FACTOR}x median)"
    )
    for name in v["only_new"]:
        print(f"only-new: {name} {qn[name]:.2f}s")
    for name in v["only_old"]:
        print(f"only-old: {name} {qo[name]:.2f}s")
    if v["moved_against_pack"]:
        print(
            f"\n{len(v['moved_against_pack'])} queries moved against the "
            f"pack (ratio > {PACK_FACTOR} x median "
            f"{v['median_ratio']:.2f}): "
            + ", ".join(
                f"{n} ({v['ratios'][n]:.2f})"
                for n in v["moved_against_pack"]
            )
        )
        print("re-measure these on a quiet host before calling them real")
    else:
        print("\nno query moved against the pack: uniform drift only")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
