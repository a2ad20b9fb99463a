"""Attribute dedup_token_jaccard's in-sequence vs isolated gap.

Verdict r6 ask #5: the driver bench records ~8.8 s for
dedup_token_jaccard in-sequence while isolated steady state is 4-6 s.
Hypotheses: (a) bench ORDERING (interleaved passes put ~50 s of other
queries between this query's samples — codegen caches, JIT state,
heap pressure from 3M-pair intermediates); (b) structural driver-side
solver Python time (would show up in EVERY phase equally).

One session, four phases, token-jaccard samples recorded per phase:

  I    isolated x4 (steady-state baseline)
  II   bench-shape interleaved: one warm pass over the full HEADLINE
       list, then 3 passes of (for q in HEADLINE: run q) — the exact
       bench.py shape; token_jaccard's 3 samples are ~50 s apart
  III  grouped: one warm pass, then (for q in HEADLINE: run q 3x
       back-to-back) — same total work, samples adjacent
  IV   isolated x4 again (controls for monotonic session drift)

If II >> I/IV but III ~= I, the gap is inter-sample distance (heap /
JIT state churned by other queries), not solver Python time.

Usage:  python tools/profile_bench_order.py [sf_dir]
Output: JSON lines; committed raw runs live in tools/profiles/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgloader_spark.queries import QUERIES  # noqa: E402
from pgloader_spark.session import get_spark  # noqa: E402

TJ = "dedup_token_jaccard"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench

    headline = bench.HEADLINE
    spark = get_spark("profile_bench_order")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 4)

    out: dict[str, list[float]] = {}
    load0 = [round(x, 2) for x in os.getloadavg()]

    out["I_isolated"] = [run(TJ) for _ in range(4)]
    print(json.dumps({"phase": "I_isolated", "tj": out["I_isolated"]}), flush=True)

    for name in headline:  # warm pass, bench shape
        run(name)
    out["II_interleaved"] = []
    for _ in range(3):
        for name in headline:
            t = run(name)
            if name == TJ:
                out["II_interleaved"].append(t)
    print(
        json.dumps({"phase": "II_interleaved", "tj": out["II_interleaved"]}),
        flush=True,
    )

    for name in headline:  # warm pass again (same budget as II)
        run(name)
    out["III_grouped"] = []
    for name in headline:
        for _ in range(3):
            t = run(name)
            if name == TJ:
                out["III_grouped"].append(t)
    print(json.dumps({"phase": "III_grouped", "tj": out["III_grouped"]}), flush=True)

    out["IV_isolated"] = [run(TJ) for _ in range(4)]
    print(json.dumps({"phase": "IV_isolated", "tj": out["IV_isolated"]}), flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    print(
        json.dumps(
            {
                "summary": {
                    "sf_dir": sf_dir,
                    "medians": med,
                    "loadavg_before": load0,
                    "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
