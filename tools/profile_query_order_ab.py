"""Isolated-vs-interleaved A/B for ONE headline query (r7 verdict ask #2).

BENCH_r07 recorded text_bm25_topk at 11.72 s — a 3.4x outlier against
both r6 (3.40 s) and every isolated re-measurement (3.3-3.9 s warm),
while the rest of the artifact drifted only 1.1-1.5x.  A query moving
AGAINST the pack is exactly what the uniform-drift adjudication in
PERF.md cannot wave off, so this tool pins it the way
profile_bench_order.py pinned dedup_token_jaccard: one session, four
phases, the target query's samples recorded per phase —

  I    isolated xN          (steady-state baseline)
  II   bench-shape interleaved: warm pass over the full HEADLINE
       list, then 3 passes of (for q in HEADLINE: run q) — the exact
       bench.py / driver shape
  III  grouped: warm pass, then 3 back-to-back samples per query —
       same total work, samples adjacent
  IV   isolated xN again    (controls for monotonic session drift)

Reading: II >> I/IV with III ~= I means the inflation is inter-sample
state churn (heap/JIT/codegen-cache displacement by ~70 s of other
queries between samples) — host-load-amplified, not a plan
regression.  II ~= I means the driver number was pure host
contention.  Either way the committed raw artifact brackets the
driver's outlier.

The artifact writes through the same crash-safe path as
run_bench_artifact.py (capture -> validate -> tempfile -> rename):
zero-byte evidence files cannot recur.

Usage:
    python tools/profile_query_order_ab.py tools/profiles/bm25_ab_r8.json \
        [--query text_bm25_topk] [--sf-dir /root/testdata/sf0.1] [--n 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_bench_artifact import write_atomic  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--query", default="text_bm25_topk")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3,
                    help="interleaved/grouped measured passes")
    args = ap.parse_args()

    import bench
    from pgloader_spark.queries import QUERIES
    from pgloader_spark.session import get_spark

    target = args.query
    headline = bench.HEADLINE
    assert target in headline, f"{target} is not a HEADLINE query"

    spark = get_spark("profile_query_order_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 4)

    out: dict[str, list[float]] = {}
    load0 = [round(x, 2) for x in os.getloadavg()]

    out["I_isolated"] = [run(target) for _ in range(args.n)]
    print(f"I_isolated: {out['I_isolated']}", flush=True)

    for name in headline:  # warm pass, bench shape
        run(name)
    out["II_interleaved"] = []
    for _ in range(args.passes):
        for name in headline:
            t = run(name)
            if name == target:
                out["II_interleaved"].append(t)
    print(f"II_interleaved: {out['II_interleaved']}", flush=True)

    for name in headline:  # warm pass again (same budget as II)
        run(name)
    out["III_grouped"] = []
    for name in headline:
        for _ in range(args.passes):
            t = run(name)
            if name == target:
                out["III_grouped"].append(t)
    print(f"III_grouped: {out['III_grouped']}", flush=True)

    out["IV_isolated"] = [run(target) for _ in range(args.n)]
    print(f"IV_isolated: {out['IV_isolated']}", flush=True)

    payload = {
        "metric": f"order_ab:{target}",
        "value": sorted(out["II_interleaved"])[len(out["II_interleaved"]) // 2],
        "unit": "sec",
        "queries": {f"{target}:{k}": v for k, v in out.items()},
        "sf_dir": args.sf_dir,
        "passes": args.passes,
        "medians": {k: sorted(v)[len(v) // 2] for k, v in out.items()},
        "loadavg_before": load0,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    spark.stop()
    write_atomic(args.artifact, payload)
    print(f"wrote {args.artifact}: medians={payload['medians']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
