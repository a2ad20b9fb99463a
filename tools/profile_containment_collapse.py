"""Same-session A/B: containment_pairs collapse_clones ON vs OFF at
sf0.1 (clone-LIGHT corpus — this measures the collapse's insurance
premium; scale_probe_r8.txt measures its payoff on clone-heavy data).

One session, warm pass per arm, then alternating measured trials so
host drift hits both arms equally.  Writes through the validated
atomic artifact path (tools/run_bench_artifact.write_atomic).

Usage:
    python tools/profile_containment_collapse.py \
        tools/profiles/containment_collapse_ab_r8.json [--n 4]
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
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    args = ap.parse_args()

    from pgloader_spark.operators.dedup import containment_pairs
    from pgloader_spark.session import get_spark, read_table

    spark = get_spark("containment_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = read_table(spark, args.sf_dir, "documents").select("doc_id", "text")

    def run(collapse: bool) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        containment_pairs(docs, collapse_clones=collapse).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    run(False), run(True)  # warm both arms outside the measured window
    trials: dict[str, list[float]] = {"off": [], "on": []}
    for _ in range(args.n):
        trials["off"].append(run(False))
        trials["on"].append(run(True))
        print(f"off={trials['off'][-1]} on={trials['on'][-1]}", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in trials.items()}
    payload = {
        "metric": "containment_collapse_ab",
        "value": med["on"],
        "unit": "sec",
        "queries": {f"containment:{k}": v for k, v in trials.items()},
        "sf_dir": args.sf_dir,
        "medians": med,
        "overhead_sec": round(med["on"] - med["off"], 2),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    spark.stop()
    write_atomic(args.artifact, payload)
    print(f"wrote {args.artifact}: medians={med}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
