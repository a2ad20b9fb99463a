"""Same-session interleaved A/B: join strategy for the PPJoin kernels
at the sf1x organic scale point — Spark-default sort-merge vs
shuffled-hash (``spark.sql.join.preferSortMergeJoin=false`` +
AQE's ``maxShuffledHashJoinLocalMapThreshold``), guide §3.1: "often
faster than sort-merge when one side is moderately small per
partition" — the collision join's index-prefix side is the filtered
(smaller) one, and the per-partition build is bounded by AQE's
advisory partition size.

At sf0.1 every kernel join broadcasts (committed plans), so the conf
is a no-op there; this probe targets the scale regime where the
prefix tables outgrow the broadcast threshold.  Config-only change —
results are plan-invariant by Spark semantics; a count+sum smoke
check guards each arm anyway.

Usage:
    python tools/probe_shj_sf1x.py /tmp/pgloader_spark_sf1x out.json [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_bench_artifact import write_atomic  # noqa: E402

SHJ_CONFS = {
    "spark.sql.join.preferSortMergeJoin": "false",
    # let AQE rewrite SMJ -> SHJ when every post-shuffle partition's
    # map side is under the advisory size (64m: 4x the session's 16m
    # advisory partition — a build table that size hashes in-memory
    # comfortably within a 24g heap at 32 tasks)
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pgloader_spark.operators import dedup
    from pgloader_spark.session import get_spark, read_table

    spark = get_spark("probe_shj_sf1x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, args.sf_dir, "documents", widen=True)

    defaults = {k: spark.conf.get(k, None) for k in SHJ_CONFS}

    def set_arm(arm: str) -> None:
        for k, v in (SHJ_CONFS if arm == "shj" else defaults).items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    kernels = {
        "token_pairs": lambda: dedup.token_jaccard_pairs(docs, threshold=0.8),
        "shingle_pairs": lambda: dedup.shingle_jaccard_pairs(
            docs, threshold=0.5, k=3
        ),
    }

    results: dict = {"confs": SHJ_CONFS}
    for kname, kfn in kernels.items():
        # smoke check: identical (count, sum-of-ids) on both arms
        sums = {}
        for arm in ("smj", "shj"):
            set_arm(arm)
            spark.catalog.clearCache()
            row = (
                kfn()
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("id_a") * 3 + F.col("id_b")).alias("s"),
                )
                .collect()[0]
            )
            sums[arm] = (row["n"], row["s"])
        assert sums["smj"] == sums["shj"], f"{kname}: {sums}"
        print(f"{kname} smoke OK: {sums['smj']}", flush=True)

        trials: dict = {"smj": [], "shj": []}
        for i in range(args.n):
            for arm in ("smj", "shj"):
                set_arm(arm)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{kname} {arm} {i}")
                t0 = time.monotonic()
                kfn().write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                trials[arm].append(round(dt, 3))
                print(f"{kname} {arm} trial{i}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        results[kname] = {
            **trials,
            "min_smj": min(trials["smj"]),
            "min_shj": min(trials["shj"]),
            "median_smj": sorted(trials["smj"])[len(trials["smj"]) // 2],
            "median_shj": sorted(trials["shj"])[len(trials["shj"]) // 2],
            "n_pairs": sums["smj"][0],
        }
    set_arm("smj")
    write_atomic(args.out, results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
