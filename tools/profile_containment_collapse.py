"""Same-session A/B: containment_pairs collapse_clones OFF vs ON vs
AUTO, on BOTH corpus shapes (r10, r9 verdict ask #5):

- clone-LIGHT: the sf-dir documents table as-is — measures the
  collapse's insurance premium, which 'auto' should recover (probe
  says clone-light -> collapse skipped -> auto ~= off).
- clone-HEAVY: the same table with every doc's text replaced by one of
  16 boilerplate templates for 60% of rows (ids preserved) — measures
  the collapse's payoff, which 'auto' should keep (probe trips ->
  collapse runs -> auto ~= on).

One session, warm pass per arm, then alternating measured trials so
host drift hits all arms equally.  Writes through the validated
atomic artifact path (tools/run_bench_artifact.write_atomic).

Usage:
    python tools/profile_containment_collapse.py \
        tools/profiles/containment_collapse_ab_r10.json [--n 3]
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
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pgloader_spark.operators.dedup import (
        clone_fraction_probe,
        containment_pairs,
    )
    from pgloader_spark.session import get_spark, read_table

    spark = get_spark("containment_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    light = read_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text"
    )
    # clone-heavy twin: 60% of docs become one of 16 boilerplate
    # templates (deterministic by id), the rest keep their text
    heavy = light.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 6,
            F.concat(
                F.lit("standard boilerplate license header text variant "),
                (F.col("doc_id") % 16).cast("string"),
                F.lit(
                    " all rights reserved redistribution permitted under"
                    " the usual terms and conditions apply here"
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    shapes = {"light": light, "heavy": heavy}
    fractions = {
        name: round(clone_fraction_probe(df), 4)
        for name, df in shapes.items()
    }
    print(f"clone fractions: {fractions}", flush=True)

    def run(df, collapse) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        containment_pairs(df, collapse_clones=collapse).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    arms = [("off", False), ("on", True), ("auto", "auto")]
    trials: dict[str, list[float]] = {}
    for shape, df in shapes.items():
        for arm, mode in arms:
            run(df, mode)  # warm outside the measured window
            trials[f"{shape}:{arm}"] = []
    for _ in range(args.n):
        for shape, df in shapes.items():
            for arm, mode in arms:
                t = run(df, mode)
                trials[f"{shape}:{arm}"].append(t)
                print(f"{shape}:{arm}={t}", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in trials.items()}
    payload = {
        "metric": "containment_collapse_ab_r10",
        "value": med["light:auto"],
        "unit": "sec",
        "queries": {f"containment:{k}": v for k, v in trials.items()},
        "sf_dir": args.sf_dir,
        "medians": med,
        "clone_fractions": fractions,
        "premium_recovered_sec": round(
            med["light:on"] - med["light:auto"], 2
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    spark.stop()
    write_atomic(args.artifact, payload)
    print(f"wrote {args.artifact}: medians={med}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
