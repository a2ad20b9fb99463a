"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Per-query time is wall time of execution to completion (collect for
small results, count for large ones) after the Spark session is warm —
session startup is excluded, matching how the reference's own bench
reports COPY wall time separately from process startup
(clojure/tests/bench/report.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pgloader_spark.queries import QUERIES  # noqa: E402
from pgloader_spark.session import get_spark  # noqa: E402

# Headline set: the scan/agg/join/window core, the ETL transform path,
# and the pipeline operators (dedup / similarity / text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_nation_revenue",
    "window_top3_orders_per_customer",
    "events_sessionize",
    "etl_transforms_datetime",
    "etl_transforms_bool_str",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_shingle_jaccard",
    "dedup_token_jaccard",
    "similarity_cosine_topk",
    "text_quality_stats",
    "text_langid",
    "text_repetition",
]



def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM / codegen paths outside the measured window
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str) -> float:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: exactly one full distributed execution, no
        # driver-side materialization (the standard Spark bench shape)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up pass (codegen compilation, parquet footers, broadcast
    # threads), then three measured passes, per-query median — the
    # reference bench's RUNS=3-take-median methodology
    # (clojure/tests/bench/Makefile, report.py).
    for name in HEADLINE:
        run(name)
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            samples[name].append(run(name))
    timings = {
        name: round(sorted(ts)[1], 4) for name, ts in samples.items()
    }

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
