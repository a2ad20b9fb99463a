"""Organic-growth probe: warm wall ratios sf0.01 -> sf0.1 (REAL 10x
corpus growth — new content, scale-invariant statistics) for the
expensive headline queries.

Complements the synthetic-replica probes (tools/scale_probe.py): the
replica stresses specific failure modes (clones, salt selectivity) but
manufactures statistics no real corpus has; this table is the honest
slope on generator-distributed data.  r7/r8 used the method ad hoc for
dedup_containment (1.09x) and sample_leakage_split (1.49x); this makes
it a one-command artifact across the whole expensive set.

Method: per query, one warm pass at each scale first (JIT/codegen),
then best-of-2 measured noop-sink executions per scale, cache cleared
between runs.  Writes through the atomic validated artifact path.

Usage:
    python tools/probe_organic_growth.py \
        tools/profiles/organic_growth_r8.json [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_bench_artifact import write_atomic  # noqa: E402

DEFAULT = [
    "dedup_token_jaccard",
    "dedup_containment",
    "dedup_shingle_jaccard",
    "dedup_edit_distance",
    "text_bm25_topk",
    "audit_table_checksums",
    "audit_fk_orphans",
    "sample_dsir_weights",
    "similarity_ivfpq_topk",
    "multimodal_jpeg_luma_stats",
    "text_bpe_tokenize",
    "sketch_hll_distinct",
    # r9 frozen-model gate variants (same kernels, fixed artifacts)
    "similarity_ivfpq_frozen_topk",
    "text_bpe_frozen_segment",
]
SCALES = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--queries", default=",".join(DEFAULT))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from pgloader_spark.queries import QUERIES
    from pgloader_spark.session import get_spark

    spark = get_spark("organic_growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str, d: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    table: dict[str, dict] = {}
    for name in names:
        for _, d in SCALES:  # warm both scales outside the window
            run(name, d)
        walls = {}
        for label, d in SCALES:
            walls[label] = round(min(run(name, d) for _ in range(2)), 3)
        ratio = round(walls["sf0.1"] / max(walls["sf0.01"], 1e-9), 2)
        table[name] = {**walls, "ratio_10x": ratio}
        print(f"{name:30s} {walls['sf0.01']:7.2f} {walls['sf0.1']:7.2f} "
              f"{ratio:6.2f}", flush=True)

    payload = {
        "metric": "organic_growth_sf0.01_to_sf0.1",
        "value": max(t["ratio_10x"] for t in table.values()),
        "unit": "ratio",
        "queries": table,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "note": "warm best-of-2 noop-sink walls; real 10x corpus growth, "
                "no synthetic replica",
    }
    spark.stop()
    write_atomic(args.artifact, payload)
    print(f"wrote {args.artifact}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
