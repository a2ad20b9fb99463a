"""dsir slope probe (r10, r9 verdict ask #3): sample_dsir_weights is
the worst current organic point (2.65x wall for 10x data,
organic_growth_r9.json) — the same overhead-dominated profile
text_tfidf_topk showed before its r9 2x-point exoneration.  This
applies the identical treatment: one LARGER corpus point built by the
caesar-shift method (tools/probe_tfidf_slope.py, whose builder this
reuses), giving a second decade-free incremental reading.

Why the construction is honest for dsir: the shifted shard keeps
token counts, per-doc uni+bigram counts, and (since the 256-bucket
hash is uniform over the shifted vocabulary) the bucket-level
aggregation statistics of the original — so sf0.2x = exactly 2x the
gram rows, 2x docs, same 256 buckets.  dsir's plan is two map-side-
combinable aggs (doc x bucket, then bucket) + a 256-row broadcast
join back: the lawful incremental slope is wall ratio <= ~2x for 2x
data, and the structural prediction is BELOW 2x because the bucket
table stays constant size.

Usage: python tools/probe_dsir_slope.py tools/profiles/dsir_slope_r10.json
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgloader_spark.session import get_spark  # noqa: E402
from tools.probe_tfidf_slope import OUT, SRC, build  # noqa: E402
from tools.run_bench_artifact import write_atomic  # noqa: E402


def main() -> int:
    artifact = sys.argv[1] if len(sys.argv) > 1 else (
        "tools/profiles/dsir_slope_r10.json"
    )
    spark = get_spark("dsir_slope")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build(spark)

    from pgloader_spark.queries import QUERIES

    q = QUERIES["sample_dsir_weights"]

    def wall(d: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    points = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", SRC),
              ("sf0.2x", OUT)]
    walls: dict[str, float] = {}
    for tag, d in points:
        wall(d)  # warm (codegen + page cache)
        walls[tag] = round(min(wall(d), wall(d)), 3)
    out = {
        "metric": "dsir_slope_r10",
        "value": round(walls["sf0.2x"] / walls["sf0.1"], 2),
        "unit": "ratio_2x_data",
        "walls": walls,
        "ratio_10x_sf001_to_sf01": round(walls["sf0.1"] / walls["sf0.01"], 2),
        "ratio_2x_sf01_to_sf02": round(walls["sf0.2x"] / walls["sf0.1"], 2),
        "note": "sf0.2x = sf0.1 + caesar-shifted copy (disjoint vocab, "
                "identical gram/bucket statistics per shard => exactly "
                "2x dsir work); lawful slope is wall ratio <= ~2x",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    write_atomic(artifact, out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
