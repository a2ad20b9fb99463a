"""Scaling probe: build a 10x replica of sf0.1 and measure headline
queries at both scales on the same session.

The replica perturbs document text per copy (prefix token seeded by
the replica index) so cross-replica rows are not exact duplicates —
otherwise dedup queries would measure pathological all-pairs blowups
that no real corpus has.  Other tables replicate with shifted keys.

Usage: python tools/scale_probe.py [q1 q2 ...]
Writes the replica to /tmp/pgloader_spark_scale10 (reused if present).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pgloader_spark.session import get_spark, read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/pgloader_spark_scale10"
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_shingle_jaccard",
    "text_quality_stats",
    "text_langid",
    "similarity_cosine_topk",
    "dedup_semantic",
    "sample_dsir_weights",
    "pipeline_quality_funnel",
]


def build_replica(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        return
    os.makedirs(OUT, exist_ok=True)
    reps = spark.range(10).withColumnRenamed("id", "rep")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        df = read_table(spark, SF_DIR, t)
        if t in ("region", "nation"):
            out = df  # dimensions stay fixed
        else:
            out = df.crossJoin(F.broadcast(reps))
            for c, typ in out.dtypes:
                # vec_id added r8: without it the replica carries 10
                # rows per embedding ID and ivfpq_train's first-N
                # deterministic sample collapses to ~50 distinct
                # vectors (< ks) — a replica artifact, not a property
                # of real 10x growth
                if c.endswith("key") or c in (
                    "doc_id", "event_id", "o_orderkey", "vec_id",
                ):
                    if typ in ("bigint", "int"):
                        out = out.withColumn(
                            c, F.col(c) + F.col("rep") * F.lit(1_000_000_000)
                        )
            if t == "documents":
                # salt a replica marker into the text every 4 words:
                # with k=5 shingles this rewrites every shingle, so
                # cross-replica copies are NOT near-duplicates and the
                # dedup queries measure 10x DATA, not 10x-squared
                # true-pair output
                out = out.withColumn(
                    "text",
                    F.expr(
                        "regexp_replace(text, '((\\\\S+ ){4})',"
                        " concat('$1r', rep, ' '))"
                    ),
                )
            out = out.drop("rep")
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
    open(os.path.join(OUT, "_DONE"), "w").write("ok")


def main() -> None:
    import __spark_entry__ as entry

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    qs = entry.queries()
    print(f"{'query':28s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in names:
        fn = qs[name]
        walls = {}
        for label, d in (("sf0.1", SF_DIR), ("10x", OUT)):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).collect()
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
            walls[label] = best
        r = walls["10x"] / walls["sf0.1"] if walls["sf0.1"] else float("nan")
        print(
            f"{name:28s} {walls['sf0.1']:8.2f} {walls['10x']:8.2f} {r:6.2f}"
        )


if __name__ == "__main__":
    main()
