"""Same-session A/B: the r11 narrow-array containment front-end vs the
r10 explode→distinct→groupBy front-end.

The OLD core is inlined below verbatim from the r10 tree (commit
17820d7, `_containment_core` front half) so both shapes run in one
session with alternating measured trials (clearCache + noop sink per
trial — bench conditions).  Before timing, the two pair outputs are
compared SET-EXACTLY at the probe scale.

Usage:
    python tools/probe_containment_narrow.py tools/profiles/containment_narrow_ab_r11.json [--n 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_bench_artifact import write_atomic  # noqa: E402


def old_containment_pairs(df, threshold=0.6, k=3, collapse_clones=False):
    """The r10 shape: explode → (id, item) distinct → groupBy(id)
    collect_list arrays → freq → window rank joined with a sizes table.
    collapse_clones pinned False: the bench corpus is clone-light, so
    the auto probe resolves False on both arms and the A/B isolates
    the front-end change only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pgloader_spark.operators.dedup import (
        _pin,
        md5_hash64,
        shingle_rows,
    )

    id_col, text_col = "doc_id", "text"
    raw_items = _pin(
        shingle_rows(df, id_col, text_col, k=k)
        .select(F.col(id_col).alias("id"), md5_hash64(F.col("sh")).alias("item"))
        .distinct()
    )
    all_arrays = _pin(
        raw_items.groupBy("id").agg(
            F.sort_array(F.collect_list("item")).alias("arr")
        )
    )
    arrays = all_arrays
    items = raw_items
    sizes = arrays.select("id", F.size("arr").cast("long").alias("n"))
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("gf"))
    w = Window.partitionBy("id").orderBy(F.col("gf").asc(), F.col("item").asc())
    ranked = _pin(
        items.join(freq, "item")
        .withColumn("__r", F.row_number().over(w))
        .join(sizes, "id")
    )
    prefix_alpha = F.ceil(F.lit(threshold) * F.col("n")).cast("long") - 1
    probe = ranked.filter(
        F.col("__r") <= F.col("n") - F.greatest(prefix_alpha, F.lit(1)) + 1
    ).select(
        F.col("id").alias("id_in"),
        "item",
        F.col("n").alias("n_in"),
        F.col("__r").alias("__ra"),
    )
    index = ranked.select(
        F.col("id").alias("id_out"),
        "item",
        F.col("n").alias("n_out"),
        F.col("__r").alias("__rb"),
    )
    alpha = F.ceil(F.lit(threshold) * F.col("n_in")).cast("long") - 1
    cands = (
        probe.join(index, "item")
        .filter(
            (F.col("id_in") != F.col("id_out"))
            & (F.col("n_out") >= alpha)
            & (
                F.least(
                    F.col("n_in") - F.col("__ra"),
                    F.col("n_out") - F.col("__rb"),
                )
                + 1
                >= alpha
            )
        )
        .select("id_in", "id_out", "n_in")
        .distinct()
    )
    inter = (
        cands.join(
            arrays.select(F.col("id").alias("id_in"), F.col("arr").alias("__aa")),
            "id_in",
        )
        .join(
            arrays.select(F.col("id").alias("id_out"), F.col("arr").alias("__ab")),
            "id_out",
        )
        .select(
            "id_in",
            "id_out",
            "n_in",
            F.size(F.array_intersect("__aa", "__ab")).alias("n_common"),
        )
    )
    return inter.select(
        "id_in",
        "id_out",
        F.col("n_common").cast("long"),
        F.round(F.col("n_common") / F.col("n_in").cast("double"), 6).alias(
            "containment"
        ),
    ).filter(F.col("containment") >= threshold)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pgloader_spark.operators.dedup import containment_pairs
    from pgloader_spark.session import get_spark, read_table

    spark = get_spark("containment_narrow_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, args.sf_dir, "documents", widen=True)

    def new_fn():
        # collapse pinned False to mirror the old arm (auto resolves
        # False on this corpus anyway; the A/B isolates the front-end)
        return containment_pairs(docs, threshold=0.6, k=3, collapse_clones=False)

    def old_fn():
        return old_containment_pairs(docs, threshold=0.6, k=3)

    # --- value equality first: set-exact over (id_in, id_out, n_common,
    # containment) ---
    spark.catalog.clearCache()
    new_rows = {tuple(r) for r in new_fn().collect()}
    spark.catalog.clearCache()
    old_rows = {tuple(r) for r in old_fn().collect()}
    assert new_rows == old_rows, (
        f"MISMATCH: new-only={len(new_rows - old_rows)} "
        f"old-only={len(old_rows - new_rows)}"
    )
    print(f"set-exact: {len(new_rows)} pairs identical on both arms")

    arms = {"old": old_fn, "new": new_fn}
    results = {k: [] for k in arms}
    # warm pass per arm (codegen), then alternating measured trials
    for name, fn in arms.items():
        spark.catalog.clearCache()
        fn().write.format("noop").mode("overwrite").save()
    for i in range(args.n):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 4))
            print(f"trial {i} {name}: {results[name][-1]}s", flush=True)
    out = {
        "probe": "containment_narrow_front_end",
        "sf_dir": args.sf_dir,
        "pairs": len(new_rows),
        "trials": results,
        "median": {
            k: sorted(v)[len(v) // 2] for k, v in results.items()
        },
        "min": {k: min(v) for k, v in results.items()},
    }
    write_atomic(args.artifact, out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
