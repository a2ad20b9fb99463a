"""Same-session A/B: containment's ranked-item build as a window
row_number (committed r11 shape) vs a groupBy-collect ordered array +
posexplode (the shape `_prefix_candidates` already uses).

Both arms produce the flat (id, n, item, __r) table the probe/index
split consumes; rank equivalence is exact because `__r = row_number
over (gf asc, item asc)` equals the 1-based position in
`array_sort(collect_list(struct(gf, item)))` — per-doc items are
distinct so the (gf, item) key is unique within a doc and the struct
sort is the same lexicographic order.  The window arm pays a per-doc
sort inside a sort-based window exec; the groupBy arm pays a hash
aggregate building per-doc arrays plus an in-array sort — same
exchange count (item-keyed join, id-keyed regroup), different
physical operator.

Pair outputs are compared SET-EXACTLY at the probe scale before any
timing.  collapse_clones pinned False (bench corpus is clone-light;
the auto probe resolves False on both arms — same pinning as
tools/probe_containment_narrow.py).

Usage:
    python tools/probe_containment_rankedbuild.py out.json [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_bench_artifact import write_atomic  # noqa: E402


def new_containment_pairs(df, threshold=0.6, k=3):
    """The candidate shape: ranked flat rows via groupBy-collect of
    (gf, item) structs sorted in-array, then posexplode — no window."""
    from pyspark.sql import functions as F

    from pgloader_spark.operators.dedup import _pin, _seeded_hash, shingles, tokens

    id_col, text_col = "doc_id", "text"
    base_items = tokens(text_col) if k == 1 else shingles(text_col, k)
    all_arrays = _pin(
        df.select(
            F.col(id_col).alias("id"),
            F.sort_array(
                F.array_distinct(F.transform(base_items, _seeded_hash(0)))
            ).alias("arr"),
        ).filter(F.size("arr") > 0)
    )
    arrays = all_arrays
    sizes = arrays.select("id", F.size("arr").cast("long").alias("n"))
    items = arrays.select(
        "id", F.size("arr").cast("long").alias("n"), F.explode("arr").alias("item")
    )
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("gf"))
    ordered = items.join(freq, "item").groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("gf", "item"))).alias("oa")
    )
    ranked = _pin(
        ordered.select(
            "id",
            F.size("oa").cast("long").alias("n"),
            F.posexplode(F.transform("oa", lambda s: s["item"])).alias(
                "pos", "item"
            ),
        ).select("id", "n", "item", (F.col("pos") + 1).alias("__r"))
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pgloader_spark.operators import dedup
    from pgloader_spark.session import get_spark, read_table

    spark = get_spark("probe_containment_rankedbuild")
    docs = read_table(spark, args.sf_dir, "documents", widen=True)

    old_df = dedup.containment_pairs(
        docs, threshold=0.6, k=3, collapse_clones=False
    )
    new_df = new_containment_pairs(docs, threshold=0.6, k=3)

    # ---- value check: set-exact on the full output ----
    spark.catalog.clearCache()
    old_rows = {tuple(r) for r in old_df.collect()}
    spark.catalog.clearCache()
    new_rows = {tuple(r) for r in new_df.collect()}
    assert old_rows == new_rows, (
        f"MISMATCH: old={len(old_rows)} new={len(new_rows)} "
        f"sym_diff={len(old_rows ^ new_rows)}"
    )
    print(f"value check OK: {len(old_rows)} pairs identical")

    def trial(df, label):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm both arms once
    trial(old_df, "warm old")
    trial(new_df, "warm new")

    results = {"old": [], "new": [], "n_pairs": len(old_rows)}
    for i in range(args.n):
        results["old"].append(trial(old_df, f"old trial {i}"))
        results["new"].append(trial(new_df, f"new trial {i}"))
        print(
            f"trial {i}: old {results['old'][-1]:.3f}s new {results['new'][-1]:.3f}s"
        )

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    results["median_old"] = med(results["old"])
    results["median_new"] = med(results["new"])
    results["min_old"] = min(results["old"])
    results["min_new"] = min(results["new"])
    write_atomic(args.out, results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
