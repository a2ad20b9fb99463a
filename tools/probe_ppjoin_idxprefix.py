"""Interleaved A/B + value-equality probe for the PPJoin index-prefix
asymmetry (r11: the smaller side of each candidate pair joins on its
n - ceil(2t/(1+t)*n) + 1 index prefix instead of the full probe
prefix).

A = the pre-r11 symmetric formulation (both sides probe-prefix,
    id_a < id_b pair order) — copied verbatim below;
B = the committed `dedup._prefix_candidates` (index/probe asymmetry,
    (n, id) pair order, ids re-canonicalized to (min, max)).

For each of the two bench shapes (token Jaccard t=0.8, 3-shingle
Jaccard t=0.5) the probe:
  1. proves the VERIFIED pair sets identical ((id_a, id_b, jaccard)
     exact equality, both directions);
  2. counts raw candidate rows both ways (the structural claim);
  3. times the full verified-pairs pass A/B interleaved over N rounds
     in one session, clearCache() before every trial (bench
     conditions).

Usage: python tools/probe_ppjoin_idxprefix.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pgloader_spark.operators.dedup import (  # noqa: E402
    _jaccard_pairs_ppjoin,
    _pin,
    _seeded_hash,
    shingles,
)
from pgloader_spark.operators.text import tokens  # noqa: E402
from pgloader_spark.session import get_spark, read_table  # noqa: E402


def old_prefix_candidates(items_df: DataFrame, threshold: float) -> DataFrame:
    """The pre-r11 symmetric candidate generator, verbatim."""
    ex = items_df.select("id", F.explode("items").alias("item"))
    dfreq = ex.groupBy("item").agg(F.count(F.lit(1)).alias("df"))
    ordered = _pin(
        ex.join(dfreq, "item")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "item"))).alias("arr"))
        .select(
            "id",
            F.transform("arr", lambda s: s["item"]).alias("items"),
            F.size("arr").alias("n"),
        )
    )
    prefix_len = (F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1).cast("int")
    pre = _pin(
        ordered.select(
            "id",
            "n",
            F.posexplode(F.slice("items", 1, prefix_len)).alias("pos", "item"),
        )
    )
    a = pre.select(
        F.col("item"),
        F.col("id").alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("pos").alias("p_a"),
    )
    b = pre.select(
        F.col("item"),
        F.col("id").alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("pos").alias("p_b"),
    )
    length_ok = (
        F.col("n_a").cast("double") >= F.lit(threshold) * F.col("n_b") - F.lit(1e-9)
    ) & (F.col("n_b").cast("double") >= F.lit(threshold) * F.col("n_a") - F.lit(1e-9))
    alpha = F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
    position_ok = (
        F.least(
            F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
        ).cast("double")
        >= alpha - F.lit(1e-9)
    )
    cand_ids = (
        a.join(b, "item")
        .filter((F.col("id_a") < F.col("id_b")) & length_ok & position_ok)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    full_a = ordered.select(
        F.col("id").alias("id_a"),
        F.col("items").alias("items_a"),
        F.col("n").alias("n_a"),
    )
    full_b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("items").alias("items_b"),
        F.col("n").alias("n_b"),
    )
    return cand_ids.join(full_a, "id_a").join(full_b, "id_b")


def old_verified(items_df: DataFrame, threshold: float) -> DataFrame:
    cand = old_prefix_candidates(items_df, threshold)
    inter = F.size(F.array_intersect("items_a", "items_b"))
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            inter / (F.col("n_a") + F.col("n_b") - inter).cast("double"), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe_ppjoin_idxprefix")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pgloader_spark.operators.dedup import _prefix_candidates

    def docs():
        return read_table(spark, sf_dir, "documents", widen=True)

    def token_items():
        toks = F.array_distinct(F.transform(tokens("text"), _seeded_hash(0)))
        return docs().select(F.col("doc_id").alias("id"), toks.alias("items"))

    def shingle_items():
        it = F.array_distinct(F.transform(shingles("text", 3), _seeded_hash(0)))
        return docs().select(F.col("doc_id").alias("id"), it.alias("items"))

    shapes = [
        ("token_t0.8", token_items, 0.8),
        ("shingle_t0.5", shingle_items, 0.5),
    ]

    # 1. value equality + 2. candidate-row counts
    for label, items, t in shapes:
        spark.catalog.clearCache()
        old_rows = {
            (r.id_a, r.id_b, r.jaccard) for r in old_verified(items(), t).collect()
        }
        spark.catalog.clearCache()
        new_rows = {
            (r.id_a, r.id_b, r.jaccard)
            for r in _jaccard_pairs_ppjoin(items(), t).collect()
        }
        assert old_rows == new_rows, (
            f"{label}: MISMATCH old-only={list(old_rows - new_rows)[:5]} "
            f"new-only={list(new_rows - old_rows)[:5]}"
        )
        spark.catalog.clearCache()
        n_old = old_prefix_candidates(items(), t).count()
        spark.catalog.clearCache()
        n_new = _prefix_candidates(items(), t).count()
        print(
            json.dumps(
                {
                    "shape": label,
                    "verified_pairs": len(new_rows),
                    "values_identical": True,
                    "candidates_old": n_old,
                    "candidates_new": n_new,
                    "cand_ratio": round(n_new / n_old, 3) if n_old else None,
                }
            ),
            flush=True,
        )

    # 3. interleaved timing (full verified pass, noop-equivalent count)
    def timed(builder):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for label, items, t in shapes:
        olds, news = [], []
        for _ in range(rounds):
            olds.append(timed(lambda: old_verified(items(), t)))
            news.append(timed(lambda: _jaccard_pairs_ppjoin(items(), t)))
        print(
            json.dumps(
                {
                    "shape": label,
                    "old_secs": olds,
                    "new_secs": news,
                    "old_min": min(olds),
                    "new_min": min(news),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
