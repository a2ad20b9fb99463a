"""Interleaved A/B + value-equality probe for the PPJoin pair-level
suffix-count bound (candidate pruning BEFORE verification).

A = the committed `dedup._prefix_candidates` (r11 index/probe prefix
    asymmetry; pair dedup via dropDuplicates);
B = same enumeration, but the pair dedup is a groupBy aggregate that
    also carries o = count of surviving collision rows and the max
    surviving positions (max_pa, max_pb), then prunes candidates with

        o + min(n_a - 1 - max_pa, n_b - 1 - max_pb) < ceil(alpha)

    where alpha = t/(1+t) * (n_a + n_b) — PPJoin's accumulated-overlap
    positional filter, lifted to the set formulation.

Soundness (why pruning cannot lose a true pair), given both docs list
items under ONE global (df, item) total order so positions increase
with that order:
  1. Surviving collision rows form a PREFIX of the pair's common-item
     sequence: the row filter min(n_a - p_a, n_b - p_b) >= alpha is
     non-increasing along the sequence, so if row j fails every later
     row fails.
  2. Every common item NOT among the surviving rows sits strictly
     after the last surviving row in BOTH docs: (a) a common item not
     counted by the join at all must be outside a's index prefix or
     b's probe prefix, and any such item ordered <= the last COUNTED
     common would, by position monotonicity, be inside both prefixes
     — contradiction; (b) a counted-but-filtered common is ordered
     after the last survivor by (1).
  3. Hence I <= o + min(n_a - 1 - max_pa, n_b - 1 - max_pb): the o
     survivors plus at most the shorter remaining suffix.
A pair pruned by the bound therefore has I < ceil(alpha) and J < t.

For each bench shape (token t=0.8 over identical-set reps — the
registered query's input — and 3-shingle t=0.5) the probe:
  1. proves the VERIFIED pair sets identical both ways;
  2. counts candidates entering verification in both arms;
  3. times the full verified-pairs pass A/B interleaved over N rounds
     in one session, clearCache() before every trial.

Usage: python tools/probe_ppjoin_pairagg.py [sf_dir] [rounds]
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
    _prefix_candidates,
    _seeded_hash,
    shingles,
)
from pgloader_spark.operators.text import tokens  # noqa: E402
from pgloader_spark.session import get_spark, read_table  # noqa: E402


def pairagg_candidates(items_df: DataFrame, threshold: float) -> DataFrame:
    """`_prefix_candidates` with the pair-aggregate suffix bound."""
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
    idx_frac = 2.0 * threshold / (1.0 + threshold)
    idx_len = (
        F.col("n") - F.ceil(F.col("n") * F.lit(idx_frac) - F.lit(1e-9)) + 1
    ).cast("int")
    a = pre.filter(F.col("pos") < idx_len).select(
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
    pair_ordered = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    length_ok = (
        F.col("n_a").cast("double") >= F.lit(threshold) * F.col("n_b") - F.lit(1e-9)
    )
    alpha = F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
    position_ok = (
        F.least(
            F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
        ).cast("double")
        >= alpha - F.lit(1e-9)
    )
    # The one change vs the committed arm: aggregate instead of
    # dropDuplicates, then prune by the accumulated-overlap bound.
    suffix_bound = F.col("o") + F.least(
        F.col("n_a") - 1 - F.col("max_pa"), F.col("n_b") - 1 - F.col("max_pb")
    )
    cand_ids = (
        a.join(b, "item")
        .filter(pair_ordered & length_ok & position_ok)
        .groupBy("id_a", "n_a", "id_b", "n_b")
        .agg(
            F.count(F.lit(1)).alias("o"),
            F.max("p_a").alias("max_pa"),
            F.max("p_b").alias("max_pb"),
        )
        .filter(suffix_bound.cast("double") >= alpha - F.lit(1e-9))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
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


def pairagg_verified(items_df: DataFrame, threshold: float) -> DataFrame:
    cand = pairagg_candidates(items_df, threshold)
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
    spark = get_spark("probe_ppjoin_pairagg")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def docs():
        return read_table(spark, sf_dir, "documents", widen=True)

    def token_reps():
        # the registered query's input: identical-set collapsed reps
        toks = F.array_distinct(F.transform(tokens("text"), _seeded_hash(0)))
        sets = docs().select(
            F.col("doc_id").cast("long").alias("id"),
            F.array_sort(toks).alias("items"),
        ).filter(F.size("items") > 0)
        return sets.groupBy("items").agg(F.min("id").alias("id")).select(
            "id", "items"
        )

    def shingle_items():
        it = F.array_distinct(F.transform(shingles("text", 3), _seeded_hash(0)))
        return docs().select(F.col("doc_id").alias("id"), it.alias("items"))

    shapes = [
        ("token_reps_t0.8", token_reps, 0.8),
        ("shingle_t0.5", shingle_items, 0.5),
    ]

    for label, items, t in shapes:
        spark.catalog.clearCache()
        cur_rows = {
            (r.id_a, r.id_b, r.jaccard)
            for r in _jaccard_pairs_ppjoin(items(), t).collect()
        }
        spark.catalog.clearCache()
        new_rows = {
            (r.id_a, r.id_b, r.jaccard)
            for r in pairagg_verified(items(), t).collect()
        }
        assert cur_rows == new_rows, (
            f"{label}: MISMATCH cur-only={list(cur_rows - new_rows)[:5]} "
            f"new-only={list(new_rows - cur_rows)[:5]}"
        )
        spark.catalog.clearCache()
        n_cur = _prefix_candidates(items(), t).count()
        spark.catalog.clearCache()
        n_new = pairagg_candidates(items(), t).count()
        print(
            json.dumps(
                {
                    "shape": label,
                    "verified_pairs": len(new_rows),
                    "values_identical": True,
                    "candidates_cur": n_cur,
                    "candidates_pairagg": n_new,
                    "cand_ratio": round(n_new / n_cur, 4) if n_cur else None,
                }
            ),
            flush=True,
        )

    def timed(builder):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for label, items, t in shapes:
        curs, news = [], []
        for _ in range(rounds):
            curs.append(timed(lambda: _jaccard_pairs_ppjoin(items(), t)))
            news.append(timed(lambda: pairagg_verified(items(), t)))
        print(
            json.dumps(
                {
                    "shape": label,
                    "cur_secs": curs,
                    "pairagg_secs": news,
                    "cur_min": min(curs),
                    "pairagg_min": min(news),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
