"""Interleaved A/B + value-equality probe: verify-before-pair-dedup
for the PPJoin kernel (REJECTED — committed as evidence).

Hypothesis: the (id_a, id_b) pair-dedup exchange (~6.35M filtered
collision rows -> 3.48M distinct candidates on the token-reps shape at
sf0.1) costs more than verifying duplicates would — so attach the item
arrays to the RAW collision rows (broadcast/hash join against the tiny
ordered table), run array_intersect + the Jaccard filter first, and
dedup only the verified survivors (~1.26M rows incl. duplicates).

Output equality: the verified set is identical — jaccard is a pure
function of (id_a, id_b), so dropDuplicates on ids after the filter
keeps exactly one row per qualifying pair, same as deduping candidates
before verification.

Measured (this file's run, committed under tools/profiles/): the
variant LOSES — token reps 3.41 -> 4.81 s min, shingle ~neutral
(3.27 -> 3.42).  The ~1.8x duplicated array_intersect work costs more
than the saved exchange, and the dup factor is bounded only by the
index-prefix length (grows with doc size), so the trade worsens with
scale.  The committed dedup-before-verify shape stands.

Usage: python tools/probe_verify_first.py [sf_dir] [rounds]
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


def verify_first(items_df: DataFrame, t: float) -> DataFrame:
    """The rejected variant: arrays attach to raw collision rows;
    pair dedup runs AFTER the Jaccard filter."""
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
    prefix_len = (F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1).cast("int")
    pre = _pin(
        ordered.select(
            "id",
            "n",
            F.posexplode(F.slice("items", 1, prefix_len)).alias("pos", "item"),
        )
    )
    idx_frac = 2.0 * t / (1.0 + t)
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
        F.col("n_a").cast("double") >= F.lit(t) * F.col("n_b") - F.lit(1e-9)
    )
    alpha = F.lit(t / (1.0 + t)) * (F.col("n_a") + F.col("n_b"))
    position_ok = (
        F.least(
            F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
        ).cast("double")
        >= alpha - F.lit(1e-9)
    )
    coll = (
        a.join(b, "item")
        .filter(pair_ordered & length_ok & position_ok)
        .select("id_a", "id_b")
    )
    full_a = ordered.select(
        F.col("id").alias("id_a"), F.col("items").alias("items_a")
    )
    full_b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("items").alias("items_b"),
        F.col("n").alias("n_b2"),
    )
    cand = coll.join(full_a, "id_a").join(full_b, "id_b")
    inter = F.size(F.array_intersect("items_a", "items_b"))
    na = F.size("items_a")
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(
                inter / (na + F.col("n_b2") - inter).cast("double"), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "jaccard",
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe_verify_first")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def docs():
        return read_table(spark, sf_dir, "documents", widen=True)

    def token_reps():
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
        cur = {
            (r.id_a, r.id_b, r.jaccard)
            for r in _jaccard_pairs_ppjoin(items(), t).collect()
        }
        spark.catalog.clearCache()
        new = {
            (r.id_a, r.id_b, r.jaccard)
            for r in verify_first(items(), t).collect()
        }
        assert cur == new, f"{label}: MISMATCH"
        print(
            json.dumps(
                {"shape": label, "verified_pairs": len(cur), "values_identical": True}
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
            news.append(timed(lambda: verify_first(items(), t)))
        print(
            json.dumps(
                {
                    "shape": label,
                    "cur_secs": curs,
                    "verify_first_secs": news,
                    "cur_min": min(curs),
                    "vf_min": min(news),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
