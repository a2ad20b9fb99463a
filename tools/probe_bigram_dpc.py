"""A/B probe: bigram_logprob occurrence-stream shape vs dpc shape.

The current plan tokenizes the corpus FOUR times per action (scored
stream, c2-for-model, c2-for-c1, c2-for-v — each consumer prunes
different columns so the subtrees replicate; plans/r10/
text_bigram_logprob_before.txt shows 4 Generate nodes over 4 scans).

The candidate aggregates the bigram stream ONCE per (doc_id, prev,
cur) — `dpc` — and derives everything from it:

- c2 = sum(n) over (prev, cur)   [== count(*) over occurrences]
- c1, v, model from c2 exactly as before
- scoring joins dpc (per-doc distinct bigrams) instead of the raw
  occurrence stream, weighting each rounded logp by its in-doc count
  n: sum(n * round6(logp)) == sum over occurrences of round6(logp),
  exactly, because n * decimal is exact integer-scaled arithmetic.

All four consumers share the byte-identical dpc aggregate+exchange, so
Spark's exchange reuse (AQE runtime reuse) computes the corpus
tokenize+partial-agg once.  Guide §2.4 (remove shuffles outright /
share one exchange) + §2.3 (aggregate before you shuffle: the model
join now moves per-doc-distinct rows, not occurrences).

Run: python tools/probe_bigram_dpc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pgloader_spark.operators import text as txt
from pgloader_spark.queries import read_table
from pgloader_spark.session import get_spark


def bigram_logprob_dpc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    k: float = 0.5,
) -> DataFrame:
    big = txt.bigram_stream(df, id_col, text_col)
    dpc = big.groupBy(id_col, "prev", "cur").agg(F.count(F.lit(1)).alias("n"))
    c2 = dpc.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = c2.agg(F.count_distinct("cur").alias("v"))
    model = c2.filter(F.col("c2") >= min_count)

    scored = (
        dpc.join(model, ["prev", "cur"], "left")
        .join(F.broadcast(c1), "prev")
        .crossJoin(F.broadcast(v))
        .select(
            F.col(id_col),
            F.col("n"),
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                    / (F.col("c1") + F.lit(k) * F.col("v"))
                ),
                6,
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("logp").cast("decimal(18,6)")).alias("slp"),
    )
    return df.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("slp").cast("double") / F.col("n_bigrams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_bigram_logprob"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("probe_bigram_dpc")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents", widen=True)

    # value check first
    old = txt.bigram_logprob(docs).orderBy("doc_id").collect()
    new = bigram_logprob_dpc(docs).orderBy("doc_id").collect()
    assert len(old) == len(new), (len(old), len(new))
    for a, b in zip(old, new):
        assert tuple(a) == tuple(b), (a, b)
    print(f"VALUES IDENTICAL over {len(old)} rows")

    variants = [("old", txt.bigram_logprob), ("new", bigram_logprob_dpc)]
    for _, fn in variants:
        noop(fn(docs))  # warm
    for rnd in range(4):
        for variant, fn in variants:
            spark.sparkContext.setJobDescription(f"bigram {variant} r{rnd}")
            t0 = time.perf_counter()
            noop(fn(docs))
            print(f"round {rnd} {variant}: {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
