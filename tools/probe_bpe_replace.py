"""A/B probe: bpe_segment_counts fold-chain vs JVM replace-chain.

The candidate renders each distinct word's symbol array as a
\x1f-delimited string (single guards at the ends, double between
symbols — the DuckDB oracle's own construction, queries_pipeline.py:
_duck_bpe_frozen_sql) and applies each merge rank as one
non-overlapping string replace in a single codegen'd projection,
instead of 24 chained HOF aggregate passes + localCheckpoints.

Run: python tools/probe_bpe_replace.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pgloader_spark.frozen_models import BPE_MERGES
from pgloader_spark.operators import text as txt
from pgloader_spark.queries import read_table
from pgloader_spark.session import get_spark

S1, S2 = chr(31), chr(31) * 2


def segment_replace(df: DataFrame, merges, id_col="doc_id", text_col="text"):
    tok = df.select(F.col(id_col), F.explode(txt.tokens(text_col)).alias("word"))
    words = tok.select("word").distinct()
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.when(
            i == F.length("word"),
            F.concat(F.col("word").substr(i, F.lit(1)), F.lit("</w>")),
        ).otherwise(F.col("word").substr(i, F.lit(1))),
    )
    s = F.concat(F.lit(S1), F.array_join(chars, S2), F.lit(S1))
    for _rank, left, right, merged, _pc in merges:
        s = F.replace(s, F.lit(f"{S1}{left}{S2}{right}{S1}"), F.lit(f"{S1}{merged}{S1}"))
    seg = words.select("word", F.size(F.split(s, S2)).alias("n_sub"))
    return (
        tok.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_tokens").cast("double"), 6
            ).alias("subwords_per_token"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_bpe_replace")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents", widen=True)

    # value check first
    old = txt.bpe_segment_counts(docs, BPE_MERGES).orderBy("doc_id").collect()
    new = segment_replace(docs, BPE_MERGES).orderBy("doc_id").collect()
    assert len(old) == len(new), (len(old), len(new))
    for a, b in zip(old, new):
        assert tuple(a) == tuple(b), (a, b)
    print(f"VALUES IDENTICAL over {len(old)} rows")

    # interleaved timing
    for variant, fn in [("old", txt.bpe_segment_counts), ("new", segment_replace)]:
        noop(fn(docs, BPE_MERGES))  # warm
    for rnd in range(3):
        for variant, fn in [("old", txt.bpe_segment_counts), ("new", segment_replace)]:
            spark.sparkContext.setJobDescription(f"bpe {variant} r{rnd}")
            t0 = time.perf_counter()
            noop(fn(docs, BPE_MERGES))
            print(f"round {rnd} {variant}: {time.perf_counter() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
