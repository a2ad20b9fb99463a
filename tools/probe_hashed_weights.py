"""A/B probe: hashed_linear_score with per-token derived-weight md5
vs a driver-precomputed 4096-entry literal weight array (one md5 per
token instead of two; the bucket->weight map is a bounded model
table, same class as the inlined IVF centroids).

Run: python tools/probe_hashed_weights.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pgloader_spark.operators import text as txt
from pgloader_spark.operators.sampling import token_budget_take
from pgloader_spark.queries import read_table
from pgloader_spark.session import get_spark


def derived_weights(dim: int, seed: int) -> list[float]:
    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"w{seed}:{j}".encode()).hexdigest()[:12], 16)
        out.append(round((h % 2001 - 1000) / 1000.0, 6))
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_hashed_weights")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents", widen=True)
    w = derived_weights(4096, 0)

    def old():
        return token_budget_take(txt.hashed_linear_score(docs), budget=6000)

    def new():
        return token_budget_take(
            txt.hashed_linear_score(docs, weights=w), budget=6000
        )

    a = old().orderBy("doc_id").collect()
    b = new().orderBy("doc_id").collect()
    assert len(a) == len(b), (len(a), len(b))
    for x, y in zip(a, b):
        assert tuple(x) == tuple(y), (x, y)
    print(f"VALUES IDENTICAL over {len(a)} rows")

    # also the classifier-score surface
    a2 = txt.hashed_linear_score(docs).orderBy("doc_id").collect()
    b2 = txt.hashed_linear_score(docs, weights=w).orderBy("doc_id").collect()
    assert all(tuple(x) == tuple(y) for x, y in zip(a2, b2)) and len(a2) == len(b2)
    print(f"classifier surface identical over {len(a2)} rows")

    for fn in (old, new):
        noop(fn())  # warm
    for rnd in range(3):
        for name, fn in [("old", old), ("new", new)]:
            spark.sparkContext.setJobDescription(f"budget {name} r{rnd}")
            t0 = time.perf_counter()
            noop(fn())
            print(f"round {rnd} {name}: {time.perf_counter() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
