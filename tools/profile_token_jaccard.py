"""Stage-attributed profile of dedup_token_jaccard at a given SF.

Verdict r5 ask #1(a)/#2: every headline perf claim must cite a
committed script and its raw output.  Stages are timed warm, in one
session, with ``spark.catalog.clearCache()`` before every trial —
the EXACT conditions bench.py measures under (each run re-materializes
its own pins), so these numbers are comparable to BENCH_r{N}.json.
A stage's wall includes its upstream; per-stage deltas attribute cost.

Stages:
  A  items build (tokenize + hash + distinct)
  B  raw PPJoin candidates          (legacy discovery API path)
  C  raw verified pairs >= t        (dedup.token_jaccard_pairs)
  D  identical-set collapse to reps (the r6 rewrite's first stage)
  E  rep-level verified pairs
  F  full registered query          (token_jaccard_clusters)

Usage:  python tools/profile_token_jaccard.py [sf_dir] [trials]
Output: one JSON line per stage; committed raw runs live in
        tools/profiles/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pgloader_spark.operators import dedup  # noqa: E402
from pgloader_spark.operators.dedup import (  # noqa: E402
    _jaccard_pairs_ppjoin,
    _pin,
    _prefix_candidates,
    _seeded_hash,
)
from pgloader_spark.operators.text import tokens  # noqa: E402
from pgloader_spark.session import get_spark, read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_token_jaccard")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    def docs():
        return read_table(spark, sf_dir, "documents", widen=True)

    def items_df():
        toks = F.array_distinct(F.transform(tokens("text"), _seeded_hash(0)))
        return docs().select(F.col("doc_id").alias("id"), toks.alias("items"))

    def reps_df():
        toks = F.array_distinct(F.transform(tokens("text"), _seeded_hash(0)))
        sets = docs().select(
            F.col("doc_id").cast("long").alias("id"), F.array_sort(toks).alias("items")
        )
        w = Window.partitionBy("items")
        tagged = sets.select(
            "id",
            "items",
            F.min("id").over(w).alias("rep"),
            F.count(F.lit(1)).over(w).alias("gsize"),
        )
        return _pin(
            tagged.filter(F.col("id") == F.col("rep")).select("id", "items", "gsize")
        )

    def timed(label, builder):
        rows, secs = None, []
        for _ in range(trials):
            spark.catalog.clearCache()  # bench.py's per-run isolation
            t0 = time.time()
            rows = builder().count()
            secs.append(round(time.time() - t0, 3))
        print(
            json.dumps({"stage": label, "rows": rows, "secs": secs, "min": min(secs)}),
            flush=True,
        )

    timed("A_items_build", items_df)
    timed(
        "B_raw_candidates",
        lambda: _prefix_candidates(items_df(), 0.8).select("id_a", "id_b"),
    )
    timed("C_raw_verified_pairs", lambda: _jaccard_pairs_ppjoin(items_df(), 0.8))
    timed("D_reps_collapse", reps_df)
    timed(
        "E_rep_verified_pairs",
        lambda: _jaccard_pairs_ppjoin(reps_df().select("id", "items"), 0.8),
    )
    timed(
        "F_full_query_clusters",
        lambda: dedup.token_jaccard_clusters(docs(), threshold=0.8),
    )
    spark.stop()


if __name__ == "__main__":
    main()
