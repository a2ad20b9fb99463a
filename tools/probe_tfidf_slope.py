"""tfidf slope probe (r9, r8 verdict ask #3): one LARGER organic-shaped
point for text_tfidf_topk, the only tier-2 query outside 2x on the
sf0.01->sf0.1 organic table (5.35x, adjudicated overhead-dominated).

No sf0.2 testdata exists (and /root/testdata is read-only), so the
larger corpus is synthesized to preserve tf-idf's work statistics
exactly: sf0.2 = sf0.1 UNION a caesar-shifted copy (every [a-z0-9]
char rotated by one, doc_ids offset).  The shift keeps token count,
token lengths, per-doc term structure and the document-frequency
distribution IDENTICAL per shard while making the two shards'
vocabularies disjoint — so the tf-idf plan does exactly 2x the work
(2x docs, 2x vocabulary, same zipf shape): the honest denominator for
an incremental-slope reading.  (A verbatim union would instead double
every df and halve distinct-term work per row — clone statistics, the
thing organic probes exist to avoid.)

Method: warm pass then best-of-2 noop-sink walls at sf0.01, sf0.1 and
the 2x corpus; reports ratio_10x (sf0.01->sf0.1, comparable to
organic_growth_r8_tier2.json) and ratio_2x (sf0.1->2x — the
incremental slope the adjudication predicts falls toward ~2/2 = 1x
per data unit, i.e. wall ratio ~2x or less for 2x data).

Usage: python tools/probe_tfidf_slope.py tools/profiles/tfidf_slope_r9.json
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pgloader_spark.session import get_spark, read_table  # noqa: E402
from tools.run_bench_artifact import write_atomic  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/pgloader_spark_sf02_docs"
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def _shift(s: str) -> str:
    return s[1:] + s[0]


def build(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        return
    os.makedirs(OUT, exist_ok=True)
    docs = read_table(spark, SRC, "documents")
    shifted = docs.withColumn(
        "text",
        F.translate(
            "text",
            LOWER + UPPER + DIGIT,
            _shift(LOWER) + _shift(UPPER) + _shift(DIGIT),
        ),
    ).withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    docs.unionByName(shifted).repartition(8).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    open(os.path.join(OUT, "_DONE"), "w").close()


def main() -> int:
    artifact = sys.argv[1] if len(sys.argv) > 1 else (
        "tools/profiles/tfidf_slope_r9.json"
    )
    spark = get_spark("tfidf_slope")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build(spark)

    from pgloader_spark.queries import QUERIES

    q = QUERIES["text_tfidf_topk"]

    def wall(d: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    points = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", SRC),
              ("sf0.2x", OUT)]
    walls: dict[str, float] = {}
    for tag, d in points:
        wall(d)  # warm (codegen + page cache)
        walls[tag] = round(min(wall(d), wall(d)), 3)
    out = {
        "metric": "tfidf_slope_r9",
        "value": round(walls["sf0.2x"] / walls["sf0.1"], 2),
        "unit": "ratio_2x_data",
        "walls": walls,
        "ratio_10x_sf001_to_sf01": round(walls["sf0.1"] / walls["sf0.01"], 2),
        "ratio_2x_sf01_to_sf02": round(walls["sf0.2x"] / walls["sf0.1"], 2),
        "note": "sf0.2x = sf0.1 + caesar-shifted copy (disjoint vocab, "
                "identical token/df statistics per shard => exactly 2x "
                "tf-idf work); lawful slope is wall ratio <= ~2x",
        "loadavg": os.getloadavg(),
    }
    write_atomic(artifact, out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
