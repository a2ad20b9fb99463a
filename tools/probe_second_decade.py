"""Second-decade organic point (r10, r9 verdict ask #6): one
sf0.1 -> "sf1-equivalent" (10x of sf0.1) wall ratio for the three most
expensive headline queries — dedup_token_jaccard, dedup_containment,
text_bm25_topk — so the 100 TB extrapolation rests on TWO decades of
slope (sf0.01->sf0.1 from the organic-growth table, sf0.1->sf1x from
here), not one.

Corpus construction (the r9 tfidf-slope precedent, extended): sf1x =
union over k in 0..9 of the sf0.1 documents with every [a-zA-Z0-9]
char rotated by k (doc_ids offset per shard).  Each shard keeps the
ORIGINAL's token counts, token lengths, per-doc shingle structure and
document-frequency distribution, while shard vocabularies are
(near-)disjoint — so:

- token-jaccard / containment do exactly 10x the per-shard work with
  ZERO cross-shard candidates (no shared shingles), i.e. honest
  linear growth: candidate volume = 10 x one shard's.  (A verbatim
  10x union would instead manufacture 100x clone candidates — the
  statistic organic probes exist to avoid; the r10 auto clone probe
  would also just collapse them.)
- bm25 gets a PROPORTIONAL query workload: the 4 fixed gate queries
  are shifted per shard too (40 queries total), so query-term posting
  volume grows 10x alongside the corpus — the stationary-content
  assumption a fixed query batch over growing data implies.  (The
  un-shifted 4-query batch would measure a constant-postings corpus
  scan instead — flattering, not honest.)

Lawful slope for 10x data is wall ratio <= ~10x; the structural claim
(all three are bucketed/pruned with no superlinear term) predicts
well under that, matching the first decade's 0.85-2.2x band scaled by
the overhead-amortization these small absolute walls still carry.

Usage: python tools/probe_second_decade.py \
           tools/profiles/second_decade_r10.json
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
OUT = "/tmp/pgloader_spark_sf1x_docs"
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def shift_text(col, k: int):
    if k == 0:
        return col
    return F.translate(
        col,
        LOWER + UPPER + DIGIT,
        _rot(LOWER, k) + _rot(UPPER, k) + _rot(DIGIT, k),
    )


def shift_str(s: str, k: int) -> str:
    if k == 0:
        return s
    table = str.maketrans(
        LOWER + UPPER + DIGIT,
        _rot(LOWER, k) + _rot(UPPER, k) + _rot(DIGIT, k),
    )
    return s.translate(table)


def build(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        return
    os.makedirs(OUT, exist_ok=True)
    docs = read_table(spark, SRC, "documents")
    shards = [
        docs.withColumn("text", shift_text(F.col("text"), k)).withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
        )
        for k in range(10)
    ]
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    open(os.path.join(OUT, "_DONE"), "w").close()


def main() -> int:
    artifact = sys.argv[1] if len(sys.argv) > 1 else (
        "tools/profiles/second_decade_r10.json"
    )
    spark = get_spark("second_decade")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build(spark)

    from pgloader_spark.operators import text as txt
    from pgloader_spark.queries import QUERIES
    from pgloader_spark.queries_pipeline import _BM25_QUERIES

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def run_gate(name: str, d: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(QUERIES[name](spark, d))
        return time.perf_counter() - t0

    def run_bm25(d: str, n_shards: int) -> float:
        # proportional query workload: the 4 gate queries, shifted to
        # match each shard's vocabulary
        qrows = [
            (qid + 100 * k, shift_str(qtext, k))
            for k in range(n_shards)
            for qid, qtext in _BM25_QUERIES
        ]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        docs = read_table(spark, d, "documents", widen=True)
        qdf = spark.createDataFrame(qrows, "query_id long, query_text string")
        noop(txt.bm25_topk(docs, qdf, k=5))
        return time.perf_counter() - t0

    points = [("sf0.1", SRC, 1), ("sf1x", OUT, 10)]
    table: dict[str, dict] = {}
    for name in ("dedup_token_jaccard", "dedup_containment"):
        walls = {}
        for tag, d, _ in points:
            run_gate(name, d)  # warm (codegen + page cache)
            walls[tag] = round(min(run_gate(name, d) for _ in range(2)), 3)
        table[name] = {
            **walls,
            "ratio_10x_2nd_decade": round(walls["sf1x"] / walls["sf0.1"], 2),
        }
        print(name, table[name], flush=True)
    walls = {}
    for tag, d, n in points:
        run_bm25(d, n)
        walls[tag] = round(min(run_bm25(d, n) for _ in range(2)), 3)
    table["text_bm25_topk"] = {
        **walls,
        "ratio_10x_2nd_decade": round(walls["sf1x"] / walls["sf0.1"], 2),
        "note": "proportional 40-query batch at sf1x (4 per shard)",
    }
    print("text_bm25_topk", table["text_bm25_topk"], flush=True)

    out = {
        "metric": "second_decade_organic_r10",
        "value": max(v["ratio_10x_2nd_decade"] for v in table.values()),
        "unit": "worst_ratio_10x_data",
        "queries": {
            f"{q}:{k}": v
            for q, d in table.items()
            for k, v in d.items()
            if isinstance(v, (int, float))
        },
        "table": table,
        "corpus": "sf1x = 10 rotated-alphabet shards of sf0.1 documents "
                  "(disjoint vocab, identical per-shard statistics)",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    write_atomic(artifact, out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
