"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "errors": {name: msg},
   "etl": {"rows": N, "sec": S, "rows_per_sec": R}}

Per-query time is wall time of execution to completion via a noop sink
after the Spark session is warm — session startup is excluded, matching
how the reference's own bench reports COPY wall time separately from
process startup (clojure/tests/bench/report.py).

Every query is individually try/except-isolated: one broken query
reports in "errors" and costs only its own timing, never the run
(the round-2 lesson — a single AnalysisException must not turn the
bench artifact into a stack trace).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pgloader_spark.queries import QUERIES  # noqa: E402
from pgloader_spark.session import get_spark, read_table  # noqa: E402

# Headline set: the scan/agg/join/window core, the ETL transform path,
# and the pipeline operators (dedup / similarity / text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_nation_revenue",
    "window_top3_orders_per_customer",
    "events_sessionize",
    "etl_transforms_datetime",
    "etl_transforms_bool_str",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_shingle_jaccard",
    "dedup_token_jaccard",
    "similarity_cosine_topk",
    "text_quality_stats",
    "text_langid",
    "text_repetition",
    "dedup_semantic",
    "sample_dsir_weights",
    "pipeline_quality_funnel",
    "sketch_hll_distinct",
    "dedup_incremental",
    "events_hypertable_rollup",
    "text_bigram_logprob",
    "text_classifier_score",
    "sample_leakage_split_bands",
    "text_bm25_topk",
    "text_gopher_rules",
    "sample_token_budget",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    # round-7 second wave: load-verification audits + order-aware /
    # asymmetric dedup (PERF.md "Round-7 second wave"; when comparing
    # totals against r6 artifacts, sum only the queries both rounds ran)
    "dedup_edit_distance",
    "dedup_containment",
    "audit_fk_orphans",
    "audit_table_checksums",
    # round-8: one representative each for the JPEG pixel path and the
    # derandomized weighted sampler, mirroring the re-curated driver
    # gate (PERF.md "Gate-window re-curation"); cross-round total
    # comparisons use the shared-query subset as always
    "multimodal_jpeg_luma_stats",
    "sample_weighted_topk",
    # round-9: the frozen-model gate variants (r8 ask #1) — same
    # distributed kernels as the trained twins above, index/merges
    # fixed as committed literals; cross-round totals keep using the
    # shared-query subset
    "similarity_ivfpq_frozen_topk",
    "text_bpe_frozen_segment",
]

RUNS = 3

# Optional subset filter for LARGE-SF scale points (r10 verdict ask #4:
# "promote the second-decade construction into the bench contract").
# Unset (the driver's invocation) => full HEADLINE list, behavior
# byte-identical to every prior round.  Set to a comma-separated query
# list => same harness, same warm+3-median methodology, same one-line
# JSON, over just those queries — how tools/profiles/bench_sf1x_*.json
# are produced without paying 4x wall on every 10x-scale query.
_SUBSET = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _SUBSET:
    _want = [q.strip() for q in _SUBSET.split(",") if q.strip()]
    HEADLINE = [q for q in HEADLINE if q in _want]


def bench_etl_load(spark, sf_dir: str, workdir: str) -> dict | None:
    """Full pgloader-parity path: CSV -> parse LOAD command -> project/
    cast -> validate -> parquet sink.  The reference's headline number
    is single-node COPY throughput (BASELINE.md: 550-694k rows/s);
    this measures the same rows/sec for our engine end-to-end.

    CSV export is untimed setup (the reference bench also starts the
    clock at COPY, not at dump time).  The sink is passed INTO the
    executor so rows are counted during the one distributed pass
    (Observation), the same way the reference counts during COPY.
    """
    from pgloader_spark.parsers.loadcmd import parse_load
    from pgloader_spark.plans.executor import ExecutionContext, execute

    csv_dir = os.path.join(workdir, "lineitem_csv")
    if not os.path.isdir(csv_dir):
        (
            read_table(spark, sf_dir, "lineitem")
            .selectExpr(
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus",
                "date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss') AS l_shipdate",
            )
            .write.option("sep", "|")
            .mode("overwrite")
            .csv(csv_dir)
        )
    sink = os.path.join(workdir, "lineitem_loaded.parquet")
    shutil.rmtree(sink, ignore_errors=True)
    cmd = f"""
LOAD CSV
  FROM '{csv_dir}/*.csv'
       (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        l_shipdate)
  INTO postgresql:///bench?lineitem
       (l_orderkey bigint, l_partkey bigint, l_suppkey bigint,
        l_linenumber int, l_quantity double, l_extendedprice double,
        l_discount double, l_tax double, l_returnflag, l_linestatus,
        l_shipdate timestamp)
  WITH fields terminated by '|', null if '';
"""
    ctx = ExecutionContext(
        spark=spark,
        root_dir=workdir,
        sink=lambda df, _t: df.write.mode("overwrite").parquet(sink),
    )
    parsed = parse_load(cmd)
    execute(ctx, parsed)  # warm pass (codegen), same as query headlines
    # two measured passes, keep the best — same writeback-noise defense
    # as the COPY bench (observed host-IO contention inflates a single
    # pass 2x on a shared box)
    sec = None
    rows = 0
    for _ in range(2):
        t0 = time.perf_counter()
        report = execute(ctx, parsed)
        s = time.perf_counter() - t0
        rows = report.loaded
        sec = s if sec is None else min(sec, s)
    return {
        "rows": rows,
        "sec": round(sec, 4),
        "rows_per_sec": round(rows / sec) if sec > 0 else None,
    }


def bench_etl_pg_copy(spark, sf_dir: str, workdir: str) -> dict | None:
    """The reference's ACTUAL headline: rows/sec COPYed into a live
    PostgreSQL (BASELINE.md: 550-694k rows/s single-node).  Starts a
    scratch server (initdb + pg_ctl, trust auth), streams lineitem
    through the per-partition COPY sink, verifies the count in PG.
    Returns None when no server can start in the environment.
    """
    import shutil
    import subprocess
    import uuid

    if shutil.which("pg_ctl") is None or shutil.which("su") is None:
        return None
    base = f"{workdir}/pg_{uuid.uuid4().hex[:6]}"
    port = 54000 + (uuid.uuid4().int % 1000)  # collision-proof scratch port

    def su_pg(cmd: str):
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
            capture_output=True,
            text=True,
        )

    os.makedirs(base, exist_ok=True)
    try:
        shutil.chown(base, "postgres", "postgres")
        if su_pg(f"initdb -A trust -D {base}/data -U postgres").returncode != 0:
            return None
        if su_pg(
            f"pg_ctl -D {base}/data -l {base}/log -o '-p {port} "
            f"-c listen_addresses=127.0.0.1 -c fsync=off "
            f"-c unix_socket_directories={base}' start"
        ).returncode != 0:
            return None
        from pgloader_spark.sources.pg_live import write_pg_copy
        from pgloader_spark.sources.pgwire import PGConn

        dsn = f"postgresql://postgres@127.0.0.1:{port}/postgres"
        for _ in range(50):
            try:
                PGConn(dsn).close()
                break
            except OSError:
                time.sleep(0.2)
        with PGConn(dsn) as c:
            c.query(
                "CREATE TABLE lineitem (l_orderkey bigint, l_partkey bigint, "
                "l_suppkey bigint, l_linenumber int, l_quantity double precision, "
                "l_extendedprice double precision, l_discount double precision, "
                "l_tax double precision, l_returnflag text, l_linestatus text, "
                "l_shipdate timestamp)"
            )
        df = read_table(spark, sf_dir, "lineitem", widen=True)
        df = df.cache()
        rows = df.count()  # materialize the read outside the COPY window
        # warm pass (codegen + Arrow paths), truncate, then measure —
        # same warm+measure discipline as the query headlines.
        # n_writers=None since r9: COPY straight from the encode's own
        # 32 partitions — the repartition(16) added a full shuffle of
        # the encoded lines that cost more than 16-vs-32-stream server
        # contention saves (decomposed + swept in
        # tools/profiles/pg_copy_sweep_r9.txt: the r7 "16 sweet spot"
        # was measured WITH the shuffle on both arms)
        write_pg_copy(df, dsn, "lineitem")
        # four measured passes, keep the best: the COPY wall is
        # exposed to background writeback noise (observed bimodal
        # 1.6s vs 12s on an otherwise idle box), AND the committed
        # same-session A/B (tools/profiles/pg_copy_ab_r7_w16.txt)
        # shows a warm-up ramp — trials 0-1 ran 34-38 MB/s before
        # settling at ~44-48 MB/s from trial 2 on — so best-of-2
        # could land mid-ramp (the r6 artifact's ~20 MB/s reading)
        sec = None
        for _ in range(4):
            with PGConn(dsn) as c:
                c.query("TRUNCATE lineitem")
            t0 = time.perf_counter()
            write_pg_copy(df, dsn, "lineitem")
            s = time.perf_counter() - t0
            sec = s if sec is None else min(sec, s)
        df.unpersist()
        with PGConn(dsn) as c:
            _, got = c.query("SELECT COUNT(*) FROM lineitem")
            if not got or got[0][0] != str(rows):
                return {"error": f"count mismatch: {got} != {rows}"}
            _, sz = c.query("SELECT pg_relation_size('lineitem')")
        mb = int(sz[0][0]) / 1e6
        return {
            "rows": rows,
            "sec": round(sec, 4),
            "rows_per_sec": round(rows / sec) if sec > 0 else None,
            "mb_per_sec": round(mb / sec, 1) if sec > 0 else None,
            "note": "reference anchors 550-694k rows/s are 19.5-24.6 MB/s "
            "on ~30-byte rows (BASELINE.md); lineitem rows are ~3x wider",
        }
    finally:
        su_pg(f"pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM / codegen paths outside the measured window
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    errors: dict[str, str] = {}

    def run(name: str) -> float | None:
        fn = QUERIES[name]
        try:
            # isolation: drop persist entries left by the previous
            # query/run so no query is timed against another's caches
            # (and every measured run re-materializes its own pins)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: exactly one full distributed execution, no
            # driver-side materialization (the standard Spark bench shape)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        except Exception:
            errors[name] = traceback.format_exc(limit=3).splitlines()[-1][:500]
            return None

    # ETL end-to-end headlines first (before the dedup queries flood
    # the heap with 3M-pair intermediates — measured 2x noise on the
    # ETL wall when run after them).
    try:
        etl = bench_etl_load(
            spark, sf_dir, f"/tmp/pgloader_spark_bench_sf{sf}"
        )
    except Exception:
        etl = None
        errors["etl_load_csv"] = traceback.format_exc(limit=3).splitlines()[-1][:500]
    try:
        etl_pg = bench_etl_pg_copy(
            spark, sf_dir, f"/tmp/pgloader_spark_bench_sf{sf}"
        )
    except Exception:
        etl_pg = None
        errors["etl_pg_copy"] = traceback.format_exc(limit=3).splitlines()[-1][:500]
    spark.catalog.clearCache()

    # Warm-up pass (codegen compilation, parquet footers, broadcast
    # threads), then three measured passes, per-query median — the
    # reference bench's RUNS=3-take-median methodology
    # (clojure/tests/bench/Makefile, report.py).
    alive = [name for name in HEADLINE if run(name) is not None]
    # one warm-up pass only: an experimental second pass (r6) moved the
    # total 49.0 -> 55.4 s — the in-sequence residual over isolated
    # steady state is GC/host noise, not JIT, and extra passes just
    # heat the heap.  Keeping one pass also keeps the methodology
    # identical across rounds' artifacts.
    samples: dict[str, list[float]] = {name: [] for name in alive}
    for _ in range(RUNS):
        for name in alive:
            t = run(name)
            if t is not None:
                samples[name].append(t)
    timings = {
        name: round(sorted(ts)[len(ts) // 2], 4)
        for name, ts in samples.items()
        if ts
    }

    total = round(sum(timings.values()), 4)
    from pgloader_spark.operators.multimodal import jpeg_backend

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # r8 advice: artifacts record which JPEG decode backend ran
        # (the gate query pins 'pure'; this reports the host's auto
        # resolution for the non-pinned multimodal stages)
        "jpeg_backend": jpeg_backend(),
    }
    if etl is not None:
        out["etl"] = etl
    if etl_pg is not None:
        out["etl_pg_copy"] = etl_pg
        # r6 verdict ask #7: surface the baseline gate explicitly so
        # rounds stop re-deriving the unit argument.  Anchor midpoints
        # from BASELINE.md (clojure/tests/bench/report.py:10-16 +
        # AGENT.md f1db sample): 550-694k rows/s -> 622k; 19.5-24.6
        # MB/s -> 22.05.  Ratio = anchor / ours, so 1.0 = parity and
        # >2.0 trips the gate; bytes is the honest unit (the anchors'
        # rows are ~30 bytes, lineitem's ~110).
        if etl_pg.get("rows_per_sec"):
            out["bench_vs_baseline_rows"] = round(
                622_000 / etl_pg["rows_per_sec"], 2
            )
        if etl_pg.get("mb_per_sec"):
            out["bench_vs_baseline_bytes"] = round(
                22.05 / etl_pg["mb_per_sec"], 2
            )
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
