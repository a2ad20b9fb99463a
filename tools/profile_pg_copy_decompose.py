"""Decompose the COPY wall: Spark-side encode vs server-side write
(r10 verdict ask #7 — name the component behind the bimodal
writeback band seen on unchanged code: 763k rows/s in r9 vs 631k in
r10, best-of-4 both).

Three arms, interleaved in one session against one scratch server:

- ``encode``: the exact `to_copy_lines(df)` expression chain the sink
  runs, to a noop sink — pure Spark encode wall, no server.
- ``copy_cached``: `write_pg_copy` reading the ENCODED LINES from a
  spillable pin (materialized + counted before the window) — wire +
  server wall with the encode amortized out.
- ``copy_full``: `write_pg_copy` from the raw cached df — the bench's
  own shape (encode + wire + server in one pass).

Per trial: wall seconds plus /proc/meminfo Dirty+Writeback KB before
and after, and 1-min loadavg — so a writeback-band trial is visible
AS a writeback-band trial in the artifact.

Usage: python tools/profile_pg_copy_decompose.py tools/profiles/pg_copy_decompose_r11.jsonl [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgloader_spark.session import get_spark, read_table  # noqa: E402


def meminfo_kb() -> dict:
    out = {}
    with open("/proc/meminfo") as fh:
        for line in fh:
            k, v = line.split(":", 1)
            if k in ("Dirty", "Writeback"):
                out[k] = int(v.strip().split()[0])
    return out


def main() -> int:
    artifact = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if shutil.which("pg_ctl") is None or shutil.which("su") is None:
        print(json.dumps({"error": "no pg_ctl/su in environment"}))
        return 1

    from pyspark.storagelevel import StorageLevel

    from pgloader_spark.sources.copytext import to_copy_lines
    from pgloader_spark.sources.pg_live import write_pg_copy
    from pgloader_spark.sources.pgwire import PGConn

    spark = get_spark("pg_copy_decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = f"/tmp/pg_copy_dec_{uuid.uuid4().hex[:6]}"
    port = 54000 + (uuid.uuid4().int % 1000)

    def su_pg(cmd: str):
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
            capture_output=True,
            text=True,
        )

    os.makedirs(base, exist_ok=True)
    lines_out = []
    try:
        shutil.chown(base, "postgres", "postgres")
        if su_pg(f"initdb -A trust -D {base}/data -U postgres").returncode != 0:
            print(json.dumps({"error": "initdb failed"}))
            return 1
        if su_pg(
            f"pg_ctl -D {base}/data -l {base}/log -o '-p {port} "
            f"-c listen_addresses=127.0.0.1 -c fsync=off "
            f"-c unix_socket_directories={base}' start"
        ).returncode != 0:
            print(json.dumps({"error": "pg_ctl failed"}))
            return 1
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
        df = read_table(spark, sf_dir, "lineitem", widen=True).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        rows = df.count()
        enc = to_copy_lines(df).persist(StorageLevel.MEMORY_AND_DISK)
        enc.count()

        stmt = (
            "COPY lineitem (l_orderkey, l_partkey, l_suppkey, l_linenumber, "
            "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, l_shipdate) FROM STDIN"
        )

        def lines_sink(batches):
            # minimal replica of write_pg_copy's fast path, reading
            # pre-encoded lines (write_pg_copy itself re-encodes its
            # input, so the cached-lines arm cannot call it directly)
            import pandas as pd

            it = iter(batches)
            first = next(it, None)
            if first is None or len(first) == 0:
                yield pd.DataFrame({"n": [0]})
                return
            total = 0

            def chunks():
                nonlocal total
                b = first
                while b is not None:
                    if len(b):
                        total += len(b)
                        yield ("\n".join(b["line"]) + "\n").encode("utf-8")
                    b = next(it, None)

            with PGConn(dsn) as conn:
                conn.query("SET client_encoding TO 'UTF8'")
                conn.copy_in(stmt, chunks())
            yield pd.DataFrame({"n": [total]})

        from pyspark.sql import functions as F

        def arm_encode():
            to_copy_lines(df).write.format("noop").mode("overwrite").save()

        def arm_copy_cached():
            with PGConn(dsn) as c:
                c.query("TRUNCATE lineitem")
            n = (
                enc.mapInPandas(lines_sink, "n long")
                .agg(F.sum("n"))
                .collect()[0][0]
            )
            assert n == rows, f"cached-copy row mismatch {n} != {rows}"

        def arm_copy_full():
            with PGConn(dsn) as c:
                c.query("TRUNCATE lineitem")
            write_pg_copy(df, dsn, "lineitem")

        arms = {
            "encode": arm_encode,
            "copy_cached": arm_copy_cached,
            "copy_full": arm_copy_full,
        }
        for fn in arms.values():  # warm pass per arm
            fn()
        for i in range(trials):
            for name, fn in arms.items():
                pre = meminfo_kb()
                t0 = time.perf_counter()
                fn()
                sec = time.perf_counter() - t0
                post = meminfo_kb()
                rec = {
                    "trial": i,
                    "arm": name,
                    "sec": round(sec, 4),
                    "rows_per_sec": round(rows / sec),
                    "dirty_kb_pre": pre.get("Dirty"),
                    "dirty_kb_post": post.get("Dirty"),
                    "writeback_kb_post": post.get("Writeback"),
                    "load1": round(os.getloadavg()[0], 2),
                }
                lines_out.append(rec)
                print(json.dumps(rec), flush=True)
        by_arm = {}
        for r in lines_out:
            by_arm.setdefault(r["arm"], []).append(r["sec"])
        summary = {
            "summary": True,
            "rows": rows,
            "sf_dir": sf_dir,
            "median_sec": {
                k: sorted(v)[len(v) // 2] for k, v in by_arm.items()
            },
            "min_sec": {k: min(v) for k, v in by_arm.items()},
            "max_sec": {k: max(v) for k, v in by_arm.items()},
        }
        lines_out.append(summary)
        print(json.dumps(summary), flush=True)
        if artifact != "/dev/stdout":
            with open(artifact, "w") as fh:
                for r in lines_out:
                    fh.write(json.dumps(r) + "\n")
        return 0
    finally:
        su_pg(f"pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
