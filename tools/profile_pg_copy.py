"""Same-session A/B of the live-PostgreSQL COPY sink throughput.

Verdict r6 ask #1: BENCH_r05 recorded ~45 MB/s and BENCH_r06 ~20 MB/s
for `etl_pg_copy` on UNCHANGED sink code, and PERF.md's round-3
section still claims "steady state ~360k rows/s ~= 40 MB/s".  Per the
bench discipline (PERF.md "Measurement discipline": cross-session
deltas under ~2x are not evidence), the only way to settle this is
many trials in ONE session on the box as-is, committed raw.

Method (identical to bench.py's `bench_etl_pg_copy`, just more
trials): scratch initdb server (trust auth, fsync=off), lineitem at
the given SF cached + counted outside the window, one warm COPY pass,
then N truncate+COPY trials timed individually.  Per trial prints one
JSON line {trial, sec, rows_per_sec, mb_per_sec}; a final line gives
min/median/max plus loadavg before/after so host contention is
visible in the artifact.

Usage:  python tools/profile_pg_copy.py [sf_dir] [trials] [n_writers]
Output: JSON lines; committed raw runs live in tools/profiles/.
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # 0 = None = COPY from the input's own partitioning (no line
    # shuffle) — the r9 default; any other int forces that stream count
    n_writers = (int(sys.argv[3]) or None) if len(sys.argv) > 3 else None

    if shutil.which("pg_ctl") is None or shutil.which("su") is None:
        print(json.dumps({"error": "no pg_ctl/su in environment"}))
        return

    spark = get_spark("profile_pg_copy")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = f"/tmp/pg_copy_ab_{uuid.uuid4().hex[:6]}"
    port = 54000 + (uuid.uuid4().int % 1000)

    def su_pg(cmd: str):
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
            capture_output=True,
            text=True,
        )

    os.makedirs(base, exist_ok=True)
    load0 = os.getloadavg()
    try:
        shutil.chown(base, "postgres", "postgres")
        r = su_pg(f"initdb -A trust -D {base}/data -U postgres")
        if r.returncode != 0:
            print(json.dumps({"error": f"initdb: {r.stderr[-300:]}"}))
            return
        r = su_pg(
            f"pg_ctl -D {base}/data -l {base}/log -o '-p {port} "
            f"-c listen_addresses=127.0.0.1 -c fsync=off "
            f"-c unix_socket_directories={base}' start"
        )
        if r.returncode != 0:
            print(json.dumps({"error": f"pg_ctl: {r.stderr[-300:]}"}))
            return
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
        df = read_table(spark, sf_dir, "lineitem", widen=True).cache()
        rows = df.count()
        write_pg_copy(df, dsn, "lineitem", n_writers=n_writers)  # warm
        with PGConn(dsn) as c:
            _, sz = c.query("SELECT pg_relation_size('lineitem')")
        mb = int(sz[0][0]) / 1e6

        secs = []
        for i in range(trials):
            with PGConn(dsn) as c:
                c.query("TRUNCATE lineitem")
            t0 = time.perf_counter()
            write_pg_copy(df, dsn, "lineitem", n_writers=n_writers)
            s = time.perf_counter() - t0
            secs.append(s)
            print(
                json.dumps(
                    {
                        "trial": i,
                        "sec": round(s, 4),
                        "rows_per_sec": round(rows / s),
                        "mb_per_sec": round(mb / s, 1),
                    }
                ),
                flush=True,
            )
        with PGConn(dsn) as c:
            _, got = c.query("SELECT COUNT(*) FROM lineitem")
            assert got[0][0] == str(rows), f"count mismatch {got} != {rows}"
        ss = sorted(secs)
        med = ss[len(ss) // 2]
        print(
            json.dumps(
                {
                    "summary": {
                        "sf_dir": sf_dir,
                        "rows": rows,
                        "rel_mb": round(mb, 1),
                        "n_writers": n_writers,
                        "trials": trials,
                        "sec_min": round(ss[0], 4),
                        "sec_median": round(med, 4),
                        "sec_max": round(ss[-1], 4),
                        "rows_per_sec_best": round(rows / ss[0]),
                        "mb_per_sec_best": round(mb / ss[0], 1),
                        "rows_per_sec_median": round(rows / med),
                        "mb_per_sec_median": round(mb / med, 1),
                        "loadavg_before": [round(x, 2) for x in load0],
                        "loadavg_after": [
                            round(x, 2) for x in os.getloadavg()
                        ],
                    }
                }
            )
        )
    finally:
        su_pg(f"pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
