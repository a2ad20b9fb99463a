"""Regression-test driver: the reference's ``--regress`` mode.

After a scenario loads, COPY the expected output file
(``regress/expected/<name>.out`` next to the command file) into a
shadow table created ``LIKE`` the target and demand
``expected EXCEPT actual`` be empty and the row counts match —
src/regress/regress.lisp:80-112 verbatim.  Point/json/xml columns
compare as text (no equality operator / nondeterministic formatting).
"""

from __future__ import annotations

import os


def expected_path_for(load_file: str) -> str | None:
    """regress/expected/<name>.out next to the command file
    (regress.lisp:22-34's pathname arithmetic)."""
    base = os.path.dirname(os.path.abspath(load_file))
    name = os.path.splitext(os.path.basename(load_file))[0]
    cand = os.path.join(base, "regress", "expected", name + ".out")
    return cand if os.path.exists(cand) else None


def regress_compare(target_dsn: str, table: str, expected_out: str) -> int:
    """Load the expected .out into ``expected.<table>`` and return the
    ``expected EXCEPT actual`` diff count (0 = pass).  Raises
    AssertionError when the row counts differ."""
    from pgloader_spark.sources.pgwire import PGConn

    data = open(expected_out, "rb").read()
    sch, _, bare = table.rpartition(".")
    sch = sch or "public"
    q = ".".join('"' + p + '"' for p in table.split("."))
    with PGConn(target_dsn) as c:
        c.query("CREATE SCHEMA IF NOT EXISTS expected")
        c.query(f'DROP TABLE IF EXISTS expected."{bare}"')
        c.query(f'CREATE TABLE expected."{bare}" (LIKE {q})')
        if data.strip():
            c.copy_in(f'COPY expected."{bare}" FROM STDIN', [data])
        _, cols = c.query(
            "SELECT column_name, data_type FROM information_schema.columns"
            f" WHERE table_schema = '{sch}' AND table_name = '{bare}'"
            " ORDER BY ordinal_position"
        )
        exprs = ", ".join(
            f'"{n}"::text' if t in ("point", "json", "xml") else f'"{n}"'
            for n, t in cols
        )
        _, diff = c.query(
            f'SELECT COUNT(*) FROM (SELECT {exprs} FROM expected."{bare}"'
            f" EXCEPT SELECT {exprs} FROM {q}) ss"
        )
        _, counts = c.query(
            f'SELECT (SELECT COUNT(*) FROM expected."{bare}"),'
            f" (SELECT COUNT(*) FROM {q})"
        )
    n_exp, n_act = int(counts[0][0]), int(counts[0][1])
    if n_exp != n_act:
        raise AssertionError(
            f"{table}: {n_act} rows loaded, expected {n_exp}"
        )
    return int(diff[0][0])
