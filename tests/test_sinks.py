"""Sink tests: validation-first reject isolation + COPY encoding
(reference: src/pg-copy/copy-retry-batch.lisp semantics,
src/utils/reject.lisp, src/pg-copy/copy-format.lisp)."""

from __future__ import annotations

import glob
import os

import pytest

from pgloader_spark.sinks.copy_encode import encode_rows_to_copy, encode_value
from pgloader_spark.sinks.validate import (
    ColumnRule,
    load_with_isolation,
    split_valid,
    write_rejects,
)


@pytest.fixture()
def messy_df(spark):
    return spark.createDataFrame(
        [
            ("1", "2024-01-15", "alice"),
            ("notanint", "2024-02-01", "bob"),      # bad id
            ("3", "junkdate", "carol"),             # bad date
            ("4", "2024-03-10", None),              # null name (NOT NULL col)
            ("5", "2024-04-01", "eve"),
        ],
        "id string, d string, name string",
    )


RULES = [
    ColumnRule("id", cast_to="bigint", not_null=True),
    ColumnRule("d", cast_to="date"),
    ColumnRule("name", not_null=True),
]


def test_split_valid(messy_df):
    res = split_valid(messy_df, RULES)
    good_ids = sorted(r["id"] for r in res.good.collect())
    assert good_ids == [1, 5]
    # casts applied on the good side
    assert dict(res.good.dtypes)["id"] == "bigint"
    assert dict(res.good.dtypes)["d"] == "date"
    bad = {r["id"]: r["_errors"] for r in res.rejects.collect()}
    assert set(bad) == {"notanint", "3", "4"}
    assert bad["notanint"] == ["id: invalid bigint"]
    assert bad["4"] == ["name: invalid value"]


def test_write_rejects(messy_df, tmp_path):
    res = split_valid(messy_df, RULES)
    n = write_rejects(res, str(tmp_path), "db", "people")
    assert n == 3
    dat = glob.glob(str(tmp_path / "db" / "people.dat" / "part-*"))
    log = glob.glob(str(tmp_path / "db" / "people.log" / "part-*"))
    dat_lines = sorted(
        ln for f in dat for ln in open(f).read().splitlines() if ln
    )
    assert "3\tjunkdate\tcarol" in dat_lines
    assert "4\t2024-03-10\t\\N" in dat_lines
    log_text = "".join(open(f).read() for f in log)
    assert "people: d: invalid date" in log_text


def test_on_error_stop(messy_df, tmp_path):
    with pytest.raises(ValueError, match="on error stop"):
        load_with_isolation(
            messy_df, RULES, str(tmp_path), "db", "people", on_error_stop=True
        )


def test_isolation_accounting(messy_df, tmp_path):
    res = load_with_isolation(messy_df, RULES, str(tmp_path), "db", "people")
    assert res.error_count == 3
    assert res.good.count() == 2


def test_all_valid_no_reject_files(spark, tmp_path):
    df = spark.createDataFrame([("1", "x")], "id string, name string")
    res = load_with_isolation(
        df, [ColumnRule("id", cast_to="int")], str(tmp_path), "db", "t"
    )
    assert res.error_count == 0
    assert not os.path.exists(tmp_path / "db" / "t.dat")


def test_encode_value():
    assert encode_value(None) == "\\N"
    assert encode_value(True) == "t"
    assert encode_value("a\tb\nc") == "a\\tb\\nc"
    assert encode_value(b"\xde\xad") == "\\\\xdead"
    assert encode_value(42) == "42"


def test_encode_rows():
    buf = encode_rows_to_copy([(1, None, "x\ty")])
    assert buf.read() == "1\t\\N\tx\\ty\n"


def test_copy_stream_cap(spark):
    """r9: with n_writers unset the COPY sink keeps the input's own
    partitioning up to the 64-stream ceiling, then caps — a wide
    cluster input must not map one PG connection per task (stock
    max_connections is 100)."""
    from pgloader_spark.sources.pg_live import (
        _MAX_DEFAULT_STREAMS,
        _cap_copy_streams,
    )

    lines = spark.range(1000).selectExpr("CAST(id AS STRING) AS line")
    assert (
        _cap_copy_streams(lines.repartition(8), None).rdd.getNumPartitions()
        == 8
    )
    wide = lines.repartition(100)
    assert (
        _cap_copy_streams(wide, None).rdd.getNumPartitions()
        == _MAX_DEFAULT_STREAMS
    )
    assert _cap_copy_streams(wide, 16).rdd.getNumPartitions() == 16
