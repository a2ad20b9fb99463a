"""Per-cell encoding-error -> NULL recovery (mysql.lisp:64-98,
sqlite.lisp:55-75: bad cell -> NULL + logged pkey/column, row kept)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pgloader_spark.operators.encoding import decode_text_columns


def bad_bytes_df(spark):
    return spark.createDataFrame(
        [
            (1, bytearray(b"hello"), bytearray(b"ok")),
            (2, bytearray(b"\xff\xfebad"), bytearray(b"fine")),
            (3, None, bytearray(b"\x80")),
            (4, bytearray("café".encode()), None),
        ],
        "id long, a binary, b binary",
    )


def test_utf8_bad_cell_nulled_row_kept(spark):
    dec, rej = decode_text_columns(bad_bytes_df(spark), ["a", "b"], "id")
    rows = {r["id"]: (r["a"], r["b"]) for r in dec.collect()}
    assert len(rows) == 4  # no row dropped
    assert rows[1] == ("hello", "ok")
    assert rows[2] == (None, "fine")  # only the bad CELL nulled
    assert rows[3] == (None, None)  # source NULL stays NULL, bad b nulled
    assert rows[4] == ("café", None)
    rejects = {(r["pkey"], r["column"]): r["bytes_hex"] for r in rej.collect()}
    assert set(rejects) == {("2", "a"), ("3", "b")}
    assert rejects[("2", "a")].startswith("FFFE")


def test_utf8_path_stays_jvm_side(spark):
    """Plan contract: the common-charset recovery is pure Column
    expressions — no Python eval in the plan."""
    dec, _ = decode_text_columns(bad_bytes_df(spark), ["a"], "id")
    assert "EvalPython" not in dec._jdf.queryExecution().optimizedPlan().toString()


def test_non_utf8_charset_pandas_fallback(spark):
    df = bad_bytes_df(spark)
    # latin-1 maps every byte -> never rejects
    dec, rej = decode_text_columns(df, ["a"], "id", charset="latin-1")
    assert rej.count() == 0
    assert {r["id"]: r["a"] for r in dec.collect()}[2] == "ÿþbad"
    # ascii rejects anything with the high bit set
    dec2, rej2 = decode_text_columns(df, ["a"], "id", charset="ascii")
    got = {r["id"]: r["a"] for r in dec2.collect()}
    assert got[1] == "hello" and got[2] is None and got[4] is None
    assert {(r["pkey"], r["column"]) for r in rej2.collect()} == {
        ("2", "a"), ("4", "a"),
    }


def test_reject_log_file_written(spark, tmp_path):
    from pgloader_spark.operators.encoding import write_encoding_rejects

    _, rej = decode_text_columns(bad_bytes_df(spark), ["a", "b"], "id")
    n = write_encoding_rejects(rej, str(tmp_path), "db", "t")
    assert n == 2
    log_dir = tmp_path / "db" / "t.log"
    text = "\n".join(
        p.read_text() for p in log_dir.iterdir() if p.name.startswith("part-")
    )
    assert "pkey 2, column a" in text
    assert "Illegal utf-8 sequence 0xFFFE" in text


def test_decode_preserves_other_columns(spark):
    df = bad_bytes_df(spark).withColumn("n", F.col("id") * 10)
    dec, _ = decode_text_columns(df, ["a"], "id", charset="ascii")
    assert {r["id"]: r["n"] for r in dec.collect()} == {1: 10, 2: 20, 3: 30, 4: 40}
