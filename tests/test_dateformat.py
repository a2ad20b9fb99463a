"""PG to_char-style -> Spark datetime format translation tests.

Ref: pgloader src/parsers/date-format.lisp:13-145.
"""

from __future__ import annotations

from pgloader_spark.parsers.dateformat import pg_to_spark_datetime_format as conv


def test_basic_tokens():
    assert conv("YYYY-MM-DD") == "yyyy-MM-dd"
    assert conv("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"


def test_subsecond_and_ampm():
    assert "S" in conv("HH24:MI:SS.MS")
    assert conv("HH12:MI AM").startswith("hh:mm")


def test_passthrough_separators():
    assert conv("YYYY/MM/DD") == "yyyy/MM/dd"
