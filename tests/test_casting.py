"""Cast-rule engine tests, mirroring the reference's in-code table
(src/sources/mysql/mysql-cast-rules.lisp:319-379 `test-casts`)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pgloader_spark.casting import CastEngine, CastResult, CastRule, SourceField


@pytest.fixture(scope="module")
def mysql():
    return CastEngine("mysql")


# (type, typemod, extra, unsigned, default) -> expected (pg_type, spark_type)
MYSQL_CASES = [
    (("int", None, "auto_increment", False, None), ("serial", T.LongType())),
    (("bigint", None, "auto_increment", False, None), ("bigserial", T.LongType())),
    (("tinyint", "(1)", None, False, None), ("boolean", T.BooleanType())),
    (("tinyint", "(4)", None, False, None), ("smallint", T.ShortType())),
    (("tinyint", None, None, True, None), ("smallint", T.ShortType())),
    (("int", None, None, True, None), ("bigint", T.LongType())),
    (("bigint", None, None, True, None), ("numeric(20,0)", T.DecimalType(20, 0))),
    (("decimal", "(10,2)", None, False, None), ("numeric", T.DecimalType(10, 2))),
    (("varchar", "(255)", None, False, None), ("varchar", T.StringType())),
    (("text", None, None, False, None), ("text", T.StringType())),
    (("blob", None, None, False, None), ("bytea", T.BinaryType())),
    (("datetime", None, None, False, None), ("timestamptz", T.TimestampType())),
    (("bit", "(1)", None, False, None), ("boolean", T.BooleanType())),
    (("bit", "(8)", None, False, None), ("bit varying", T.StringType())),
    (("json", None, None, False, None), ("jsonb", T.StringType())),
    (("unknowntype", None, None, False, None), ("text", T.StringType())),
]


@pytest.mark.parametrize("src,expected", MYSQL_CASES)
def test_mysql_default_rules(mysql, src, expected):
    tname, tmod, extra, unsigned, default = src
    res = mysql.cast(
        SourceField("c", tname, type_mod=tmod, extra=extra, unsigned=unsigned, default=default)
    )
    assert (res.pg_type, res.spark_type) == expected


def test_mysql_decimal_keeps_typemod(mysql):
    res = mysql.cast(SourceField("price", "decimal", type_mod="(12,4)"))
    assert res.type_mod == "(12,4)"
    assert res.spark_type == T.DecimalType(12, 4)


def test_mysql_zero_date_default_dropped(mysql):
    res = mysql.cast(SourceField("d", "datetime", default="0000-00-00 00:00:00"))
    assert res.transform == "zero-dates-to-null"
    assert res.drop_default
    assert res.default is None


def test_mysql_enum_generates_sqltype(mysql):
    res = mysql.cast(SourceField("status", "enum", type_mod="('a','b')", table_name="orders"))
    assert res.sqltype == "orders_status_t"  # enum-or-set-name _t suffix
    assert res.sqltype_kind == "enum"
    assert res.pg_type == "orders_status_t"


def test_mysql_set_generates_array_sqltype(mysql):
    res = mysql.cast(SourceField("features", "set", type_mod="('a','b')", table_name="film"))
    assert res.sqltype == "film_features_t"
    assert res.sqltype_kind == "set"
    assert res.pg_type == "film_features_t[]"
    assert res.transform == "set-to-enum-array"


def test_default_normalization(mysql):
    res = mysql.cast(SourceField("ts", "timestamp", default="now()"))
    assert res.default == "CURRENT_TIMESTAMP"
    res = mysql.cast(SourceField("n", "int", default="42"))
    assert res.default == "42"
    res = mysql.cast(SourceField("s", "varchar", type_mod="(10)", default="hi"))
    assert res.default == "'hi'"


def test_user_rule_first_match_wins(mysql_engine=None):
    eng = CastEngine(
        "mysql",
        user_rules=[
            CastRule(
                source_type="int",
                target=lambda f: CastResult("bigint", T.LongType()),
            )
        ],
    )
    assert eng.cast(SourceField("c", "int")).pg_type == "bigint"


def test_column_exact_match_beats_type_match():
    eng = CastEngine(
        "mysql",
        user_rules=[
            CastRule(
                column=("orders", "flag"),
                target=lambda f: CastResult("boolean", T.BooleanType()),
            )
        ],
    )
    res = eng.cast(SourceField("flag", "varchar", type_mod="(1)", table_name="orders"))
    assert res.pg_type == "boolean"
    # other tables unaffected
    res2 = eng.cast(SourceField("flag", "varchar", type_mod="(1)", table_name="other"))
    assert res2.pg_type == "varchar"


def test_sqlite_catchall_text():
    eng = CastEngine("sqlite")
    assert eng.cast(SourceField("x", "whatever")).pg_type == "text"
    assert eng.cast(SourceField("x", "integer")).pg_type == "bigint"


def test_mssql_rules():
    eng = CastEngine("mssql")
    assert eng.cast(SourceField("x", "uniqueidentifier")).transform == (
        "sql-server-uniqueidentifier-to-uuid"
    )
    assert eng.cast(SourceField("x", "money")).spark_type == T.DecimalType(19, 4)


def test_db3_rules():
    eng = CastEngine("db3")
    assert eng.cast(SourceField("x", "D")).transform == "db3-date-to-pgsql-date"
    assert eng.cast(SourceField("x", "L")).pg_type == "boolean"
