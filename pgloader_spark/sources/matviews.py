"""Materialized views: named SQL over source tables, copied as tables.

Re-expresses ``src/sources/common/matviews.lisp:14-60`` and the
``MATERIALIZE VIEWS`` DSL clause
(``src/parsers/command-materialize-views.lisp:1-47``): the reference
creates real views on the *source* database, migrates them as if they
were tables, then drops them. On Spark the equivalent is: register the
source tables as temp views, evaluate each view's SQL as a DataFrame
(Catalyst optimizes the view body together with downstream pruning),
and hand the result to the normal table pipeline — materialization to
the lake is just the parquet sink.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class MatView:
    """name + SQL body (or None -> an existing source view by name)."""

    name: str
    sql: str | None = None


def materialize_views(
    spark: SparkSession,
    views: list[MatView],
    register: bool = True,
) -> dict[str, DataFrame]:
    """Evaluate each view body; optionally register the result as a
    temp view so later views / queries can stack on it (the reference
    migrates views in declaration order, so self-references to earlier
    views work)."""
    out: dict[str, DataFrame] = {}
    for v in views:
        if v.sql is None:
            df = spark.table(v.name)
        else:
            df = spark.sql(v.sql)
        if register:
            df.createOrReplaceTempView(v.name)
        out[v.name] = df
    return out


def materialize_to_parquet(
    spark: SparkSession,
    views: list[MatView],
    out_dir: str,
) -> dict[str, str]:
    """The 'copied as tables' step: each view lands as a parquet
    table under ``out_dir/<name>``."""
    paths: dict[str, str] = {}
    for name, df in materialize_views(spark, views).items():
        path = f"{out_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
