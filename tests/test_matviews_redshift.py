"""Materialized views + Redshift staging tests (reference:
src/sources/common/matviews.lisp, copy-rows-in-batch-through-s3.lisp)."""

from __future__ import annotations

import glob

from pgloader_spark.sinks.redshift import RedshiftCopyPlan, stage_for_redshift
from pgloader_spark.sources.matviews import (
    MatView,
    materialize_to_parquet,
    materialize_views,
)


def test_materialize_views_stack_in_order(spark):
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id int, grp string, v int"
    ).createOrReplaceTempView("base_t")
    views = [
        MatView("mv_sums", "SELECT grp, SUM(v) AS total FROM base_t GROUP BY grp"),
        MatView("mv_big", "SELECT * FROM mv_sums WHERE total > 10"),
    ]
    out = materialize_views(spark, views)
    assert {r["grp"]: r["total"] for r in out["mv_sums"].collect()} == {"a": 30, "b": 5}
    assert [r["grp"] for r in out["mv_big"].collect()] == ["a"]


def test_materialize_to_parquet(spark, tmp_path):
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("src_x")
    paths = materialize_to_parquet(
        spark, [MatView("mv_x", "SELECT x * 2 AS y FROM src_x")], str(tmp_path)
    )
    df = spark.read.parquet(paths["mv_x"])
    assert df.collect()[0]["y"] == 2


def test_redshift_copy_sql():
    plan = RedshiftCopyPlan(
        "s3://bkt/stage/orders", "public.orders",
        iam_role="arn:aws:iam::1:role/load", format="CSV", gzip=True,
    )
    assert plan.copy_sql() == (
        "COPY public.orders FROM 's3://bkt/stage/orders'"
        " IAM_ROLE 'arn:aws:iam::1:role/load' CSV GZIP"
    )


def test_redshift_staging_write(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    plan = RedshiftCopyPlan(str(tmp_path / "stage"), "t", format="CSV", gzip=False)
    stage_for_redshift(df, plan, num_files=2)
    files = glob.glob(str(tmp_path / "stage" / "part-*"))
    assert len(files) == 2
    rows = sorted(
        ln for f in files for ln in open(f).read().splitlines() if ln
    )
    assert rows == ["1,x", "2,y"]


def test_write_jsonl_shards_roundtrip(spark, tmp_path):
    from pgloader_spark.sinks.writers import write_jsonl

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, n_shards=4)
    import glob

    shards = glob.glob(out + "/part-*.json.gz")
    assert len(shards) == 4  # fixed shard count, gzip per shard
    back = spark.read.json(out)
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))
