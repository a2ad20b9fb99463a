"""Sketch operators: error bounds vs exact answers + scale contracts.

The oracle queries (queries_pipeline.py sketch_*) already pin the
sketch MATH exactly against DuckDB; these tests pin what the math is
FOR — the estimates must actually be close to the exact answers — and
the plan shapes that make them constant-memory at corpus scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pgloader_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_counters,
    cms_estimate,
    histogram_quantiles,
    hll_distinct,
)
from pgloader_spark.operators.text import tokens
from pgloader_spark.session import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF, "events")


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def test_hll_within_error_bound(spark, events):
    """HLL with m=4096 registers has ~1.04/sqrt(m) = 1.6% standard
    error; demand every group lands within 4 sigma."""
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(events, "user_id", ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(0.065 * n, 2.0), (k, est[k], n)


def test_hll_partitioning_invariant(spark, events):
    """The estimate must not depend on the physical layout (integer
    register state; float math only in the final per-group fold)."""
    a = hll_distinct(events, "user_id", ["event_type"])
    b = hll_distinct(events.repartition(97, "value"), "user_id", ["event_type"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hll_plan_two_aggregations_no_key_shuffle(spark, events):
    """Scale contract: both groupBys carry partial_ aggregates
    (map-side combine) and the shuffled keys are (group, register),
    bounded by 4096 * |groups| — never one row per distinct user."""
    plan = (
        hll_distinct(events, "user_id", ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan  # register build combines map-side
    assert "partial_sum" in plan or "partial_count" in plan
    assert plan.count("Exchange") <= 2


def test_cms_overestimates_never_under(spark, docs):
    items = docs.select(F.explode(tokens("text")).alias("item"))
    counters = cms_counters(items).cache()
    n_stream = items.count()
    assert counters.count() <= CMS_D * CMS_W  # constant-size state
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    cand = exact.orderBy(F.desc("n_exact"), F.asc("item")).limit(50).cache()
    got = (
        cms_estimate(counters, cand.select("item"))
        .join(cand, "item")
        .collect()
    )
    assert len(got) == cand.count() > 0  # sf0.01 vocab is < 50 tokens
    for r in got:
        assert r["est_count"] >= r["n_exact"], r  # CM never undercounts
        # expected overcount per row is ~n_stream/w; min over d rows is
        # far smaller — 3x the single-row expectation is a loose lid
        assert r["est_count"] - r["n_exact"] <= max(3.0 * n_stream / CMS_W, 2), r


def test_quantile_thresholds_bracket_exact(spark, docs):
    probs = [0.5, 0.9, 0.99]
    got = {
        r["p"]: r["threshold"]
        for r in histogram_quantiles(docs, F.length("text"), probs).collect()
    }
    n = docs.count()
    lo, hi = docs.agg(
        F.min(F.length("text")), F.max(F.length("text"))
    ).first()
    bin_width = (hi - lo) / 1024.0
    xs = sorted(r[0] for r in docs.select(F.length("text")).collect())
    for p in probs:
        exact = xs[min(int(p * n), n - 1)]
        thr = got[p]
        # at least p of the mass is <= threshold ...
        assert sum(1 for x in xs if x <= thr) >= p * n
        # ... and the threshold overshoots the exact quantile by at
        # most one bin width (the histogram's resolution guarantee)
        assert thr <= exact + bin_width + 1e-9, (p, thr, exact)


def test_quantile_constant_bins_plan(spark, docs):
    """The cumulative window runs over <= 1024 constant rows: its sort
    must sit above the histogram aggregate, never above the raw scan."""
    df = histogram_quantiles(docs, F.length("text"), [0.9])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # histogram aggregate (partial + final) appears below the window
    assert "partial_count" in plan


def test_hll_merge_equals_direct_union(spark):
    """Register max is associative: merging per-group register tables
    gives the SAME estimate as sketching the union directly — the
    distributed-rollup property."""
    from pyspark.sql import functions as F

    from pgloader_spark.operators.sketches import (
        hll_distinct,
        hll_merged_rollup,
    )

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(5000)], "k long, source string"
    ).select(F.col("k").cast("string").alias("k"), "source")
    rolled = {
        r["source"]: r["est_distinct"]
        for r in hll_merged_rollup(df, "k", "source").collect()
    }
    direct_all = hll_distinct(
        df.withColumn("g", F.lit(1)), "k", ["g"]
    ).collect()[0]["est_distinct"]
    assert rolled["ALL"] == direct_all
    # and the merged estimate is a real union estimate, not a sum
    assert rolled["ALL"] < sum(v for k, v in rolled.items() if k != "ALL")
