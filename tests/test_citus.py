"""Citus distribution tests: DDL, FK-path search, multi-hop backfill
joins (reference: src/utils/citus.lisp)."""

from __future__ import annotations

import pytest

from pgloader_spark.catalog import Catalog, Column, FKey, Schema, Table
from pgloader_spark.plans.citus import (
    DistributionRule,
    backfill_distribution_key,
    citus_ddl,
    find_fk_path,
)


def _catalog() -> Catalog:
    """lineitem -> orders -> customer (customer owns c_custkey —
    pretend the distribution key is 'c_nationkey' two hops up)."""
    customer = Table(
        "customer",
        columns=[Column("c_custkey"), Column("c_nationkey"), Column("c_name")],
    )
    orders = Table(
        "orders",
        columns=[Column("o_orderkey"), Column("o_custkey")],
        fkeys=[FKey("o_fk", "orders", ["o_custkey"], "customer", ["c_custkey"])],
    )
    lineitem = Table(
        "lineitem",
        columns=[Column("l_orderkey"), Column("l_qty")],
        fkeys=[FKey("l_fk", "lineitem", ["l_orderkey"], "orders", ["o_orderkey"])],
    )
    return Catalog("db", [Schema("public", [customer, orders, lineitem])])


def test_citus_ddl_reference_first():
    stmts = citus_ddl(
        [
            DistributionRule("orders", "o_custkey"),
            DistributionRule("nation"),  # reference table
        ]
    )
    assert stmts[0] == "SELECT create_reference_table('nation');"
    assert stmts[1] == "SELECT create_distributed_table('orders', 'o_custkey');"


def test_find_fk_path():
    cat = _catalog()
    assert find_fk_path(cat, "customer", "c_nationkey") == []
    one_hop = find_fk_path(cat, "orders", "c_nationkey")
    assert one_hop == [("orders", ["o_custkey"], "customer", ["c_custkey"])]
    two_hop = find_fk_path(cat, "lineitem", "c_nationkey")
    assert [h[0] for h in two_hop] == ["lineitem", "orders"]
    assert find_fk_path(cat, "lineitem", "no_such_column") is None


def test_backfill_two_hops(spark):
    cat = _catalog()
    dfs = {
        "customer": spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "c_custkey long, c_nationkey long, c_name string"
        ),
        "orders": spark.createDataFrame(
            [(100, 1), (101, 2)], "o_orderkey long, o_custkey long"
        ),
        "lineitem": spark.createDataFrame(
            [(100, 5), (100, 6), (101, 7)], "l_orderkey long, l_qty long"
        ),
    }
    out = backfill_distribution_key(dfs, cat, "lineitem", "c_nationkey")
    assert out.columns[0] == "c_nationkey"
    rows = sorted((r["c_nationkey"], r["l_orderkey"], r["l_qty"]) for r in out.collect())
    assert rows == [(10, 100, 5), (10, 100, 6), (20, 101, 7)]


def test_backfill_no_path_raises(spark):
    cat = _catalog()
    with pytest.raises(ValueError, match="no FK path"):
        backfill_distribution_key({}, cat, "lineitem", "missing_key")


def test_distribute_dsl_parsing():
    from pgloader_spark.parsers.loadcmd import parse_load

    cmd = parse_load(
        """
load database from mysql://u@h/db into postgresql:///db
 distribute companies using id
 distribute clicks using company_id from ads, campaigns
 distribute countries as reference;
"""
    )
    rules = cmd.options["distribute"]
    assert rules[0] == {"table": "companies", "column": "id", "from_tables": []}
    assert rules[1]["from_tables"] == ["ads", "campaigns"]
    assert rules[2]["column"] is None  # reference table
