"""Orchestration tests (reference: src/load/migrate-database.lisp,
src/utils/report.lisp)."""

from __future__ import annotations

import json
import threading

import pytest

from pgloader_spark.catalog import Catalog, Column, Index, FKey, Schema, Table
from pgloader_spark.plans.orchestrate import (
    MigrationSummary,
    TableResult,
    migrate,
    post_load_statements,
)


def _tables():
    return [
        Table("small", row_count_estimate=10),
        Table("huge", row_count_estimate=10_000),
        Table("mid", row_count_estimate=500),
    ]


def test_migrate_runs_all_largest_first():
    seen = []
    lock = threading.Lock()

    def load(t):
        with lock:
            seen.append(t.name)
        return (t.row_count_estimate, t.row_count_estimate, 0)

    hooks = []
    s = migrate(
        _tables(),
        load,
        workers=1,  # serial so submission order is observable
        prepare=lambda: hooks.append("prepare"),
        complete=lambda: hooks.append("complete"),
    )
    assert seen == ["huge", "mid", "small"]
    assert hooks == ["prepare", "complete"]
    assert [r.table for r in s.results] == ["huge", "mid", "small"]
    assert sum(r.loaded for r in s.results) == 10_510


def test_migrate_isolates_failures():
    def load(t):
        if t.name == "mid":
            raise ValueError("boom")
        return (1, 1, 0)

    s = migrate(_tables(), load, workers=2)
    by_name = {r.table: r for r in s.results}
    assert by_name["mid"].failed == "boom"
    assert by_name["huge"].loaded == 1
    assert by_name["small"].loaded == 1


def test_migrate_on_error_stop():
    def load(t):
        if t.name == "huge":
            raise ValueError("boom")
        return (1, 1, 0)

    with pytest.raises(RuntimeError, match="huge failed"):
        migrate(_tables(), load, workers=1, on_error_stop=True)


def test_summary_formats():
    s = MigrationSummary(
        results=[
            TableResult("a", read=100, loaded=99, errors=1, seconds=1.5),
            TableResult("b", read=5, loaded=5, errors=0, seconds=0.25),
        ]
    )
    text = s.to_text()
    assert "table name" in text
    assert "Total import time" in text
    assert "105" in text  # total read
    csv = s.to_csv()
    assert csv.splitlines()[1] == "a;100;99;1;1.500"
    data = json.loads(s.to_json())
    assert data["tables"][0]["table"] == "a"
    assert data["total_seconds"] == 1.75


def test_post_load_statements_order():
    cat = Catalog(
        "db",
        [
            Schema(
                "public",
                [
                    Table(
                        "t",
                        columns=[
                            Column("id", "bigint", extra={"serial": True}),
                            Column("v", "text"),
                        ],
                        indexes=[
                            Index("t_pkey", "t", ["id"], unique=True, primary=True),
                            Index("t_v_idx", "t", ["v"]),
                        ],
                        fkeys=[FKey("t_fk", "t", ["v"], "other", ["v"])],
                    )
                ],
            )
        ],
    )
    stmts = post_load_statements(cat)
    assert stmts[0] == "ALTER TABLE t ADD PRIMARY KEY (id);"
    assert stmts[1].startswith("CREATE INDEX t_v_idx")
    assert "FOREIGN KEY" in stmts[2]
    assert stmts[3].startswith("SELECT setval('t_id_seq'")
