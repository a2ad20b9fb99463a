"""Driver-gate window invariants.

The external correctness gate samples the FIRST 50 entries of
``queries()`` in registration order and value-hashes Spark vs the DuckDB
oracle with a TYPE-sensitive hash.  Round 3's only red row was an oracle
whose ``SUM(CASE..)`` silently widened to DuckDB HUGEINT (int128) — a
type Spark can never emit — so the hash mismatched despite identical
values.  These tests make that class of flake impossible to reintroduce:
every gate-window query must carry an oracle, and no oracle anywhere in
the registry may yield an int128 (or other Spark-inexpressible) column.

Pure DuckDB — no SparkSession needed, runs in seconds at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from pgloader_spark.queries import ORACLES, QUERIES
from pgloader_spark.session import TABLES

GATE_N = 50

# Types Spark SQL can produce (as DuckDB spells them).  Anything outside
# this set either hash-mismatches trivially (HUGEINT) or needs a second
# look before it enters an oracle.
_SPARK_EXPRESSIBLE = (
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "DECIMAL", "VARCHAR", "DATE", "TIMESTAMP",
    "BLOB", "INTERVAL",
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _gate_window() -> list[str]:
    return list(QUERIES)[:GATE_N]


def test_gate_window_is_full() -> None:
    assert len(QUERIES) >= GATE_N, "registry shrank below the gate size"


# r9: the two formerly rows-only families (IVF-PQ, BPE) now enter the
# window through their FROZEN-model variants (committed trained
# artifacts -> deterministic, SQL-expressible), so every window entry
# carries an oracle and the driver can report 50/50 hash rows.
def test_every_gate_query_has_an_oracle() -> None:
    missing = [n for n in _gate_window() if n not in ORACLES]
    assert not missing, (
        f"gate-window queries without oracles (driver records only a "
        f"weak rows-only check for these): {missing}"
    )


# r9 (r8 verdict ask #7): the re-curated window is the long-term
# comparability basis — pin EXACT membership and order so a registry
# reorder or an innocent-looking new registration cannot silently
# change what the driver measures.  Editing this list is a deliberate,
# reviewed act (document any change in PERF.md).
_PINNED_WINDOW = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority_exists", "q5_supplier_nation_revenue",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q12_priority_shipping", "q13_customer_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_types",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_discounted_revenue", "q20_excess_suppliers",
    "q21_sole_return_supplier", "q22_acctbal_opportunity",
    "events_sessionize", "window_top3_orders_per_customer",
    "join_asof_last_event", "join_range_bucket", "join_citus_backfill",
    "agg_grouping_sets",
    "etl_projection_constants", "etl_transforms_datetime",
    "dedup_exact", "dedup_minhash_bands", "dedup_token_jaccard",
    "dedup_containment", "dedup_edit_distance", "dedup_semantic",
    "similarity_cosine_topk", "similarity_ivfpq_frozen_topk",
    "sample_dsir_weights", "sample_weighted_topk",
    "text_quality_stats", "text_bm25_topk", "text_bpe_frozen_segment",
    "sketch_hll_distinct",
    "multimodal_binary_meta", "multimodal_jpeg_luma_stats",
    "audit_fk_orphans", "audit_table_checksums",
    "audit_checksum_buckets", "audit_key_skew",
]


def test_gate_window_membership_is_pinned() -> None:
    assert len(_PINNED_WINDOW) == GATE_N
    assert _gate_window() == _PINNED_WINDOW, (
        "the driver-gate window (first 50 registered queries) changed; "
        "if deliberate, update _PINNED_WINDOW and document the "
        "comparability break in PERF.md"
    )


def test_coverage_doc_counts_match_registry() -> None:
    """r9 (r8 verdict ask #6): doc counts are asserted, not
    hand-maintained — COVERAGE.md's header must state the live
    registry's oracle counts so the prose cannot rot."""
    import pathlib
    import sys

    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parent.parent / "tools")
    )
    from py_oracles import PY_ORACLES

    text = (
        pathlib.Path(__file__).resolve().parent.parent / "COVERAGE.md"
    ).read_text()
    expect = (
        f"{len(ORACLES)} SQL oracles\n+ {len(PY_ORACLES)} python oracles "
        f"= {len(ORACLES) + len(PY_ORACLES)} value-exact-checked queries"
    )
    assert expect in text, (
        f"COVERAGE.md header counts drifted from the registry; expected "
        f"the phrase {expect!r} — update the doc (or regenerate via "
        f"tools/gen_catalog.py output)"
    )


def _base_type(duck_type: str) -> str:
    # "DECIMAL(18,2)" -> "DECIMAL"; "DOUBLE[]" -> "DOUBLE" (lists of
    # expressible scalars are fine — Spark arrays).
    t = str(duck_type).upper().replace("[]", "")
    return t.split("(")[0].strip()


@pytest.mark.parametrize("name", list(ORACLES))
def test_oracle_types_are_spark_expressible(duck, name: str) -> None:
    rel = duck.sql(ORACLES[name])
    offending = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, rel.types)
        if _base_type(typ) not in _SPARK_EXPRESSIBLE
    ]
    assert not offending, (
        f"oracle '{name}' yields Spark-inexpressible column type(s) "
        f"{offending}; the driver's type-sensitive hash will mismatch — "
        f"CAST the expression (HUGEINT SUMs -> BIGINT) in the oracle SQL"
    )
