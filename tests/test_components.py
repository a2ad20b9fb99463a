"""Connected-components operator: synthetic graph shapes.

The oracle query (`dedup_components`) covers the real-data path; these
pin the algorithm on adversarial shapes — long chains (the case naive
label propagation can't converge on in O(log n) rounds), stars,
multiple components, singletons, and the empty graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgloader_spark.operators.components import (
    component_stats,
    connected_components,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(None, None)],
        "id_a long, id_b long",
    ).filter(F.col("id_a").isNotNull())


def _as_dict(mapping):
    return {r["id"]: r["component"] for r in mapping.collect()}


def test_chain_collapses_to_min(spark):
    got = _as_dict(connected_components(_pairs(spark, [(i, i + 1) for i in range(1, 20)])))
    assert got == {i: 1 for i in range(1, 21)}


def test_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (100, 101), (100, 102), (100, 103)]
    got = _as_dict(connected_components(_pairs(spark, edges)))
    assert got == {10: 10, 11: 10, 12: 10, 100: 100, 101: 100, 102: 100, 103: 100}


def test_singletons_from_nodes_df(spark):
    nodes = spark.range(1, 8).select(F.col("id"))
    got = _as_dict(connected_components(_pairs(spark, [(2, 3), (5, 6)]), nodes=nodes))
    assert got == {1: 1, 2: 2, 3: 2, 4: 4, 5: 5, 6: 5, 7: 7}


def test_empty_edges(spark):
    nodes = spark.range(1, 4)
    got = _as_dict(connected_components(_pairs(spark, []), nodes=nodes))
    assert got == {1: 1, 2: 2, 3: 3}


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)]
    got = _as_dict(connected_components(_pairs(spark, edges)))
    assert got == {1: 1, 2: 1, 3: 1}


def test_component_stats(spark):
    mapping = connected_components(_pairs(spark, [(1, 2), (2, 3), (7, 8)]))
    stats = {
        r["component"]: r["n_members"] for r in component_stats(mapping).collect()
    }
    assert stats == {1: 3, 7: 2}


def test_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(
            _pairs(spark, [(1, 2), (2, 3)]),
            max_iter=0,
            driver_edge_threshold=0,  # the guard lives on the star loop
        )


def test_driver_and_distributed_paths_agree(spark):
    """The size-gated driver path (vectorized min-label propagation)
    and the star loop elect identical min-id mappings on randomized
    graphs: chains, cliques, stars, singleton mix."""
    import random

    rng = random.Random(13)
    edges = []
    # random blobs
    for base in (0, 1000, 2000, 3000):
        ids = [base + i for i in range(rng.randint(2, 30))]
        for _ in range(len(ids) * 2):
            a, b = rng.sample(ids, 2)
            edges.append((a, b))
    # a long chain (adversarial for propagation counts)
    edges += [(5000 + i, 5000 + i + 1) for i in range(60)]
    pairs = _pairs(spark, edges)
    via_driver = _as_dict(connected_components(pairs))
    via_stars = _as_dict(connected_components(pairs, driver_edge_threshold=0))
    assert via_driver == via_stars
    # every label is the component minimum
    comp_members: dict[int, list[int]] = {}
    for node, c in via_driver.items():
        comp_members.setdefault(c, []).append(node)
    for c, members in comp_members.items():
        assert c == min(members)


def test_driver_path_isolated_nodes_and_empty(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = _as_dict(
        connected_components(_pairs(spark, [(0, 1)]), nodes=nodes)
    )
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}
    got_empty = _as_dict(connected_components(_pairs(spark, []), nodes=nodes))
    assert got_empty == {i: i for i in range(5)}


def test_both_paths_return_long_schema_on_int_input(spark):
    """r5 advice: the same call must return one schema regardless of
    which gated path ran — (id long, component long) even for int ids."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    for thresh in (4_000_000, 0):  # driver path / star path
        out = connected_components(pairs, driver_edge_threshold=thresh)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ], f"threshold={thresh}"
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id int")
    for thresh in (4_000_000, 0):
        out = connected_components(pairs, nodes=nodes, driver_edge_threshold=thresh)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ], f"nodes, threshold={thresh}"


def test_string_ids_preserved_on_star_path(spark):
    """r6 advice (medium): non-integer ids route to the star loop,
    which must preserve the input type — the former unconditional
    cast('long') silently nulled every string id."""
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    out = connected_components(pairs)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "string",
    ]
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}
    # nodes df adds singletons in the same (string) type
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("z",)], "id string")
    got2 = {
        r["id"]: r["component"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got2 == {"a": "a", "b": "b", "c": "b", "d": "b", "z": "z"}


def test_mismatched_id_types_raise(spark):
    pairs = spark.createDataFrame([(1, "x")], "id_a long, id_b string")
    with pytest.raises(ValueError, match="must share one"):
        connected_components(pairs)


def test_mixed_integer_widths_still_normalize(spark):
    """r7 review: int id_a + bigint id_b was valid before the r7 type
    guard (both normalize to long) and must stay valid on BOTH gated
    paths."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a int, id_b bigint"
    )
    for thresh in (4_000_000, 0):
        out = connected_components(pairs, driver_edge_threshold=thresh)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ], f"threshold={thresh}"
        got = {r["id"]: r["component"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}, f"threshold={thresh}"


def test_overflow_probe_falls_through_to_star_loop(spark):
    """The r6 persist+count probe: when the edge count exceeds the
    gate, the star loop must run (and reuse the probe's cache) and
    still produce the same mapping — covers the unpersist-after-
    first-iteration path."""
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)]
    pairs = _pairs(spark, edges)
    gated = _as_dict(connected_components(pairs, driver_edge_threshold=2))
    full = _as_dict(connected_components(pairs))
    assert gated == full == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20
    }
