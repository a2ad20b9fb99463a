"""Connected components over near-duplicate pair lists.

Dedup pipelines emit PAIRS (MinHash/SimHash/Jaccard candidates); what a
training-data pipeline actually needs is CLUSTERS — "keep one document
per component".  This module resolves pairs into components with the
alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): each
iteration is two narrow groupBy-join rounds, converging in
O(log^2 n) iterations on any graph — the scale-correct choice over
naive label propagation, whose round count grows with graph DIAMETER
(a 10^6-long chain of near-dup docs needs 10^6 propagation rounds but
~40 star rounds).

Design notes for 100 TB:
- Each iteration shuffles the CURRENT edge set only (star operations
  monotonically shrink components toward their minimum; edge count
  never exceeds the input).
- ``localCheckpoint`` after each iteration truncates lineage — without
  it the plan doubles per round and the DAG scheduler, not the data,
  becomes the bottleneck by iteration ~15.
- Convergence = the canonical parent map stops changing; checked with
  a count + xor-of-hashes aggregate (one tiny job), not a collect of
  the edges.

The reference (dimitri/pgloader) has no graph operator; this extends
the dedup surface the same way its catalog "merge" walks FK graphs
(src/utils/catalog.lisp) — driver-side there, distributed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_parents(edges: DataFrame) -> DataFrame:
    """(node, parent) with parent = min neighbor seen so far, node > parent."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("node"), F.least("u", "v").alias("parent")
        )
        .groupBy("node")
        .agg(F.min("parent").alias("parent"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min neighbor."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point every smaller-or-equal neighbor of u at u's min neighbor."""
    # canonical direction: from the larger endpoint to the smaller
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    nbr = canon.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = mins.select("u", F.col("m").alias("v"))
    return nbr.union(self_edge).filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(parents: DataFrame) -> tuple[int, int]:
    row = parents.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            # decimal(38,0) sum: 64-bit hash values cannot overflow it
            F.sum(F.xxhash64("node", "parent").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sig"),
    ).collect()[0]
    return row["n"], row["sig"]


def _driver_components(edge_arr) -> "tuple":
    """Vectorized min-label propagation with edge collapse over an
    (E, 2) int64 edge array.  Per round: per-edge ``np.minimum.at``
    label exchange straight onto the |V|-sized label array (labels
    only decrease toward the component minimum, so the unbuffered
    in-place cascade is safe and FASTER to converge; numpy's indexed
    min fast path measured 100-400x over the r5 argsort+reduceat
    shape at 0.7-4M edges), pointer jumping, then edges rewrite under
    the new labels and intra-component edges drop — dense near-dup
    cliques collapse to zero edges in one round, chains shrink
    geometrically (hash-to-min shape, O(log n) rounds).  Surviving
    duplicate edges are kept as-is (the r5 packed-key np.unique cost
    ~0.5 s/round and bought nothing — dupes shrink with the same
    geometry).  Id compaction uses hash-based ``pd.factorize``
    (measured 200x over sorting ``np.unique`` at 0.7-3M edges on this
    host), so label indices follow APPEARANCE order, not id order —
    the propagated min-label is still one member per component (labels
    start as member indices and min only ever picks another member),
    and the final remap below elects the component's minimum NODE id,
    matching the star algorithm's election exactly."""
    import numpy as np
    import pandas as pd

    codes, uniques = pd.factorize(edge_arr.ravel())
    nodes = np.asarray(uniques, dtype=np.int64)
    e = codes.reshape(-1, 2).astype(np.int64)
    lab = np.arange(len(nodes), dtype=np.int64)
    for _ in range(64):
        if not e.shape[0]:
            break
        np.minimum.at(lab, e[:, 0], lab[e[:, 1]])
        np.minimum.at(lab, e[:, 1], lab[e[:, 0]])
        while True:  # pointer jumping: labels are node indices
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        # collapse: rewrite edges under labels, drop settled ones
        el = lab[e]
        e = el[el[:, 0] != el[:, 1]]
    else:
        raise RuntimeError("_driver_components: no fixpoint in 64 rounds")
    while True:  # late label drops re-resolve through the final jump
        nxt = lab[lab]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # elect the component MINIMUM id: the converged label slot is some
    # member's index (appearance order != id order under factorize);
    # fold every member's node id into its label slot and read back
    minid = nodes.copy()
    np.minimum.at(minid, lab, nodes)
    return nodes, minid[lab]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
    driver_edge_threshold: int = 4_000_000,
) -> DataFrame:
    """Resolve a pair list into (id, component) with component = min id.

    ``pairs``: DataFrame with two id columns (undirected edges).
    ``nodes``: optional (id) DataFrame; when given, isolated ids appear
    in the output as their own singleton components.

    Size-gated execution (the bpe_learn discipline — bounded state
    belongs on the driver, corpus-sized state on the cluster): the
    edge list is persisted (spillable) and counted — ONE full-width
    pair-generation pass; at or under ``driver_edge_threshold`` edges
    (default 4M ≈ 64 MB Arrow) the cached edges collect via Arrow and
    components resolve driver-side with vectorized min-label
    propagation — numpy-round work where the star loop pays seconds
    of per-iteration job-scheduling latency.  Above the gate (the
    100 TB regime: billion-edge near-dup graphs) the alternating
    large-star / small-star loop runs distributed, O(log^2 n)
    iterations on any graph shape, reading its FIRST iteration from
    the same cache — an overflowing probe costs nothing (this
    replaced the r5 LIMIT probe, which mutated the session-global
    ``spark.sql.limit.initialNumPartitions`` and discarded a full
    pair pass on overflow).  Callers that KNOW the graph is huge
    pass ``driver_edge_threshold=0``: no probe, no persist, straight
    to the star loop.  For integer ids both paths elect min-id and
    return identical (id long, component long) mappings (pinned by
    test; the explicit casts keep the schema independent of which
    integer width came in — r5 advice).  Non-integer ids (strings,
    decimals) run the star loop and PRESERVE the input type — casting
    a string id to long would silently null the whole mapping (r6
    advice); min-election is then the type's native ordering
    (lexicographic for strings).
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))

    utype, vtype = (f.dataType for f in edges.schema.fields)
    int_ids = all(
        f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
        for f in edges.schema.fields
    )
    # mixed integer WIDTHS are fine (both normalize to long below); the
    # guard only rejects pairs the preserved-type star path cannot
    # order consistently (e.g. string vs long — r6 advice, r7 review)
    if not int_ids and utype.simpleString() != vtype.simpleString():
        raise ValueError(
            f"connected_components: non-integer id columns must share one "
            f"type, got {id_a}={utype.simpleString()} vs "
            f"{id_b}={vtype.simpleString()}"
        )
    tbl = None
    pinned = None
    if driver_edge_threshold and int_ids:
        from pyspark.storagelevel import StorageLevel

        pinned = edges.persist(StorageLevel.MEMORY_AND_DISK)
        if pinned.count() <= driver_edge_threshold:
            tbl = pinned.toArrow()
            pinned.unpersist()
        else:
            edges = pinned  # star loop's first iteration reads the cache
    if tbl is not None:
        import numpy as np

        spark = pairs.sparkSession
        if tbl.num_rows == 0:
            parents = spark.createDataFrame([], f"{id_col} long, component long")
        else:
            arr = np.column_stack(
                [
                    tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64),
                    tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
            node_ids, comp = _driver_components(arr)
            import pyarrow as pa

            parents = spark.createDataFrame(
                pa.table({id_col: node_ids, "component": comp})
            )
        mapping = parents
        if nodes is not None:
            mapping = (
                nodes.select(F.col(id_col).cast("long").alias(id_col))
                .join(F.broadcast(mapping), id_col, "left")
                .select(
                    F.col(id_col),
                    F.coalesce("component", F.col(id_col)).alias("component"),
                )
            )
        return mapping

    if pinned is None:
        # star-path entry without a probe (threshold=0 / non-int ids):
        # iteration 0 otherwise re-derives the upstream pair pipeline
        # 4-6x (each star op consumes its sym view twice, and two star
        # ops run before the first checkpoint)
        from pyspark.storagelevel import StorageLevel

        pinned = edges.persist(StorageLevel.MEMORY_AND_DISK)
        edges = pinned
    prev: tuple[int, int] | None = None
    for i in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        if pinned is not None and i == 0:
            pinned.unpersist()  # checkpoint holds the data from here on
        fp = _fingerprint(_canonical_parents(edges))
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} iterations")

    # integer ids normalize to long (one schema across both gated
    # paths); other types pass through untouched — cast('long') on a
    # string id is silent NULLs, not a mapping (r6 advice, medium)
    _out = (lambda c: F.col(c).cast("long")) if int_ids else F.col
    parents = _canonical_parents(edges).select(
        _out("node").alias(id_col),
        _out("parent").alias("component"),
    )
    roots = parents.select(F.col("component").alias(id_col)).distinct().withColumn(
        "component", F.col(id_col)
    )
    mapping = parents.union(roots)
    if nodes is not None:
        node_t = "long" if int_ids else utype.simpleString()
        mapping = (
            nodes.select(F.col(id_col).cast(node_t).alias(id_col))
            .join(mapping, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("component", F.col(id_col)).alias("component"),
            )
        )
    return mapping


def component_stats(mapping: DataFrame) -> DataFrame:
    """(component, n_members) — cluster-size histogram input."""
    return mapping.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
