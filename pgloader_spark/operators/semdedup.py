"""SemDeDup-style semantic deduplication over an embedding column.

Semantic dedup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) removes
documents whose EMBEDDINGS are near-identical even when their text is
not: cluster the corpus with k-means, compare pairs only WITHIN a
cluster, and keep one representative per near-duplicate set.

Scale design (the reason this is not ``dedup.embedding_near`` with a
threshold):

- **Cluster assignment is a narrow map.**  Centroids are a
  driver-sized list inlined as literals (`similarity.ivf_assign`), so
  assignment costs zero shuffles and zero joins.
- **The only wide operation is one groupBy on the cell id.**  Each
  cell's pairwise-cosine matrix is computed INSIDE its task as a
  single BLAS matmul over an Arrow batch (`applyInPandas`) — the same
  dense-gram kernel the paper runs per cluster.  This was measured
  ~1000x faster than expressing the pair cosine as a within-cell
  self-join with an interpreted `aggregate`/`zip_with` dot fold
  (~60 us/pair, and SQL higher-order functions never enter
  whole-stage codegen), and it never materializes the exploded pair
  table at all.  Pandas here is the documented exception, not a
  cop-out: the per-pair built-in path is quadratically many
  interpreted fold evaluations, while one zgemm per cell is the
  textbook kernel.
- **Keep-policy is one-shot, not iterative.**  A vector is dropped
  iff SOME lower-id vector in the same cell is within the cosine
  threshold.  This is the parallel-safe variant of the paper's greedy
  per-cluster scan: fully deterministic (ids induce the total order),
  no sequential dependency across cells.  The sequential greedy
  (drop only against SURVIVING lower ids) needs an ordered in-cell
  scan for a marginally larger keep-set; at pretraining scale the
  cheap superset-drop is the standard choice.
- **Cell population is the contract.**  `suggest_n_centroids` holds
  cells at ~1024 vectors (K proportional to N), which (a) keeps total
  pair work linear in the corpus, (b) keeps the per-cell gram matrix
  a few MB, and (c) gives the groupBy N/1024 keys of parallelism.  A
  fixed K is quadratic AND serializes onto K tasks — the 10x scale
  probe measured fixed-K=8 at >30 min on one task vs seconds with
  K = N/1024.

Determinism vs the SQL oracle: cosine is double-rounded (6 then 4
decimals) before the threshold compare, so the BLAS summation order
(pairwise/SIMD) and the oracle's sequential fold land on the same
value except within half-an-ulp of a 6th-decimal boundary — the same
defense `dedup_embedding_near` uses between Spark and DuckDB.

Reference anchor: the reference engine has no embedding operators at
all (flat relational ETL, src/pgloader.lisp) — this module is part of
the training-data-pipeline surface this engine adds on top of parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgloader_spark.operators import similarity


def _round_half_away(x, decimals: int):
    """Decimal rounding with DuckDB/Spark semantics (HALF UP = half
    away from zero; DuckDB's ``round`` is ``std::round(x*10^d)/10^d``)
    — NOT ``np.round``, which is banker's half-EVEN: a cosine landing
    exactly on a ``.xxxx50`` boundary rounds differently under the
    two modes, and at sf0.1 five of 391 oracle pairs sit on one
    (found r10; sf0.01's pair set happens to contain none, which is
    why the gate never caught it)."""
    import numpy as np

    f = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def semantic_dedup(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
) -> DataFrame:
    """Survivors of cluster-blocked cosine dedup: (id, cell) rows.

    ``centroids`` come from ``similarity.ivf_centroids`` (deterministic
    first-K) or ``ivf_centroids_kmeans`` (Lloyd-refined; better-balanced
    cells); both are driver-sized literal lists, so the assignment map
    never shuffles.

    ``block_rows`` bounds the gram-matrix working set to
    ``block_rows x cell_size`` doubles for cells that exceed the
    ~1024-vector design population (a mega-cell still computes, in
    strips, instead of allocating cell_size^2 at once).
    """
    import pandas as pd

    def _dedup_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        order = pdf["id"].to_numpy().argsort()
        ids = pdf["id"].to_numpy()[order]
        V = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        n2 = (V * V).sum(axis=1)
        m = len(ids)
        dropped = np.zeros(m, dtype=bool)
        for lo in range(0, m, block_rows):
            hi = min(lo + block_rows, m)
            # cos of rows [lo:hi) against EVERY row, oracle formula
            # dot / sqrt(n2_a * n2_b), double-rounded; the denominator
            # is built per strip — a full m x m outer product would
            # allocate cell_size^2 doubles no matter the blocking
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = V[lo:hi] @ V.T / np.sqrt(n2[lo:hi, None] * n2[None, :])
            cos = _round_half_away(_round_half_away(cos, 6), 4)
            # a strictly-lower ID in the same cell within tau drops us;
            # ids are sorted, so "lower id" = strictly-lower column index
            hit = cos >= tau
            col = np.arange(m)
            row = np.arange(lo, hi)[:, None]
            hit &= col[None, :] < row  # j < i by sorted position
            dropped[lo:hi] |= hit.any(axis=1)
        keep = pdf.iloc[:0][["id", "cell"]].copy()
        if (~dropped).any():
            keep = pd.DataFrame(
                {"id": ids[~dropped], "cell": pdf["cell"].iloc[0]}
            )
        return keep

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    base = base.withColumn("cell", similarity.ivf_assign(F.col("v"), centroids))
    out = base.groupBy("cell").applyInPandas(_dedup_cell, "id long, cell int")
    return out.select(F.col("id").alias(id_col), F.col("cell").cast("int").alias("cell"))


def suggest_n_centroids(n_rows: int, target_cell: int = 1024) -> int:
    """K = N / target_cell, floored at 8: hold the expected CLUSTER
    SIZE constant as the corpus grows.  Within-cell pair work is
    K·(N/K)²/2 = N·(N/K)/2, so a fixed K is quadratic in the corpus
    and even K=sqrt(N) still leaves N^1.5 — only K ∝ N (constant
    cell population c) keeps total pair work at N·c/2 = O(N), which
    is how SemDeDup runs at web scale (the paper uses fixed-size
    k-means clusters for exactly this reason).  A fixed K like the
    oracle query's K=8 is only safe at fixed test scale; pass
    ``ivf_centroids(emb, suggest_n_centroids(emb.count()))`` when the
    input size is not known a priori.  K also bounds the cell
    groupBy's parallelism (one task per cell), so growing K with N
    keeps 1000 executors busy where K=8 would idle 992 of them.
    """
    return max(8, n_rows // target_cell)


def blocked_near_pairs(
    emb: DataFrame,
    block_col: str = "label",
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
) -> DataFrame:
    """(id_a, id_b, cos_sim) near-duplicate pairs within each block —
    the pair-emitting sibling of ``semantic_dedup`` (same per-block
    row-blocked gram kernel, same double-rounded cosine), for
    pipelines that feed pairs into connected components / canonical
    election instead of dropping in place.

    The block key plays the LSH-bucket role: one keyed shuffle, the
    cross product never leaves its task, and the output is only the
    pairs above ``tau``.
    """
    import pandas as pd

    def _pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        order = pdf["id"].to_numpy().argsort()
        ids = pdf["id"].to_numpy()[order]
        V = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        n2 = (V * V).sum(axis=1)
        m = len(ids)
        out_a, out_b, out_c = [], [], []
        for lo in range(0, m, block_rows):
            hi = min(lo + block_rows, m)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = V[lo:hi] @ V.T / np.sqrt(n2[lo:hi, None] * n2[None, :])
            cos = _round_half_away(_round_half_away(cos, 6), 4)
            col = np.arange(m)
            row = np.arange(lo, hi)[:, None]
            r, c = np.nonzero((cos >= tau) & (col[None, :] > row))
            out_a.append(ids[r + lo])
            out_b.append(ids[c])
            out_c.append(cos[r, c])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "cos_sim": np.concatenate(out_c) if out_c else np.array([]),
            }
        )

    base = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    return base.groupBy("blk").applyInPandas(
        _pairs, "id_a long, id_b long, cos_sim double"
    )
