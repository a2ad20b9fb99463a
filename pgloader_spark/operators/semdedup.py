"""SemDeDup-style semantic deduplication over an embedding column.

Semantic dedup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) removes
documents whose EMBEDDINGS are near-identical even when their text is
not: cluster the corpus with k-means, compare pairs only WITHIN a
cluster, and keep one representative per near-duplicate set.

Scale design (the reason this is not ``dedup.embedding_near`` with a
threshold):

- **Cluster assignment is a narrow map.**  Centroids are a
  driver-sized list (K ≈ sqrt(N) even at 100 TB corpus scale) inlined
  as literals (`similarity.ivf_assign`), so assignment costs zero
  shuffles and zero joins.
- **The only wide operation is the within-cell self-join** — the
  cross product is bounded per cell (N/K expected rows per side), and
  the shuffle key is the cell id, so 1000 executors each handle a
  slice of cells.  AQE's skew-join split handles a pathological
  mega-cluster.
- **Keep-policy is one-shot, not iterative.**  A vector is dropped
  iff SOME lower-id vector in the same cell is within the cosine
  threshold.  This is the parallel-safe variant of the paper's greedy
  per-cluster scan: one self-join plus one anti-join, no sequential
  dependency across the corpus, and fully deterministic (ids induce
  the total order).  The sequential greedy (drop only against
  SURVIVING lower ids) needs a per-cluster ordered scan — O(cluster)
  critical path — for a marginally larger keep-set; at pretraining
  scale the cheap superset-drop is the standard choice.

Reference anchor: the reference engine has no embedding operators at
all (flat relational ETL, src/pgloader.lisp) — this module is part of
the training-data-pipeline surface this engine adds on top of parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgloader_spark.operators import similarity


def semantic_dedup(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Survivors of cluster-blocked cosine dedup: (id, cell) rows.

    ``centroids`` come from ``similarity.ivf_centroids`` (deterministic
    first-K) or ``ivf_centroids_kmeans`` (Lloyd-refined); both are
    driver-sized literal lists, so the assignment map never shuffles.

    Cosine is double-rounded (6 then 4 decimals) before the threshold
    comparison so engine-level last-ulp drift cannot flip a keep/drop
    decision (same defense as ``dedup_embedding_near``).
    """
    base = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("cell", similarity.ivf_assign(F.col("v"), centroids))
        .withColumn("n2", similarity.norm2(F.col("v")))
    )
    a = base.select(
        "cell",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("n2").alias("na"),
    )
    b = base.select(
        "cell",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n2").alias("nb"),
    )
    cos = F.round(
        F.round(
            similarity.dot(F.col("va"), F.col("vb"))
            / F.sqrt(F.col("na") * F.col("nb")),
            6,
        ),
        4,
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= tau)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return base.join(dropped, "id", "left_anti").select(
        F.col("id").alias(id_col), F.col("cell").cast("int").alias("cell")
    )
