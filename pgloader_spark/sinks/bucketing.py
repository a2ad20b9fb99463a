"""Bucketed-table sink: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders on
orderkey) is the shuffle of both sides. Bucketing pays that shuffle
ONCE at write time: `bucketBy(n, key)` hash-partitions rows into a
fixed bucket count inside each output table; any later equi-join or
aggregation on the bucket key reads both sides already co-partitioned
— Catalyst drops the Exchange on both sides (verified by plan
contract in tests/test_bucketing.py).

This is the Spark-native analogue of the reference's target-side
"same-key locality" concerns (Citus distribution keys,
`src/pgsql/pgsql-citus.lisp`): distribution decided at load time so
queries never re-shuffle. The DISTRIBUTE BY DSL clause maps naturally
onto a bucket spec.

Bucket-count guidance: buckets ~= total_size / target_partition_size
(128-512 MB each), and keep it a multiple of the cluster's executor
count so every core gets whole buckets. The count is FROZEN into the
table — changing it rewrites the data — so size for the table's
target scale, not today's.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BucketSpec:
    """How a table is pre-partitioned on disk."""

    key: str
    n_buckets: int
    sort_cols: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.n_buckets <= 0:
            raise ValueError("n_buckets must be positive")


def write_bucketed(
    df: DataFrame,
    table: str,
    spec: BucketSpec,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed managed table.

    Sorting within buckets (``sort_cols``) additionally enables
    sort-merge joins without the per-task sort step.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(spec.n_buckets, spec.key)
    if spec.sort_cols:
        w = w.sortBy(*spec.sort_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key with the same count.

    The plan contains NO Exchange on either side — the join consumes
    the buckets' stored partitioning. (With mismatched bucket counts
    Spark re-shuffles one side; keep co-joined tables on one spec.)
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
