"""Skew-mitigation operators: salted two-stage aggregation.

AQE's skew-join handling splits oversized SHUFFLE partitions, but a
single hot GROUP BY key still funnels into one reducer task — the
classic straggler at 100 TB (one user_id with 10^9 events). Salting
splits each key into ``n_salts`` sub-keys for a first partial
aggregation, then combines the partials in a second, tiny aggregation:
the hot key's work spreads across ``n_salts`` tasks and the second
stage handles ``n_salts`` rows per key, not 10^9.

Only algebraic aggregates decompose this way (sum/count/min/max and
anything built from them, e.g. avg = sum/count); medians/distincts
need different machinery (approx sketches). The API takes the
decomposed form explicitly so misuse is impossible silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs``: name -> aggregate over raw rows (stage 1, keyed
    by key+salt). ``final_aggs``: name -> aggregate over stage-1 rows
    combining the partials (stage 2, keyed by key alone).

    ``salt_source``: column whose hash spreads rows across salts
    (defaults to a per-row nondeterministic salt via monotonically
    increasing id — deterministic REsults either way, since the final
    aggregate is salt-invariant by construction).

    Example (count + sum + avg):
        salted_agg(df, ["k"],
                   {"c": F.count(F.lit(1)), "s": F.sum("v")},
                   {"n": F.sum("c"), "total": F.sum("s")})
    """
    if salt_source is None:
        salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    else:
        c = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return stage1.groupBy(*key_cols).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )
