"""Sketch operators: HyperLogLog cardinality, Count-Min frequency,
histogram quantiles.

At 100 TB the questions "how many distinct users/URLs/documents",
"how often does this token occur", and "where is the p99 of this
quality score" cannot afford exact global answers (a COUNT DISTINCT
shuffles every key; an exact percentile is a global sort).  These are
the standard fixed-memory sketches, expressed as pure DataFrame plans:

- every sketch's state is CONSTANT-sized (4096 HLL registers, d x w
  CM counters, B histogram bins), so the final aggregation is a
  broadcast-scale reduce no matter the input size;
- the per-row work is Column expressions only (md5-based hashing,
  bit math) — JVM codegen, no Python;
- the hash is the engine-portable md5 trick shared with the dedup
  operators (operators/dedup.py:md5_hash64), so a DuckDB oracle
  computes the IDENTICAL estimate — the correctness gate checks the
  sketch math exactly, not just within error bounds (error-bound
  checks vs exact answers live in tests/test_sketches.py).

Unlike Spark's built-in approx_count_distinct / percentile_approx,
these are deterministic across engines and partitionings: integer
register/counter state only, float math confined to one final
expression per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pgloader_spark.operators.dedup import md5_hash64

# --- HyperLogLog -----------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers, ~1.3% standard error
HLL_SEED = 11
_HLL_M = 1 << HLL_P
_HLL_RBITS = 60 - HLL_P  # md5_hash64 yields 60 usable bits
# Flajolet et al. 2007 bias constant for m >= 128
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# the raw-estimate numerator alpha * m^2 * 2^50, precomputed to ONE
# double so both engines evaluate the identical constant (DuckDB
# parses long literal*literal products as DECIMAL and overflows)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 50)


def hll_rho(hash_col: Column) -> Column:
    """Register index + rank for one hashed key.

    rho = (trailing zeros of the remaining bits) + 1 — the
    first-one-bit rank, geometric under a uniform hash.  Trailing
    zeros via the lowest-set-bit identity ``x & -x = 2^tz`` keeps the
    math exact in both engines (log2 of a power of two is exact in
    IEEE754; no bit-scan builtin needed).
    """
    rest = F.shiftright(hash_col, HLL_P)
    lowbit = rest.bitwiseAND(F.lit(0).cast("long") - rest)
    tz = F.round(F.log2(lowbit.cast("double"))).cast("int")
    return F.when(rest == 0, F.lit(_HLL_RBITS + 1)).otherwise(tz + 1)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL register table (group, j, m_j) — the sketch STATE.

    This is the mergeable artifact: registers from disjoint partitions,
    days, or sources combine by MAX per (group, j), so estimates roll
    up without re-reading the raw keys (the property that makes HLL a
    distributed sketch at all)."""
    h = md5_hash64(F.col(key_col).cast("string"), seed=HLL_SEED)
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(_HLL_M - 1)).alias("j"),
            hll_rho(h).alias("rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table into per-group ``est_distinct``."""
    # SUM(2^(50 - M_j)) is exact integer arithmetic: M_j <= 49, at most
    # 4096 terms of <= 2^49 -> fits long with headroom for V * 2^50.
    folded = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(50) - F.col("m_j")).cast("long")).alias("s50"),
    )
    v = F.lit(_HLL_M) - F.col("n_regs")  # empty registers (M = 0)
    z50 = F.col("s50") + v * F.lit(1 << 50).cast("long")
    e_raw = F.lit(_HLL_NUM) / z50.cast("double")
    linear = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double"))
    est = F.when((v > 0) & (e_raw <= 2.5 * _HLL_M), linear).otherwise(e_raw)
    return folded.select(
        *group_cols, F.round(est).cast("long").alias("est_distinct")
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL distinct-count estimate (column ``est_distinct``).

    Two aggregations, both with map-side partial combine: (group, j)
    -> max(rho) touches at most m=4096 rows per group regardless of
    input size, then the per-group fold of the register table.  The
    register sum is kept EXACT by scaling 2^-M to the integer
    2^(50-M): floating-point enters only in the single final
    expression, so the estimate is independent of partitioning and
    engine.  Small-range (linear counting) correction as in Flajolet
    et al. 2007.
    """
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


def hll_merged_rollup(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Per-group estimates PLUS an 'ALL' row whose registers are
    MAX-MERGED from the per-group register tables — never re-touching
    the raw keys.  Because register max is associative, the merged
    estimate is bit-identical to estimating over the union directly
    (the oracle checks exactly that), which is the correctness witness
    for distributing the sketch: per-executor/per-day/per-source
    register tables roll up to the same global answer in any order.
    """
    base = hll_registers(df, key_col, [group_col])
    per = hll_estimate(base, [group_col])
    merged = base.groupBy("j").agg(F.max("m_j").alias("m_j"))
    all_row = hll_estimate(merged, []).select(
        F.lit("ALL").alias(group_col), "est_distinct"
    )
    return per.select(
        F.col(group_col).cast("string").alias(group_col), "est_distinct"
    ).unionByName(all_row)


def duck_hll_sql(key_expr: str, group_expr: str, table: str) -> str:
    """The identical HLL estimate in DuckDB SQL (oracle side)."""
    return f"""
WITH h AS (
  SELECT {group_expr} AS grp,
         CAST(('0x' || substr(md5('{HLL_SEED}:' || {key_expr}), 1, 15))
              AS BIGINT) AS h
  FROM {table}),
rr AS (
  SELECT grp, h & {_HLL_M - 1} AS j,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_RBITS + 1}
              ELSE CAST(round(log2(CAST(
                     (h >> {HLL_P}) & (-(h >> {HLL_P})) AS DOUBLE))) AS INT) + 1
         END AS rho
  FROM h),
regs AS (SELECT grp, j, MAX(rho) AS m_j FROM rr GROUP BY grp, j),
folded AS (
  SELECT grp, COUNT(*) AS n_regs,
         SUM(CAST(power(2, 50 - m_j) AS BIGINT)) AS s50
  FROM regs GROUP BY grp)
SELECT grp,
  CAST(round(CASE
    WHEN ({_HLL_M} - n_regs) > 0
     AND ({_HLL_NUM!r}
          / CAST(s50 + ({_HLL_M} - n_regs) * {1 << 50} AS DOUBLE))
         <= {2.5 * _HLL_M!r}
    THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
           / CAST({_HLL_M} - n_regs AS DOUBLE))
    ELSE {_HLL_NUM!r}
           / CAST(s50 + ({_HLL_M} - n_regs) * {1 << 50} AS DOUBLE)
  END) AS BIGINT) AS est_distinct
FROM folded
"""


# --- Count-Min sketch ------------------------------------------------------

CMS_D = 4  # independent hash rows
CMS_W = 8192  # counters per row
CMS_SEEDS = [101, 102, 103, 104]


def cms_counters(items: DataFrame, item_col: str = "item") -> DataFrame:
    """Build the d x w counter table over an item stream (with
    duplicates — occurrences, not a set).  Output is at most
    d*w = 32768 rows whatever the corpus size; the groupBy combines
    map-side, so the shuffle carries counter partials, not items.
    """
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            md5_hash64(F.col(item_col), seed=s), F.lit(CMS_W)
                        ).alias("bucket"),
                    )
                    for s in CMS_SEEDS
                ]
            )
        ).alias("sb")
    )
    return rows.groupBy("sb.seed", "sb.bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_estimate(
    counters: DataFrame, candidates: DataFrame, item_col: str = "item"
) -> DataFrame:
    """Point-frequency estimates: est(x) = min_d counter[d][h_d(x)].
    Always >= the true count (collisions only add).  ``counters`` is
    constant-sized, so Catalyst broadcasts it to the candidates.
    """
    probes = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            md5_hash64(F.col(item_col), seed=s), F.lit(CMS_W)
                        ).alias("bucket"),
                    )
                    for s in CMS_SEEDS
                ]
            )
        ).alias("sb"),
    ).select(item_col, "sb.seed", "sb.bucket")
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy(item_col)
        .agg(F.min("c").alias("est_count"))
    )


# --- Histogram quantiles ---------------------------------------------------

HIST_BINS = 1024


def histogram_quantiles(
    df: DataFrame, value_col: Column, probs: list[float], bins: int = HIST_BINS
) -> DataFrame:
    """Approximate quantile thresholds via a fixed-width histogram.

    One scan builds the B-bin histogram (constant-size aggregate,
    map-side combined); the quantile is read off the cumulative bin
    counts.  Error is bounded by one bin width of the value range —
    the standard way to pick 'drop the bottom decile by quality'
    thresholds at corpus scale without a global sort.  Returns
    (p, threshold) — threshold is the inclusive upper edge of the bin
    where the cumulative count first reaches p * n.
    """
    x = value_col.cast("double").alias("x")
    base = df.select(x)
    stats = base.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("x").alias("n")
    )
    binned = base.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(bins)
                ),
                F.lit(bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bin"),
        "lo",
        "hi",
        "n",
    )
    hist = binned.groupBy("bin", "lo", "hi", "n").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # the cumulative window sorts <= B constant rows — scale-safe
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    pdf = hist.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    picked = (
        cum.crossJoin(F.broadcast(pdf))
        .filter(F.col("cum").cast("double") >= F.col("p") * F.col("n"))
        .groupBy("p", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    thr = F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / F.lit(
        bins
    )
    return picked.select(
        "p", F.round(thr, 6).alias("threshold")
    ).orderBy("p")
