"""Deduplication operators: exact, MinHash+LSH, SimHash, shingle-Jaccard.

Scale notes (the point of this module):

- ``exact``: one hash-shuffle on a 16-byte digest, map-side partial
  aggregation; the canonical pattern for 100 TB exact dedup.
- ``minhash``: signatures are computed in a narrow map stage (per-row
  array fold, no shuffle); the only shuffle is the band-bucket
  self-join, whose key cardinality ≈ n_docs × n_bands and whose
  groups are tiny unless there are real near-duplicates (AQE skew
  join handles pathological buckets).
- ``simhash``: narrow map to a 32-bit signature, then an exact
  group-by — near-dup detection at Hamming distance 0 cost.
- ``shingle-Jaccard``: exact verification join on 3-word shingles —
  selective keys (shingles are near-unique), so the join stays sparse.

All hashing is md5-based so the DuckDB oracle can reproduce values
bit-for-bit (Spark ``xxhash64``/``hash`` have no DuckDB equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgloader_spark.operators.text import tokens

N_MINHASH = 12
N_BANDS = 4  # 12 hashes -> 4 bands x 3 rows
SHINGLE_K = 3


def md5_hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit integer hash both Spark and DuckDB can compute.

    conv(substr(md5(seed||':'||s),1,15),16,10) — 15 hex digits < 2^60.
    """
    payload = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def shingles(text_col: Column | str, k: int = SHINGLE_K) -> Column:
    """k-word shingles of the token stream (order-preserving)."""
    toks = tokens(text_col)
    n = F.size(toks)
    return F.when(n < k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def _seeded_hash(seed: int):
    # NB: a 2-arg lambda would receive the array INDEX as its second
    # argument from F.transform — close over the seed instead.
    return lambda s: md5_hash64(s, seed=seed)


def minhash_signature(text_col: Column | str, n_hashes: int = N_MINHASH) -> Column:
    """Array of n min-hashes over the shingle set — a narrow projection."""
    sh = shingles(text_col)
    return F.array(
        *[F.array_min(F.transform(sh, _seeded_hash(i))) for i in range(n_hashes)]
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group rows by content digest; map-side combine then one shuffle.

    Returns (content_md5, canonical_id, n_copies).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(id, band_ix, bucket) — one row per document per band.

    bucket = md5 of the band's signature slice; documents sharing a
    bucket in any band are near-duplicate candidates.
    """
    rows = n_hashes // n_bands
    sig = minhash_signature(text_col, n_hashes).alias("sig")
    base = df.select(F.col(id_col), sig)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_ix"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return base.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, F.col("band.band_ix").alias("band_ix"), F.col("band.bucket").alias("bucket"))


def minhash_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct candidate near-duplicate pairs from LSH band buckets."""
    bands = minhash_bands(df, id_col, text_col)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash32(text_col: Column | str) -> Column:
    """32-bit SimHash over the distinct token set (unit weights).

    Each bit j of the signature is the sign of sum over tokens of
    (bit j of md5-hash(token)) * 2 - 1.  Pure array folds — narrow.
    """
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: md5_hash64(t, seed=99))

    def _bit_merge(j: int):
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        )

    bit_sums = [
        F.aggregate(hashes, F.lit(0).cast("long"), _bit_merge(j)) for j in range(32)
    ]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by exact SimHash signature (Hamming distance 0 near-dups)."""
    return (
        df.select(F.col(id_col), simhash32(text_col).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for pairs sharing >=1 shingle.

    Shingles are near-unique keys, so the self-join is sparse; the
    |A ∪ B| term comes from per-doc set sizes (broadcast-size dim at
    any realistic near-dup rate).
    """
    sh = (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles(text_col, k))).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
