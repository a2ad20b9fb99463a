"""Per-cell encoding-error -> NULL recovery for text reads.

Re-expresses the reference's decoding-error restarts: when a cell's
bytes cannot be decoded in the declared encoding, the cell becomes
NULL, the row survives, and an error record carrying the pkey and
column name is logged/counted (MySQL handler
``src/sources/mysql/mysql.lisp:64-98`` invoking the ``use-nil``
restart; SQLite per-cell handler ``src/sources/sqlite/sqlite.lisp:
55-75``).

Spark-first shape:

- **UTF-8** (the overwhelmingly common case): pure Column expressions
  — ``is_valid_utf8`` guards a binary->string cast, so the whole
  recovery stays inside whole-stage codegen with zero Python.  The
  reject stream is the same scan filtered to invalid cells (one
  narrow pass each; Spark reuses the cached scan).
- **Any other charset**: an Arrow-batched ``mapInPandas`` fallback
  that try/except-decodes per cell — the slow path, only entered
  when a load file declares latin1/cp1252/sjis/... (mirroring the
  reference, whose fast path is also its encoding library's native
  loop).

Both paths preserve row counts: a bad cell never drops its row —
matching the reference's "restart the row with NULL for that cell"
semantics rather than Spark's PERMISSIVE whole-row null.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_utf8_or_null(bin_col) -> "F.Column":
    """Binary -> string, NULL when the bytes are not valid UTF-8.

    ``is_valid_utf8`` + cast stays in codegen; ``try_validate_utf8``
    would also work but returns the *repaired* semantics on some
    engines — the reference's contract is NULL, not replacement
    characters."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    s = c.cast("string")
    return F.when(F.is_valid_utf8(s), s).otherwise(F.lit(None).cast("string"))


def decode_text_columns(
    df: DataFrame,
    columns: list[str],
    id_col: str,
    charset: str = "utf-8",
) -> tuple[DataFrame, DataFrame]:
    """Decode binary ``columns`` to strings with per-cell NULL recovery.

    Returns ``(decoded, rejects)``:

    - ``decoded`` — ``df`` with each listed column decoded, NULL where
      its bytes are invalid in ``charset`` (all other columns pass
      through untouched; row count preserved).
    - ``rejects`` — one row per bad CELL: (pkey value, column name,
      hex prefix of the offending bytes) — the reject-log feed, the
      same information the reference logs ("Illegal ~a character ...
      pkey ~s ... column ~s").
    """
    cs = charset.lower().replace("-", "").replace("_", "")
    if cs == "utf8":
        return _decode_utf8(df, columns, id_col)
    return _decode_pandas(df, columns, id_col, charset)


def _decode_utf8(
    df: DataFrame, columns: list[str], id_col: str
) -> tuple[DataFrame, DataFrame]:
    decoded = df
    for c in columns:
        decoded = decoded.withColumn(c, decode_utf8_or_null(F.col(c)))
    rejects = _utf8_rejects(df, columns, id_col)
    return decoded, rejects


def _utf8_rejects(df: DataFrame, columns: list[str], id_col: str) -> DataFrame:
    per_col = [
        df.filter(~F.is_valid_utf8(F.col(c).cast("string"))).select(
            F.col(id_col).cast("string").alias("pkey"),
            F.lit(c).alias("column"),
            F.substring(F.hex(F.col(c).cast("binary")), 1, 32).alias("bytes_hex"),
        )
        for c in columns
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionAll(p)
    return out


def write_encoding_rejects(
    rejects: DataFrame, root_dir: str, db: str, table: str, charset: str = "utf-8"
) -> int:
    """Reject records -> ``<root>/<db>/<table>.log`` lines shaped like
    the reference's error message ("Illegal <charset> character ...
    pkey <k>, column <c>"); returns the error count."""
    import os

    out_dir = os.path.join(root_dir, db)
    os.makedirs(out_dir, exist_ok=True)
    rej = rejects.cache()
    n = rej.count()
    if n:
        lines = rej.select(
            F.concat(
                F.lit(f"While decoding text data from table {table!r}: "),
                F.lit(f"Illegal {charset} sequence 0x"),
                F.col("bytes_hex"),
                F.lit(", pkey "),
                F.col("pkey"),
                F.lit(", column "),
                F.col("column"),
            ).alias("line")
        )
        # coalesce(1): encoding rejects are exceptional by construction;
        # one log file matches the reference's reject layout.
        lines.coalesce(1).write.mode("overwrite").text(
            os.path.join(out_dir, f"{table}.log")
        )
    rej.unpersist()
    return n


_REJECT_SCHEMA = T.StructType(
    [
        T.StructField("pkey", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("bytes_hex", T.StringType()),
    ]
)


def _decode_pandas(
    df: DataFrame, columns: list[str], id_col: str, charset: str
) -> tuple[DataFrame, DataFrame]:
    """Arrow-batched per-cell decode for non-UTF-8 charsets.

    One pass produces the decoded rows; a second produces the reject
    records (same plan shape as the UTF-8 path).  Per-batch pandas
    ``.apply`` on the affected columns only — the other columns ride
    through the Arrow batch untouched."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if f.name in columns else f.dataType,
                True,
            )
            for f in df.schema.fields
        ]
    )

    def _cell(v):
        if v is None:
            return None
        try:
            return bytes(v).decode(charset)
        except (UnicodeDecodeError, LookupError):
            return None

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for c in columns:
                pdf[c] = pdf[c].map(_cell)
            yield pdf

    decoded = df.mapInPandas(decode_batches, schema=out_schema)

    def reject_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for c in columns:
                for pk, v in zip(pdf[id_col], pdf[c]):
                    if v is not None and _cell(v) is None:
                        rows.append(
                            (str(pk), c, bytes(v).hex().upper()[:32])
                        )
            yield pd.DataFrame(rows, columns=["pkey", "column", "bytes_hex"])

    rejects = df.select(id_col, *columns).mapInPandas(
        reject_batches, schema=_REJECT_SCHEMA
    )
    return decoded, rejects
