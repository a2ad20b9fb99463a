"""Load-verification audit queries: FK-orphan report and catalog
checksums over the TPC-H-ish testdata.

The reference's analogue is implicit — pgloader installs FKs after
load and lets PostgreSQL abort on dangling keys (src/pg-copy), and
reports per-table row counts as its completeness summary
(src/monitor.lisp).  These queries make both checks explicit,
restartable scans that run BEFORE constraint install and at any
scale: each produces one row per FK edge / table, so the answer is
tiny regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pgloader_spark.operators import audit
from pgloader_spark.queries import query
from pgloader_spark.session import read_table

# (child, child_key, parent, parent_key, broadcast_parent) — every FK
# edge in the TPC-H-ish schema.  Broadcast flags mark genuine dims;
# orders at 100 TB is not broadcastable, so lineitem->orders shuffles
# on the key (AQE may still upgrade it at small SF).
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders", "o_custkey", "customer", "c_custkey", True),
    ("customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation", "n_regionkey", "region", "r_regionkey", True),
)

# Primary keys for the whole catalog (lineitem's is composite).
_PK = (
    ("region", ["r_regionkey"]),
    ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
)


def _edge_name(child: str, ck: str, parent: str, pk: str) -> str:
    return f"{child}.{ck}->{parent}.{pk}"


def _duck_fk_edge_sql(child: str, ck: str, parent: str, pk: str) -> str:
    edge = _edge_name(child, ck, parent, pk)
    return f"""
SELECT '{edge}' AS edge,
       CAST(COALESCE(SUM(__rows), 0) AS BIGINT) AS n_child_rows,
       CAST(COUNT(CASE WHEN __k IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_child_keys,
       CAST(COALESCE(SUM(CASE WHEN __k IS NULL THEN __rows END), 0) AS BIGINT)
           AS n_null_keys,
       CAST(COUNT(CASE WHEN __k IS NOT NULL AND __hit IS NULL THEN 1 END)
            AS BIGINT) AS n_orphan_keys,
       CAST(COALESCE(SUM(CASE WHEN __k IS NOT NULL AND __hit IS NULL
                              THEN __rows END), 0) AS BIGINT) AS n_orphan_rows
FROM (
  SELECT k.__k, k.__rows, p.__hit
  FROM (SELECT {ck} AS __k, COUNT(*) AS __rows FROM {child} GROUP BY 1) k
  LEFT JOIN (SELECT DISTINCT {pk} AS __k, TRUE AS __hit FROM {parent}) p
    USING (__k))
"""


def _duck_fk_report_sql() -> str:
    return "\nUNION ALL\n".join(
        _duck_fk_edge_sql(c, ck, p, pk) for c, ck, p, pk, _ in _FK_EDGES
    )


def _duck_key_string(keys: list[str]) -> str:
    """DuckDB mirror of ``audit.key_string``: single column = plain
    cast; composite = backslash-then-separator escape before the '|'
    join (disambiguates separator characters inside key values), with
    NULL parts coalesced to the explicit ``\\N`` sentinel (concat_ws
    skips NULL args in both engines — see audit.key_string)."""
    if len(keys) == 1:
        return f"CAST({keys[0]} AS VARCHAR)"
    parts = ", ".join(
        "coalesce(replace(replace(CAST({k} AS VARCHAR), '\\', '\\\\'),"
        " '|', '\\|'), '\\N')".format(k=k)
        for k in keys
    )
    return f"concat_ws('|', {parts})"


def _duck_checksum_sql(table: str, keys: list[str]) -> str:
    key_str = _duck_key_string(keys)
    h = (
        f"CAST(('0x' || substr(md5('{audit.CHECKSUM_SEED}:' || {key_str}), 1, 15))"
        " AS BIGINT)"
    )
    return f"""
SELECT '{table}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {key_str}) AS BIGINT) AS n_keys,
       CAST(SUM({h}) % {audit.CHECKSUM_MOD} AS BIGINT) AS key_checksum
FROM {table}
"""


def _duck_checksum_report_sql() -> str:
    return "\nUNION ALL\n".join(_duck_checksum_sql(t, ks) for t, ks in _PK)


@query("audit_fk_orphans", oracle=_duck_fk_report_sql())
def audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across all 7 FK edges of the schema:
    per edge, child rows/keys, NULL keys, and dangling (orphan)
    keys/rows.  Each edge is one map-side-combinable key agg + one
    broadcast (dims) or key-partitioned (facts) join folding to a
    single row — the 100 TB replacement for pgloader's
    install-FK-and-let-PostgreSQL-abort cycle."""
    edges = [
        (
            read_table(spark, sf_dir, child),
            ck,
            read_table(spark, sf_dir, parent),
            pk,
            _edge_name(child, ck, parent, pk),
            bcast,
        )
        for child, ck, parent, pk, bcast in _FK_EDGES
    ]
    return audit.fk_orphan_report(edges)


@query("audit_table_checksums", oracle=_duck_checksum_report_sql())
def audit_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog completeness fingerprint: per table, row count, distinct
    PK count, and an order-independent 60-bit key checksum (sum of
    portable md5-prefix hashes in a decimal accumulator).  Run on
    source and target, diff two tiny frames to verify a migration
    moved every row exactly once — pgloader's row-count summary
    upgraded to content-addressed evidence."""
    tables = [(read_table(spark, sf_dir, t), t, ks) for t, ks in _PK]
    return audit.table_checksum_report(tables)


def _duck_bucket_checksum_sql(table: str, keys: list[str], n_buckets: int) -> str:
    key_str = _duck_key_string(keys)
    h = (
        f"CAST(('0x' || substr(md5('{audit.CHECKSUM_SEED}:' || {key_str}), 1, 15))"
        " AS BIGINT)"
    )
    return f"""
SELECT '{table}' AS table_name,
       CAST(h % {n_buckets} AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
       CAST(SUM(h) % {audit.CHECKSUM_MOD} AS BIGINT) AS key_checksum
FROM (SELECT {key_str} AS k, {h} AS h FROM {table})
GROUP BY 2
"""


@query(
    "audit_checksum_buckets",
    oracle=_duck_bucket_checksum_sql("lineitem", ["l_orderkey", "l_linenumber"], 64),
)
def audit_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed checksum drill-down (lineitem, 64 buckets): when the
    whole-table checksums disagree between source and target, the
    bucket frames localize the diff to 1/64 of the keys — bisect by
    re-running finer over just the mismatched buckets, never sorting
    or collecting the table.  Bucket id derives from the same portable
    hash as the checksum, so both engines agree on membership by
    construction.  One map-side-combinable agg, 64-row output."""
    li = read_table(spark, sf_dir, "lineitem")
    return audit.bucket_checksums(li, "lineitem", ["l_orderkey", "l_linenumber"], n_buckets=64)


@query(
    "audit_key_skew",
    oracle="""
WITH counts AS (
  SELECT user_id AS key0, COUNT(*) AS n_rows FROM events GROUP BY 1),
tot AS (SELECT SUM(n_rows) AS total, COUNT(*) AS nkeys FROM counts)
SELECT CAST(key0 AS VARCHAR) AS key,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST((CAST(n_rows AS HUGEINT) * 1000000) // total AS BIGINT)
           AS row_share_ppm,
       CAST((CAST(n_rows AS HUGEINT) * nkeys * 100) // total AS BIGINT)
           AS skew_vs_uniform_x100
FROM counts, tot
ORDER BY n_rows DESC, key ASC
LIMIT 20
""",
)
def audit_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter pre-flight on events.user_id — the report that
    decides the join/agg strategy BEFORE a 100 TB job runs (a top key
    holding 10% of rows means a straggler task: salt it, broadcast
    the other side, or rely on AQE skew-join).  One
    map-side-combinable count agg + a k-bounded TakeOrdered; the
    1-row totals frame broadcasts onto the counts."""
    events = read_table(spark, sf_dir, "events")
    return audit.key_skew_profile(events, "user_id", top_k=20)
