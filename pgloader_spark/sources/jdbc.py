"""JDBC database sources: partitioned reads + schema introspection.

Re-expresses the reference's database readers as ``spark.read.jdbc``
plans:

- **Pkey-range parallel reads** (``src/sources/mysql/mysql.lisp:10-62``:
  probe ``min(pk), max(pk)+1``, split into ranges of ``rows per
  range`` = 10k, one reader per range) -> JDBC
  ``partitionColumn/lowerBound/upperBound/numPartitions``. On a
  cluster every range is its own task; Spark's scheduler replaces the
  reference's reader kernel.
- **ctid block-range reads** (v4,
  ``clojure/src/pgloader/source/pgsql.sql:97-112``: PG 14+ partitions
  by ``relpages``) -> JDBC ``predicates`` array, one ctid range per
  partition.
- **Pushdown** (``src/sources/mysql/mysql-schema.lisp:268-286``
  geometry ``ST_AsText``; ``src/sources/mssql/mssql-schema.lisp:
  200-218`` date/decimal CONVERT) -> per-type SELECT-expression
  rewriting carried in the JDBC ``query`` option, so the source
  database does the formatting exactly as the reference asks it to.
- **Introspection** (``fetch-columns/-indexes/-fkeys/-table-row-count``
  generics ``src/sources/common/api.lisp:149-163``) -> SQL against
  information_schema / PRAGMA / sys-catalogs, themselves read through
  JDBC as DataFrames.

Everything here *plans* reads (options dicts / SQL strings) so it is
unit-testable without a live server; ``read()`` applies the plan to a
SparkSession.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ROWS_PER_RANGE = 10_000  # *rows-per-range*, src/params.lisp:142


# --------------------------------------------------------------------------
# URI parsing (pgloader connection strings -> JDBC)
# --------------------------------------------------------------------------

_URI_RE = re.compile(
    r"(?P<kind>mysql|postgresql|pgsql|mssql|sqlite)://"
    r"(?:(?P<user>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/?]*)(?::(?P<port>\d+))?"
    r"/(?P<db>[^?]*)(?:\?(?P<query>.*))?"
)

_DEFAULT_PORTS = {"mysql": 3306, "postgresql": 5432, "pgsql": 5432, "mssql": 1433}


@dataclass
class DbUri:
    kind: str
    host: str
    port: int
    database: str
    user: str | None = None
    password: str | None = None
    params: dict = field(default_factory=dict)

    def jdbc_url(self) -> str:
        if self.kind == "sqlite":
            return f"jdbc:sqlite:{self.database}"
        kind = "postgresql" if self.kind == "pgsql" else self.kind
        if kind == "mssql":
            return f"jdbc:sqlserver://{self.host}:{self.port};databaseName={self.database}"
        return f"jdbc:{kind}://{self.host}:{self.port}/{self.database}"


def parse_db_uri(uri: str) -> DbUri:
    m = _URI_RE.match(uri)
    if not m:
        raise ValueError(f"unparseable database URI: {uri!r}")
    kind = m.group("kind")
    params = {}
    if m.group("query"):
        for kv in m.group("query").split("&"):
            k, _, v = kv.partition("=")
            params[k] = v
    return DbUri(
        kind=kind,
        host=m.group("host") or "localhost",
        port=int(m.group("port") or _DEFAULT_PORTS.get(kind, 0)),
        database=m.group("db"),
        user=m.group("user"),
        password=m.group("password"),
        params=params,
    )


# --------------------------------------------------------------------------
# Partitioned read planning
# --------------------------------------------------------------------------


@dataclass
class JdbcReadPlan:
    url: str
    table: str | None = None
    query: str | None = None
    options: dict = field(default_factory=dict)
    predicates: list[str] | None = None

    def read(self, spark: SparkSession, **extra: str) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url)
        if self.query:
            reader = reader.option("query", self.query)
        elif self.table:
            reader = reader.option("dbtable", self.table)
        for k, v in {**self.options, **extra}.items():
            reader = reader.option(k, str(v))
        if self.predicates is not None:
            # predicates path needs the RDD-style API
            props = {k: str(v) for k, v in {**self.options, **extra}.items()}
            return spark.read.jdbc(
                self.url, self.table, predicates=self.predicates, properties=props
            )
        return reader.load()


def plan_range_partitions(
    url: str,
    table: str,
    pk: str,
    min_pk: int,
    max_pk: int,
    rows_per_range: int = DEFAULT_ROWS_PER_RANGE,
    max_partitions: int = 256,
) -> JdbcReadPlan:
    """The reference's integer-pkey range split (mysql.lisp:10-62):
    [min, max+1) divided into ceil(n/rows_per_range) ranges. Spark's
    JDBC source generates the same WHERE clauses from
    lower/upper/numPartitions."""
    span = max(max_pk + 1 - min_pk, 1)
    n = min(max(math.ceil(span / rows_per_range), 1), max_partitions)
    return JdbcReadPlan(
        url=url,
        table=table,
        options={
            "partitionColumn": pk,
            "lowerBound": str(min_pk),
            "upperBound": str(max_pk + 1),
            "numPartitions": str(n),
            "fetchsize": "10000",
        },
    )


def minmax_probe_sql(table: str, pk: str) -> str:
    """`SELECT min(pk), max(pk)+1 FROM t` (mysql.lisp:35-44) — run
    through a 1-row JDBC read before planning ranges."""
    return f"SELECT MIN({pk}) AS min_pk, MAX({pk}) + 1 AS max_pk FROM {table}"


def plan_ctid_partitions(
    url: str, table: str, relpages: int, pages_per_range: int = 1000
) -> JdbcReadPlan:
    """PG ctid block-range partitions (v4 pgsql.sql:97-112): WHERE
    ctid >= '(b,0)' AND ctid < '(b2,0)' per range; the last range is
    open-ended to catch concurrent growth."""
    n = max(math.ceil(relpages / pages_per_range), 1)
    preds = []
    for i in range(n):
        lo = i * pages_per_range
        hi = (i + 1) * pages_per_range
        if i == n - 1:
            preds.append(f"ctid >= '({lo},0)'::tid")
        else:
            preds.append(f"ctid >= '({lo},0)'::tid AND ctid < '({hi},0)'::tid")
    return JdbcReadPlan(url=url, table=table, predicates=preds,
                        options={"fetchsize": "10000"})


# --------------------------------------------------------------------------
# Per-type SELECT pushdown (the source formats values, not us)
# --------------------------------------------------------------------------


def mysql_select_expr(column: str, type_name: str) -> str:
    """Geometry -> ST_AsText (mysql-schema.lisp:268-286); everything
    else reads raw."""
    if type_name.lower() in ("point", "linestring", "polygon", "geometry"):
        return f"ST_AsText(`{column}`) AS `{column}`"
    return f"`{column}`"


def mssql_select_expr(column: str, type_name: str) -> str:
    """Date/decimal CONVERT styles (mssql-schema.lisp:200-218):
    datetime -> ISO8601 (style 126), decimals -> max precision."""
    t = type_name.lower()
    if t in ("datetime", "datetime2", "smalldatetime"):
        return f"CONVERT(varchar(33), [{column}], 126) AS [{column}]"
    if t in ("decimal", "numeric", "money"):
        return f"CONVERT(varchar(66), [{column}], 2) AS [{column}]"
    return f"[{column}]"


def pushdown_query(
    table: str, columns: list[tuple[str, str]], dialect: str = "mysql"
) -> str:
    expr = {"mysql": mysql_select_expr, "mssql": mssql_select_expr}[dialect]
    cols = ", ".join(expr(c, t) for c, t in columns)
    return f"SELECT {cols} FROM {table}"


# --------------------------------------------------------------------------
# Introspection SQL (catalog reads, themselves JDBC DataFrames)
# --------------------------------------------------------------------------


def mysql_columns_sql(database: str) -> str:
    """information_schema.columns scan, the content of
    src/sources/mysql/sql/list-all-columns.sql re-derived from the
    public information_schema layout."""
    return f"""
SELECT table_name, column_name, ordinal_position, column_default,
       is_nullable, data_type, column_type, extra
FROM information_schema.columns
WHERE table_schema = '{database}'
ORDER BY table_name, ordinal_position
""".strip()


def mysql_indexes_sql(database: str) -> str:
    return f"""
SELECT table_name, index_name, non_unique, seq_in_index, column_name
FROM information_schema.statistics
WHERE table_schema = '{database}'
ORDER BY table_name, index_name, seq_in_index
""".strip()


def mysql_fkeys_sql(database: str) -> str:
    return f"""
SELECT constraint_name, table_name, column_name,
       referenced_table_name, referenced_column_name
FROM information_schema.key_column_usage
WHERE table_schema = '{database}' AND referenced_table_name IS NOT NULL
ORDER BY constraint_name, ordinal_position
""".strip()


def mysql_row_counts_sql(database: str) -> str:
    """Estimated row counts (list-table-rows.sql) — drives
    largest-first scheduling."""
    return f"""
SELECT table_name, table_rows
FROM information_schema.tables
WHERE table_schema = '{database}' AND table_type = 'BASE TABLE'
""".strip()


def pg_columns_sql(schema: str = "public") -> str:
    return f"""
SELECT table_name, column_name, ordinal_position, column_default,
       is_nullable, data_type, character_maximum_length,
       numeric_precision, numeric_scale
FROM information_schema.columns
WHERE table_schema = '{schema}'
ORDER BY table_name, ordinal_position
""".strip()


def sqlite_tables_sql() -> str:
    return "SELECT name FROM sqlite_master WHERE type = 'table' AND name NOT LIKE 'sqlite_%'"


def sqlite_columns_pragma(table: str) -> str:
    return f"PRAGMA table_info({table})"


def fields_from_mysql_columns(rows) -> list:
    """information_schema rows -> SourceField list feeding the cast
    engine (mysql-cast-rules path)."""
    from pgloader_spark.casting import SourceField

    out = []
    for r in rows:
        ct = r["column_type"] or r["data_type"]
        m = re.match(r"(\w+)\s*(\([^)]*\))?", ct)
        base, mod = (m.group(1), m.group(2)) if m else (r["data_type"], None)
        out.append(
            SourceField(
                name=r["column_name"],
                type_name=base,
                type_mod=mod,
                default=r["column_default"],
                nullable=(r["is_nullable"] or "YES").upper() == "YES",
                extra=r["extra"],
                unsigned="unsigned" in ct.lower(),
                table_name=r["table_name"],
            )
        )
    return out
