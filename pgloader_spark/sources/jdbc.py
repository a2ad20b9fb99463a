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
    password = m.group("password")
    if password is None and kind in ("postgresql", "pgsql") and m.group("user"):
        # no inline password: consult ~/.pgpass / $PGPASSFILE, like the
        # reference (src/parsers/parse-pgpass.lisp wired into its
        # pgsql connection strings)
        from pgloader_spark.parsers.pgpass import lookup_password

        password = lookup_password(
            m.group("host") or "localhost",
            int(m.group("port") or _DEFAULT_PORTS.get(kind, 0)),
            m.group("db"),
            m.group("user"),
        )
    return DbUri(
        kind=kind,
        host=m.group("host") or "localhost",
        port=int(m.group("port") or _DEFAULT_PORTS.get(kind, 0)),
        database=m.group("db"),
        user=m.group("user"),
        password=password,
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


def mysql_columns_sql(database: str, table_type: str = "BASE TABLE") -> str:
    """information_schema.columns scan, the content of
    src/sources/mysql/sql/list-all-columns.sql re-derived from the
    public information_schema layout.  Joined to ``tables`` so views
    are excluded (the reference passes a table-type parameter —
    mysql-schema.lisp:55-75 — and migrates views only via
    MATERIALIZE VIEWS)."""
    return f"""
SELECT c.table_name, c.column_name, c.ordinal_position, c.column_default,
       c.is_nullable, c.data_type, c.column_type, c.extra, c.column_comment
FROM information_schema.columns c
JOIN information_schema.tables t USING (table_schema, table_name)
WHERE c.table_schema = '{database}' AND t.table_type = '{table_type}'
ORDER BY c.table_name, c.ordinal_position
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


def mysql_checks_sql(database: str) -> str:
    """CHECK constraints (MySQL 8.0.16+; the JOIN is empty on older
    servers) — src/sources/mysql/sql/list-all-checks.sql."""
    return f"""
SELECT tc.table_name, cc.constraint_name, cc.check_clause
FROM information_schema.table_constraints tc
JOIN information_schema.check_constraints cc
  ON cc.constraint_schema = tc.table_schema
 AND cc.constraint_name = tc.constraint_name
WHERE tc.table_schema = '{database}' AND tc.constraint_type = 'CHECK'
ORDER BY tc.table_name, cc.constraint_name
""".strip()


def mysql_table_comments_sql(database: str) -> str:
    """src/sources/mysql/sql/list-table-comments.sql."""
    return f"""
SELECT table_name, table_comment
FROM information_schema.tables
WHERE table_schema = '{database}' AND table_type = 'BASE TABLE'
""".strip()


def mysql_column_comments_sql(database: str) -> str:
    """src/sources/mysql/sql/list-columns-comments.sql."""
    return f"""
SELECT c.table_name, c.column_name, c.column_comment
FROM information_schema.columns c
JOIN information_schema.tables t
  USING (table_schema, table_name)
WHERE c.table_schema = '{database}' AND t.table_type = 'BASE TABLE'
ORDER BY c.table_name, c.ordinal_position
""".strip()


def mysql_check_clause_to_pg(clause: str) -> str:
    """Backtick quoting -> double quotes so the clause is valid in
    PostgreSQL (mysql-schema.lisp:203-206)."""
    return re.sub(r"`([^`]+)`", r'"\1"', clause)


def pg_columns_sql(schema: str = "public") -> str:
    return f"""
SELECT table_name, column_name, ordinal_position, column_default,
       is_nullable, data_type, character_maximum_length,
       numeric_precision, numeric_scale
FROM information_schema.columns
WHERE table_schema = '{schema}'
ORDER BY table_name, ordinal_position
""".strip()


# --------------------------------------------------------------------------
# MS SQL introspection (src/sources/mssql/sql/*.sql re-derived from the
# public INFORMATION_SCHEMA / sys-catalog layouts)
# --------------------------------------------------------------------------


def mssql_columns_sql(database: str, table_type: str = "BASE TABLE") -> str:
    """Column catalog scan — list-all-columns.sql.  The reference
    unwraps MSSQL's ((default)) parens and maps getdate()/newid()
    server-side in T-SQL; we read the raw default and normalize
    client-side in ``mssql_normalize_default`` (same mapping,
    unit-testable without a live server)."""
    return f"""
SELECT c.table_schema, c.table_name, c.column_name, c.data_type,
       c.column_default, c.is_nullable,
       COLUMNPROPERTY(object_id(c.table_name), c.column_name,
                      'IsIdentity') AS is_identity,
       c.character_maximum_length, c.numeric_precision, c.numeric_scale,
       c.character_set_name, c.collation_name
FROM information_schema.columns c
JOIN information_schema.tables t
  ON c.table_schema = t.table_schema AND c.table_name = t.table_name
WHERE c.table_catalog = '{database}' AND t.table_type = '{table_type}'
ORDER BY c.table_schema, c.table_name, c.ordinal_position
""".strip()


def mssql_fkeys_sql(database: str) -> str:
    """Foreign keys via REFERENTIAL_CONSTRAINTS joined to both sides'
    KEY_COLUMN_USAGE — list-all-fkeys.sql (dots in constraint names
    are replaced since PG identifiers treat them as separators)."""
    return f"""
SELECT REPLACE(kcu1.constraint_name, '.', '_') AS constraint_name,
       kcu1.table_schema, kcu1.table_name, kcu1.column_name,
       kcu2.table_schema AS unique_table_schema,
       kcu2.table_name AS unique_table_name,
       kcu2.column_name AS unique_column_name,
       rc.update_rule, rc.delete_rule
FROM information_schema.referential_constraints rc
JOIN information_schema.key_column_usage kcu1
  ON kcu1.constraint_catalog = rc.constraint_catalog
 AND kcu1.constraint_schema = rc.constraint_schema
 AND kcu1.constraint_name = rc.constraint_name
JOIN information_schema.key_column_usage kcu2
  ON kcu2.constraint_catalog = rc.unique_constraint_catalog
 AND kcu2.constraint_schema = rc.unique_constraint_schema
 AND kcu2.constraint_name = rc.unique_constraint_name
WHERE kcu1.ordinal_position = kcu2.ordinal_position
  AND kcu1.table_catalog = '{database}'
  AND kcu1.table_schema NOT IN ('dto', 'sys')
  AND kcu2.table_schema NOT IN ('dto', 'sys')
ORDER BY kcu1.constraint_name, kcu1.ordinal_position
""".strip()


def mssql_indexes_sql() -> str:
    """Indexes (incl. filtered-index definitions) from the sys
    catalogs — list-all-indexes.sql."""
    return """
SELECT schema_name(o.schema_id) AS schema_name,
       o.name AS table_name,
       REPLACE(i.name, '.', '_') AS index_name,
       co.name AS column_name,
       i.is_unique, i.is_primary_key, i.filter_definition
FROM sys.indexes i
JOIN sys.objects o ON i.object_id = o.object_id
JOIN sys.index_columns ic
  ON ic.object_id = i.object_id AND ic.index_id = i.index_id
JOIN sys.columns co
  ON co.object_id = i.object_id AND co.column_id = ic.column_id
WHERE schema_name(o.schema_id) NOT IN ('dto', 'sys')
ORDER BY schema_name, o.name, i.name, ic.is_included_column, ic.key_ordinal
""".strip()


def mssql_sequences_sql() -> str:
    """User-defined SEQUENCE objects (IDENTITY columns never appear in
    sys.sequences) — list-all-sequences.sql."""
    return """
SELECT sc.name AS schema_name, s.name AS sequence_name,
       tp.name AS data_type,
       CAST(s.start_value AS BIGINT) AS start_value,
       CAST(s.increment AS BIGINT) AS increment_by,
       CAST(s.minimum_value AS BIGINT) AS minimum_value,
       CAST(s.maximum_value AS BIGINT) AS maximum_value,
       CAST(s.current_value AS BIGINT) AS current_value,
       s.is_cycling, s.cache_size
FROM sys.sequences s
JOIN sys.schemas sc ON sc.schema_id = s.schema_id
JOIN sys.types tp ON tp.user_type_id = s.user_type_id
ORDER BY sc.name, s.name
""".strip()


def mssql_normalize_default(default: str | None) -> str | None:
    """Unwrap MSSQL's ((value)) / (value) default wrapping and map the
    common function defaults, matching the CASE ladder the reference
    runs in T-SQL (list-all-columns.sql):
    newid() -> GENERATE_UUID, getdate()/sysdatetimeoffset() ->
    CURRENT_TIMESTAMP, convert(varchar..., getdate(), ...) -> today,
    'literal' -> literal."""
    if default is None:
        return None
    d = default.strip()
    while len(d) >= 2 and d[0] == "(" and d[-1] == ")":
        d = d[1:-1]
    low = d.lower()
    if low == "newid()":
        return "GENERATE_UUID"
    if low in ("getdate()", "sysdatetimeoffset()"):
        return "CURRENT_TIMESTAMP"
    if re.fullmatch(r"convert\(.*varchar.*,\s*getdate\(\)\s*,.*\)", low):
        return "today"
    if len(d) >= 2 and d[0] == "'" and d[-1] == "'":
        return d[1:-1]
    return d


def _rowget(row, key, default=None):
    """Field access tolerant of dicts and pyspark Rows."""
    try:
        return row[key]
    except (KeyError, ValueError, IndexError, TypeError):
        return default


def fields_from_mssql_columns(rows) -> dict[tuple[str, str], list]:
    """information_schema rows -> {(schema, table): [SourceField]}
    feeding the MSSQL cast rules (mssql-schema.lisp list-all-columns
    consumption)."""
    from pgloader_spark.casting import SourceField

    out: dict[tuple[str, str], list] = {}
    for r in rows:
        char_len = _rowget(r, "character_maximum_length")
        num_prec = _rowget(r, "numeric_precision")
        num_scale = _rowget(r, "numeric_scale")
        dtype = r["data_type"]
        if char_len and char_len > 0:
            mod = f"({char_len})"
        elif num_prec and dtype.lower() in ("decimal", "numeric"):
            mod = f"({num_prec},{num_scale or 0})"
        else:
            mod = None
        f = SourceField(
            name=r["column_name"],
            type_name=dtype,
            type_mod=mod,
            default=mssql_normalize_default(_rowget(r, "column_default")),
            nullable=(_rowget(r, "is_nullable") or "YES").upper() == "YES",
            extra="auto_increment" if _rowget(r, "is_identity") else None,
            table_name=r["table_name"],
        )
        out.setdefault((r["table_schema"], r["table_name"]), []).append(f)
    return out


def catalog_from_mssql(column_rows, engine=None):
    """Canned (or live-JDBC) column resultsets -> a full target
    Catalog: one Schema per source schema, cast rules applied per
    column — the resolution step of ``LOAD DATABASE FROM mssql://``."""
    from pgloader_spark.casting import CastEngine
    from pgloader_spark.catalog import Catalog, Schema
    from pgloader_spark.plans.ddl import table_from_fields

    engine = engine or CastEngine("mssql")
    cat = Catalog("mssql")
    schemas: dict[str, Schema] = {}
    for (schema_name, table_name), fields in fields_from_mssql_columns(
        column_rows
    ).items():
        sch = schemas.get(schema_name)
        if sch is None:
            pg_name = "public" if schema_name == "dbo" else schema_name
            sch = Schema(pg_name)
            schemas[schema_name] = sch
            cat.schemas.append(sch)
        table_from_fields(table_name, fields, engine, sch)
    return cat


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
                comment=_rowget(r, "column_comment") or None,
            )
        )
    return out


def attach_mysql_checks(catalog, rows) -> None:
    """list-all-checks resultset -> Table.check_constraints with
    backtick->double-quote clause translation
    (mysql-schema.lisp:193-206)."""
    for r in rows:
        for schema in catalog.schemas:
            t = schema.find_table(r["table_name"])
            if t is not None:
                t.check_constraints.append(
                    (r["constraint_name"],
                     mysql_check_clause_to_pg(r["check_clause"]))
                )
                break


def attach_mysql_comments(catalog, table_rows=(), column_rows=()) -> None:
    """list-table-comments / list-columns-comments resultsets ->
    Table.comment / Column.comment."""
    for r in table_rows:
        for schema in catalog.schemas:
            t = schema.find_table(r["table_name"])
            if t is not None and r["table_comment"]:
                t.comment = r["table_comment"]
                break
    for r in column_rows:
        for schema in catalog.schemas:
            t = schema.find_table(r["table_name"])
            if t is None:
                continue
            for c in t.columns:
                if c.name == r["column_name"] and r["column_comment"]:
                    c.comment = r["column_comment"]
            break
