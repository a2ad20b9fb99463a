"""Type-cast rule engine — pgloader's "planner" for types.

Re-expresses the reference's cast-rule matcher
(``src/sources/common/casting-rules.lisp:18-169``) and its per-source
default rule tables (MySQL ``src/sources/mysql/mysql-cast-rules.lisp``,
SQLite ``sqlite-cast-rules.lisp``, MSSQL ``mssql-cast-rules.lisp``,
PostgreSQL ``pgsql-cast-rules.lisp``, DBF ``db3-cast-rules.lisp``, IXF
``ixf-cast-rules.lisp``) as a pure-Python first-match-wins engine.

Each rule matches on source type (or exact table.column), with guards
on typemod / default / signedness / auto_increment, and yields a
``CastResult``: the PostgreSQL DDL type, the Spark ``DataType``, and an
optional named transform from the transform registry.  No Catalyst
involvement — this runs on the driver before any plan is built.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class SourceField:
    """Source-side column description (mysql-column / coldef / ...)."""

    name: str
    type_name: str
    type_mod: str | None = None  # raw "(10,2)" / "(255)" text
    default: str | None = None
    nullable: bool = True
    extra: str | None = None  # "auto_increment", "on update CURRENT_TIMESTAMP"
    unsigned: bool = False
    table_name: str | None = None
    comment: str | None = None

    def typemod(self) -> tuple[int | None, int | None]:
        if not self.type_mod:
            return (None, None)
        nums = re.findall(r"\d+", self.type_mod)
        if not nums:
            return (None, None)
        p = int(nums[0])
        s = int(nums[1]) if len(nums) > 1 else None
        return (p, s)


@dataclass
class CastResult:
    pg_type: str
    spark_type: T.DataType
    type_mod: str | None = None
    transform: str | None = None  # name in the transform registry
    drop_default: bool = False
    drop_not_null: bool = False  # CAST ... drop not null -> nullable target
    drop_extra: bool = False  # CAST ... drop extra -> no on-update trigger
    from_user: bool = False  # matched a user CAST rule (not a default)
    default: str | None = None
    sqltype: str | None = None  # generated PG type (enum) to create first
    sqltype_kind: str | None = None  # "enum" | "set" (set renders name[])


Guard = Callable[[SourceField], bool]


@dataclass
class CastRule:
    """First-match-wins rule (casting-rules.lisp:18-169)."""

    source_type: str | None = None  # match type name (case-insensitive)
    column: tuple[str, str] | None = None  # exact (table, column) match
    guard: Guard | None = None
    target: Callable[[SourceField], CastResult] | None = None
    keep_typemod: bool = False

    def matches(self, f: SourceField) -> bool:
        if self.column is not None:
            if (f.table_name or "", f.name) != self.column:
                return False
        elif self.source_type is not None:
            if f.type_name.lower() != self.source_type.lower():
                return False
        if self.guard is not None and not self.guard(f):
            return False
        return True


def _r(pg: str, spark: T.DataType, transform: str | None = None):
    """Constant-target rule body."""

    def mk(f: SourceField) -> CastResult:
        return CastResult(pg_type=pg, spark_type=spark, transform=transform)

    return mk


def _keep_typemod(pg: str, spark_factory):
    def mk(f: SourceField) -> CastResult:
        p, s = f.typemod()
        return CastResult(
            pg_type=pg,
            spark_type=spark_factory(p, s),
            type_mod=f.type_mod,
        )

    return mk


def _decimal(p, s):
    return T.DecimalType(min(p or 18, 38), s or 0)


# --------------------------------------------------------------------------
# Default rule tables (per source kind)
# --------------------------------------------------------------------------

_ZERO_DATE_DEFAULTS = ("0000-00-00", "0000-00-00 00:00:00")


def _mysql_rules() -> list[CastRule]:
    """mysql-cast-rules.lisp:15-198 — the ~60-rule MySQL table, the
    semantically-load-bearing subset (ints signed/unsigned, decimal
    typemod kept, zero dates, enum/set, bit, geometry, binary)."""
    R: list[CastRule] = []

    def ai(f: SourceField) -> bool:
        return bool(f.extra and "auto_increment" in f.extra.lower())

    # serial promotion for auto_increment ints
    for t, pg in [("tinyint", "serial"), ("smallint", "serial"),
                  ("mediumint", "serial"), ("int", "serial"),
                  ("integer", "serial"), ("bigint", "bigserial")]:
        R.append(CastRule(source_type=t, guard=ai, target=_r(pg, T.LongType())))

    # tinyint(1) -> boolean (the MySQL convention)
    R.append(
        CastRule(
            source_type="tinyint",
            guard=lambda f: f.typemod()[0] == 1,
            target=_r("boolean", T.BooleanType(), transform="tinyint-to-boolean"),
        )
    )
    # unsigned widening (mysql-cast-rules.lisp:47-56)
    uns = lambda f: f.unsigned  # noqa: E731
    R.append(CastRule(source_type="tinyint", guard=uns, target=_r("smallint", T.ShortType())))
    R.append(CastRule(source_type="smallint", guard=uns, target=_r("integer", T.IntegerType())))
    R.append(CastRule(source_type="mediumint", guard=uns, target=_r("integer", T.IntegerType())))
    R.append(CastRule(source_type="int", guard=uns, target=_r("bigint", T.LongType())))
    R.append(CastRule(source_type="integer", guard=uns, target=_r("bigint", T.LongType())))
    R.append(
        CastRule(  # unsigned bigint may exceed int64 -> numeric(20,0)
            source_type="bigint",
            guard=uns,
            target=_r("numeric(20,0)", T.DecimalType(20, 0)),
        )
    )
    R.append(CastRule(source_type="tinyint", target=_r("smallint", T.ShortType())))
    R.append(CastRule(source_type="smallint", target=_r("smallint", T.ShortType())))
    R.append(CastRule(source_type="mediumint", target=_r("integer", T.IntegerType())))
    R.append(CastRule(source_type="int", target=_r("integer", T.IntegerType())))
    R.append(CastRule(source_type="integer", target=_r("integer", T.IntegerType())))
    R.append(CastRule(source_type="bigint", target=_r("bigint", T.LongType())))
    # decimal/numeric keep typemod (mysql-cast-rules.lisp:86-90)
    R.append(CastRule(source_type="decimal", target=_keep_typemod("numeric", _decimal)))
    R.append(CastRule(source_type="numeric", target=_keep_typemod("numeric", _decimal)))
    R.append(CastRule(source_type="float", target=_r("float", T.FloatType())))
    R.append(CastRule(source_type="double", target=_r("double precision", T.DoubleType())))
    # varchar/char keep typemod (mysql-cast-rules.lisp:98-104)
    R.append(
        CastRule(
            source_type="varchar",
            target=lambda f: CastResult("varchar", T.StringType(), type_mod=f.type_mod),
        )
    )
    R.append(
        CastRule(
            source_type="char",
            target=lambda f: CastResult("char", T.StringType(), type_mod=f.type_mod),
        )
    )
    for t in ("text", "tinytext", "mediumtext", "longtext"):
        R.append(CastRule(source_type=t, target=_r("text", T.StringType())))
    for t in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob"):
        R.append(CastRule(source_type=t, target=_r("bytea", T.BinaryType())))
    # zero-date defaults: drop the default AND the NOT NULL (the rows
    # become NULL through the transform, so a kept constraint would
    # reject them) + transform (mysql-cast-rules.lisp:107-160)
    zd = lambda f: (f.default or "") in _ZERO_DATE_DEFAULTS  # noqa: E731
    R.append(
        CastRule(
            source_type="date",
            guard=zd,
            target=lambda f: CastResult(
                "date", T.DateType(), transform="zero-dates-to-null",
                drop_default=True, drop_not_null=True,
            ),
        )
    )
    R.append(CastRule(source_type="date", target=_r("date", T.DateType())))
    for t in ("datetime", "timestamp"):
        R.append(
            CastRule(
                source_type=t,
                guard=zd,
                target=lambda f: CastResult(
                    "timestamptz", T.TimestampType(),
                    transform="zero-dates-to-null",
                    drop_default=True, drop_not_null=True,
                ),
            )
        )
    R.append(CastRule(source_type="datetime", target=_r("timestamptz", T.TimestampType())))
    R.append(CastRule(source_type="timestamp", target=_r("timestamptz", T.TimestampType())))
    R.append(CastRule(source_type="time", target=_r("time", T.StringType())))
    R.append(CastRule(source_type="year", target=_r("integer", T.IntegerType())))
    # bit(1) -> boolean; bit(n) -> bit varying via hex bitstring
    R.append(
        CastRule(
            source_type="bit",
            guard=lambda f: f.typemod()[0] == 1,
            target=_r("boolean", T.BooleanType(), transform="bits-to-boolean"),
        )
    )
    R.append(
        CastRule(
            source_type="bit",
            target=_r("bit varying", T.StringType(), transform="bits-to-hex-bitstring"),
        )
    )
    # enum/set -> generated PG enum type named {table}_{column}_t
    # (enum-or-set-name, mysql-cast-rules.lisp:7-10; registration
    # mysql-cast-rules.lisp:260-305).  SET columns become arrays of the
    # enum type and load through set-to-enum-array ('a,b' -> {a,b}).
    def enum_target(f: SourceField) -> CastResult:
        tname = f"{f.table_name}_{f.name}_t".lower()
        return CastResult(
            pg_type=tname, spark_type=T.StringType(),
            sqltype=tname, sqltype_kind="enum",
        )

    def set_target(f: SourceField) -> CastResult:
        tname = f"{f.table_name}_{f.name}_t".lower()
        return CastResult(
            pg_type=f"{tname}[]", spark_type=T.StringType(),
            transform="set-to-enum-array",
            sqltype=tname, sqltype_kind="set",
        )

    R.append(CastRule(source_type="enum", target=enum_target))
    R.append(CastRule(source_type="set", target=set_target))
    R.append(CastRule(source_type="point", target=_r("point", T.StringType(), "convert-mysql-point")))
    R.append(
        CastRule(
            source_type="linestring",
            target=_r("path", T.StringType(), "convert-mysql-linestring"),
        )
    )
    R.append(CastRule(source_type="json", target=_r("jsonb", T.StringType())))
    return R


def _sqlite_rules() -> list[CastRule]:
    """sqlite-cast-rules.lisp:10-77 incl. the catch-all text rule."""
    R = [
        CastRule(source_type="integer", target=_r("bigint", T.LongType())),
        CastRule(source_type="int", target=_r("bigint", T.LongType())),
        CastRule(source_type="real", target=_r("double precision", T.DoubleType())),
        CastRule(source_type="float", target=_r("double precision", T.DoubleType())),
        CastRule(source_type="double", target=_r("double precision", T.DoubleType())),
        CastRule(source_type="numeric", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="decimal", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="blob", target=_r("bytea", T.BinaryType())),
        CastRule(source_type="boolean", target=_r("boolean", T.BooleanType())),
        CastRule(
            source_type="datetime",
            target=_r("timestamptz", T.TimestampType(), "sqlite-timestamp-to-timestamp"),
        ),
        CastRule(source_type="date", target=_r("date", T.DateType())),
    ]
    return R


def _mssql_rules() -> list[CastRule]:
    """mssql-cast-rules.lisp:7-91."""
    ai = lambda f: "auto_increment" in (f.extra or "").lower()  # noqa: E731
    return [
        # IDENTITY columns -> serial family (mssql-cast-rules.lisp:15-27)
        CastRule(source_type="int", guard=ai,
                 target=_r("serial", T.IntegerType())),
        CastRule(source_type="bigint", guard=ai,
                 target=_r("bigserial", T.LongType())),
        CastRule(source_type="smallint", guard=ai,
                 target=_r("smallserial", T.ShortType())),
        CastRule(source_type="tinyint", guard=ai,
                 target=_r("serial", T.IntegerType())),
        CastRule(source_type="tinyint", target=_r("smallint", T.ShortType())),
        CastRule(source_type="smallint", target=_r("smallint", T.ShortType())),
        CastRule(source_type="int", target=_r("integer", T.IntegerType())),
        CastRule(source_type="bigint", target=_r("bigint", T.LongType())),
        CastRule(source_type="numeric", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="decimal", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="money", target=_r("numeric(19,4)", T.DecimalType(19, 4))),
        CastRule(source_type="real", target=_r("real", T.FloatType())),
        CastRule(source_type="float", target=_r("double precision", T.DoubleType())),
        CastRule(
            source_type="bit",
            target=_r("boolean", T.BooleanType(), "sql-server-bit-to-boolean"),
        ),
        CastRule(
            source_type="uniqueidentifier",
            target=_r("uuid", T.StringType(), "sql-server-uniqueidentifier-to-uuid"),
        ),
        CastRule(source_type="nvarchar", target=lambda f: CastResult("text", T.StringType())),
        CastRule(source_type="varchar", target=lambda f: CastResult("text", T.StringType())),
        CastRule(source_type="char", target=lambda f: CastResult("char", T.StringType(), type_mod=f.type_mod)),
        CastRule(source_type="nchar", target=lambda f: CastResult("char", T.StringType(), type_mod=f.type_mod)),
        CastRule(source_type="ntext", target=_r("text", T.StringType())),
        CastRule(source_type="text", target=_r("text", T.StringType())),
        CastRule(source_type="xml", target=_r("xml", T.StringType())),
        CastRule(source_type="image", target=_r("bytea", T.BinaryType())),
        CastRule(source_type="varbinary", target=_r("bytea", T.BinaryType())),
        CastRule(source_type="binary", target=_r("bytea", T.BinaryType())),
        CastRule(source_type="datetime", target=_r("timestamptz", T.TimestampType())),
        CastRule(source_type="datetime2", target=_r("timestamptz", T.TimestampType())),
        CastRule(source_type="smalldatetime", target=_r("timestamptz", T.TimestampType())),
        CastRule(source_type="date", target=_r("date", T.DateType())),
        CastRule(source_type="time", target=_r("time", T.StringType())),
    ]


def _pgsql_rules() -> list[CastRule]:
    """pgsql-cast-rules.lisp:7-16 — identity.  The reference's rule
    table is nearly empty because its target is PostgreSQL (types
    carry); our execution engine is Spark, so identity means mapping
    each PG type to its Spark equivalent explicitly.  Type names as
    information_schema.columns spells them."""
    return [
        CastRule(source_type="jsonb", target=_r("jsonb", T.StringType())),
        CastRule(source_type="json", target=_r("json", T.StringType())),
        CastRule(source_type="hstore", target=_r("hstore", T.StringType())),
        CastRule(source_type="smallint", target=_r("smallint", T.ShortType())),
        CastRule(source_type="integer", target=_r("integer", T.IntegerType())),
        CastRule(source_type="bigint", target=_r("bigint", T.LongType())),
        CastRule(source_type="real", target=_r("real", T.FloatType())),
        CastRule(source_type="double precision",
                 target=_r("double precision", T.DoubleType())),
        CastRule(source_type="numeric", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="boolean", target=_r("boolean", T.BooleanType())),
        CastRule(source_type="date", target=_r("date", T.DateType())),
        CastRule(source_type="timestamp without time zone",
                 target=_r("timestamp", T.TimestampType())),
        CastRule(source_type="timestamp with time zone",
                 target=_r("timestamptz", T.TimestampType())),
        CastRule(source_type="bytea", target=_r("bytea", T.BinaryType())),
    ]


def _db3_rules() -> list[CastRule]:
    """db3-cast-rules.lisp:10-50 (dBase III field kinds C N L D M)."""
    return [
        CastRule(source_type="C", target=_r("text", T.StringType(), "db3-trim-string")),
        CastRule(source_type="N", target=_r("numeric", T.StringType(), "db3-numeric-to-pgsql-numeric")),
        CastRule(source_type="L", target=_r("boolean", T.BooleanType(), "logical-to-boolean")),
        CastRule(source_type="D", target=_r("date", T.DateType(), "db3-date-to-pgsql-date")),
        CastRule(source_type="M", target=_r("text", T.StringType(), "db3-trim-string")),
    ]


def _ixf_rules() -> list[CastRule]:
    """ixf-cast-rules.lisp:7-31 (fixed alist)."""
    return [
        CastRule(source_type="smallint", target=_r("smallint", T.ShortType())),
        CastRule(source_type="integer", target=_r("integer", T.IntegerType())),
        CastRule(source_type="bigint", target=_r("bigint", T.LongType())),
        CastRule(source_type="decimal", target=_keep_typemod("numeric", _decimal)),
        CastRule(source_type="float", target=_r("double precision", T.DoubleType())),
        CastRule(source_type="timestamp", target=_r("timestamptz", T.TimestampType())),
        CastRule(source_type="date", target=_r("date", T.DateType())),
        CastRule(source_type="time", target=_r("time", T.StringType())),
        CastRule(source_type="varchar", target=lambda f: CastResult("text", T.StringType())),
        CastRule(source_type="character", target=lambda f: CastResult("char", T.StringType(), type_mod=f.type_mod)),
        CastRule(source_type="blob", target=_r("bytea", T.BinaryType())),
    ]


DEFAULT_RULES: dict[str, Callable[[], list[CastRule]]] = {
    "mysql": _mysql_rules,
    "sqlite": _sqlite_rules,
    "mssql": _mssql_rules,
    "pgsql": _pgsql_rules,
    "db3": _db3_rules,
    "ixf": _ixf_rules,
}

_FALLBACK = CastResult(pg_type="text", spark_type=T.StringType())


@dataclass
class CastEngine:
    """First-match-wins over user rules, then source defaults, then the
    text catch-all (the SQLite table ends in ``(:type t) -> text``)."""

    source_kind: str = "mysql"
    user_rules: list[CastRule] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._defaults = DEFAULT_RULES[self.source_kind]()

    def cast(self, f: SourceField) -> CastResult:
        for i, rule in enumerate([*self.user_rules, *self._defaults]):
            if rule.matches(f):
                res = rule.target(f)
                res.from_user = i < len(self.user_rules)
                if res.default is None and not res.drop_default:
                    res.default = _normalize_default(f.default)
                return self._serialize_serial(f, res)
        res = CastResult(pg_type=_FALLBACK.pg_type, spark_type=_FALLBACK.spark_type)
        res.default = _normalize_default(f.default)
        return self._serialize_serial(f, res)

    @staticmethod
    def _serialize_serial(f: SourceField, res: CastResult) -> CastResult:
        """A PG source column defaulting to nextval(...) is a serial:
        the target must get its OWN sequence via the serial
        pseudo-types — copying the nextval expression references a
        sequence that does not exist on the target
        (citus/company.sql's bigserial PKs)."""
        if (f.default or "").strip().lower().startswith("nextval("):
            res.default = None
            res.pg_type = {
                "bigint": "bigserial",
                "integer": "serial",
                "int": "serial",
                "smallint": "smallserial",
            }.get(res.pg_type, res.pg_type)
        return res

    def cast_fields(self, fields: list[SourceField]):
        """-> list of (field, CastResult); the catalog layer turns these
        into Column structs + a StructType."""
        return [(f, self.cast(f)) for f in fields]

    def read_spark_type(self, f: SourceField, res: CastResult):
        """The Spark type the SCAN should deliver for ``f``.

        When the winning cast rule attaches a USING transform, the
        transform consumes the SOURCE-native value (the reference runs
        transform functions on source representations —
        src/utils/transforms.lisp; e.g. byte-vector-to-hexstring needs
        the raw bytes of a binary(16), not a target-typed uuid string),
        so the scan reads the default-rule shape and the executor
        applies the transform + final cast after the scan.  Without a
        transform the scan reads the target shape directly."""
        if not (res.transform and res.from_user):
            # default-rule transforms (zero dates, tinyint(1) boolean)
            # are folded into the readers' per-cell conversion already
            return res.spark_type
        if not hasattr(self, "_plain_defaults"):
            self._plain_defaults = DEFAULT_RULES[self.source_kind]()
        for rule in self._plain_defaults:
            if rule.matches(f):
                return rule.target(f).spark_type
        return _FALLBACK.spark_type


def _normalize_default(default: str | None) -> str | None:
    """CURRENT_TIMESTAMP variants + 'NULL' string (mysql.lisp:237-258)."""
    if default is None:
        return None
    d = default.strip()
    if d.upper() in ("NULL",):
        return None
    if d.upper() in ("CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP()", "NOW()"):
        return "CURRENT_TIMESTAMP"
    if d in _ZERO_DATE_DEFAULTS:
        return None
    if re.match(r"(?i)^\(?\s*(datetime|strftime)\s*\(.*'now'", d):
        return "CURRENT_TIMESTAMP"
    # an unquoted function-call default is a SQL expression — PG
    # catalogs hand back nextval('seq'::regclass) for serials
    # (citus/company.sql bigserial PKs); quoting it would make the
    # CREATE TABLE cast a string literal to bigint and fail
    if re.match(r"(?i)^[a-z_][\w$.]*\s*\(", d) and d.rstrip().endswith(")"):
        return d
    # sqlite PRAGMA hands back defaults with their source quoting
    # intact — sometimes layered ('0', "0", '"0"').  Peel every
    # matched quote pair, then re-render once: numerics bare,
    # everything else single-quoted.
    while len(d) >= 2 and d[0] == d[-1] and d[0] in "'\"":
        d = d[1:-1].strip()
    if not d:
        return "''"
    # datetime keywords can arrive quoted by the source's catalog
    if d.upper() in ("CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP()", "NOW()"):
        return "CURRENT_TIMESTAMP"
    if d.upper() in ("CURRENT_DATE", "CURRENT_TIME"):
        return d.upper()
    # sqlite now-expression defaults (DATETIME('now'[, ...]),
    # strftime(fmt, 'now')) -> the portable CURRENT_TIMESTAMP
    # (sqlite-cast-rules.lisp datetime handling)
    if re.match(r"(?i)^\(?\s*(datetime|strftime)\s*\(.*'now'", d):
        return "CURRENT_TIMESTAMP"
    if d.replace(".", "").lstrip("-").isdigit():
        return d
    return "'" + d.replace("'", "''") + "'"
