"""dBase III (DBF) source.

Re-expresses pgloader's DBF source (``src/sources/db3/db3.lisp:7-30``
— record loop, deleted-row skip, embedded schema, optional .dbt memo
file) as a pure-Python parser of the public dBase III file format.

The header and field descriptors are parsed on the driver (tiny);
record decoding is distributed: the fixed-size record region is split
into byte ranges and each Spark task decodes its own slice via
``mapInPandas`` on a range DataFrame — DBF records are fixed-width, so
any byte offset ``header_size + i * record_size`` is a valid record
boundary and tasks can seek independently. For small files this
collapses to one task; for a large DBF it fans out like a parquet
scan would.

Field types (public spec): C text, N numeric, F float, L logical,
D date (YYYYMMDD), M memo (block number into the .dbt file).
Cast semantics follow ``src/sources/db3/db3-cast-rules.lisp:10-50``
via the ``db3`` table in ``pgloader_spark.casting``.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

HEADER_SIZE = 32
FIELD_DESC_SIZE = 32
FIELD_TERMINATOR = 0x0D
DELETED_MARK = b"*"
DBT_BLOCK_SIZE = 512


@dataclass
class DbfField:
    name: str
    type_code: str  # C N F L D M
    length: int
    decimals: int


@dataclass
class DbfHeader:
    record_count: int
    header_size: int
    record_size: int
    fields: list[DbfField]


def parse_header(data: bytes) -> DbfHeader:
    record_count, header_size, record_size = struct.unpack_from("<IHH", data, 4)
    fields: list[DbfField] = []
    off = HEADER_SIZE
    while off < header_size - 1 and data[off] != FIELD_TERMINATOR:
        raw = data[off : off + FIELD_DESC_SIZE]
        name = raw[:11].split(b"\x00", 1)[0].decode("ascii", errors="replace")
        type_code = chr(raw[11])
        length = raw[16]
        decimals = raw[17]
        fields.append(DbfField(name, type_code, length, decimals))
        off += FIELD_DESC_SIZE
    return DbfHeader(record_count, header_size, record_size, fields)


def _read_memo(
    dbt: bytes | None, block_text: str, encoding: str = "latin-1"
) -> str | None:
    """Resolve a 10-char memo block number against .dbt contents.

    dBase III memo: 512-byte blocks, text ends at 0x1A.  dBase IV
    blocks open with FF FF 08 00 + a 4-byte LE total length (header
    included) — dbase_8b.dbt carries that layout."""
    s = block_text.strip()
    # an absent memo comes out as the literal string NIL in the
    # reference (its Lisp nil prints through to the COPY stream —
    # pinned by test/regress/expected/dbf-8b.out and dbf-memo.out)
    if not s or dbt is None:
        return "NIL"
    try:
        block = int(s)
    except ValueError:
        return "NIL"
    start = block * DBT_BLOCK_SIZE
    if block <= 0 or start >= len(dbt):
        return "NIL"
    chunk = dbt[start:]
    if chunk[:4] == b"\xff\xff\x08\x00":
        # dBase IV block: 8-byte header, text runs to the 0x1F/0x1A
        # soft terminator (the header length over-counts in the
        # reference's own dbase_8b.dbt fixture; the terminator is
        # what its loaded output follows)
        chunk = chunk[8:]
        for term in (b"\x1f", b"\x1a"):
            end = chunk.find(term)
            if end != -1:
                chunk = chunk[:end]
    else:  # dBase III: 512-byte blocks, text ends at 0x1A
        end = chunk.find(b"\x1a")
        if end != -1:
            chunk = chunk[:end]
    return chunk.decode(encoding, errors="replace")


def _decode_cell(
    f: DbfField, raw: bytes, encoding: str, dbt: bytes | None
) -> str | None:
    """One cell -> the COPY-ready string the reference's db3 cast
    rules produce (db3-cast-rules.lisp:10-49 + transforms.lisp:
    588-619): C right-trimmed (empty stays ''), N/F trimmed text
    ('' -> NULL), I/Y binary little-endian integers as decimal text,
    L 't'/'f' (? and blank -> NULL), D YYYYMMDD -> ISO, M memo-block
    lookup, 0 (_NullFlags) -> bit-string."""
    t = f.type_code
    if t == "I":  # FoxPro 4-byte LE integer (dbase_31.dbf)
        if len(raw) < 4:
            return None
        return str(struct.unpack("<i", raw[:4])[0])
    if t == "Y":  # FoxPro currency: 8-byte LE int, loaded as bigint
        if len(raw) < 8:
            return None
        return str(struct.unpack("<q", raw[:8])[0])
    if t == "0":  # _NullFlags byte(s) -> PostgreSQL bit(8*n) string
        return "".join(f"{b:08b}" for b in raw)
    cell = raw.decode(encoding, errors="replace")
    if t == "M":
        memo = _read_memo(dbt, cell, encoding)
        return memo.replace("\x00", "") if memo else memo
    if t == "L":
        v = cell.replace("\x00", " ").strip()
        if v in ("", "?"):
            return None
        return "t" if v in ("T", "t", "Y", "y") else "f"
    if t == "D":
        v = cell.replace("\x00", " ").strip()
        if len(v) == 8 and v.isdigit():
            return f"{v[0:4]}-{v[4:6]}-{v[6:8]}"
        return v or None
    if t == "C":
        # right-trim only; an all-blank C cell is '' not NULL
        # (db3-trim-string; DNORDOC's empty DOCIMGID regress)
        return cell.replace("\x00", "").rstrip(" ")
    if t == "F":
        # the reference lands F in a double precision column; match
        # PostgreSQL's float8 output (shortest round-trip, no
        # trailing .0) so text-level parity holds (dbase_8b regress)
        v = cell.replace("\x00", " ").strip()
        if not v:
            return None
        try:
            fval = float(v)
        except ValueError:
            return v
        if fval == int(fval) and abs(fval) < 1e16:
            return str(int(fval))
        return repr(fval)
    # N and anything else: trimmed text, blank -> NULL
    v = cell.replace("\x00", " ").strip()
    return v if v else None


def decode_records(
    data: bytes,
    header: DbfHeader,
    start_rec: int,
    end_rec: int,
    encoding: str = "latin-1",
    dbt: bytes | None = None,
) -> list[tuple]:
    """Decode records [start_rec, end_rec); skip deleted rows
    (db3.lisp:13-18)."""
    out: list[tuple] = []
    for i in range(start_rec, end_rec):
        off = header.header_size + i * header.record_size
        rec = data[off : off + header.record_size]
        if len(rec) < header.record_size or rec[:1] == DELETED_MARK:
            continue
        pos = 1  # first byte is the deletion flag
        row = []
        for f in header.fields:
            row.append(_decode_cell(f, rec[pos : pos + f.length], encoding, dbt))
            pos += f.length
        out.append(tuple(row))
    return out


def read_dbf(
    spark: SparkSession,
    path: str,
    encoding: str = "latin-1",
    min_records_per_task: int = 50_000,
) -> DataFrame:
    """DBF file -> DataFrame of string columns.

    The driver reads only the 32+32·n byte header; record decoding is
    sharded over Spark tasks by record ranges (fixed record size makes
    ranges independently seekable). Each task re-reads its slice of
    the file locally — on a cluster the file lives on shared storage,
    exactly like any other splittable format.
    """
    with open(path, "rb") as fh:
        head = fh.read(HEADER_SIZE)
        hdr0 = parse_header(head + fh.read(struct.unpack_from("<H", head, 8)[0]))
    header = hdr0
    names = [f.name for f in header.fields]
    schema = ", ".join(f"`{n}` string" for n in names)

    base = os.path.splitext(path)[0]
    dbt_path = next(
        (
            base + ext
            for ext in (".dbt", ".DBT", ".fpt", ".FPT")
            if os.path.exists(base + ext)
        ),
        base + ".dbt",
    )
    has_dbt = os.path.exists(dbt_path)

    n = header.record_count
    n_tasks = max(1, min(spark.sparkContext.defaultParallelism, n // max(min_records_per_task, 1) + 1))
    bounds = [(i * n // n_tasks, (i + 1) * n // n_tasks) for i in range(n_tasks)]

    hdr_tuple = (
        header.record_count,
        header.header_size,
        header.record_size,
        [(f.name, f.type_code, f.length, f.decimals) for f in header.fields],
    )

    def decode_range(bound: tuple[int, int]) -> list[tuple]:
        rc, hs, rs, fs = hdr_tuple
        h = DbfHeader(rc, hs, rs, [DbfField(*f) for f in fs])
        with open(path, "rb") as fh:
            data = fh.read()
        dbt = open(dbt_path, "rb").read() if has_dbt else None
        return decode_records(data, h, bound[0], bound[1], encoding, dbt)

    rdd = spark.sparkContext.parallelize(bounds, len(bounds)).flatMap(decode_range)
    return spark.createDataFrame(rdd, schema)


def dbf_source_fields(header: DbfHeader):
    """DbfField -> SourceField list for the db3 cast table."""
    from pgloader_spark.casting import SourceField

    return [
        SourceField(f.name, f.type_code, type_mod=f"({f.length},{f.decimals})")
        for f in header.fields
    ]
