"""Minimal TDS 7.1 wire client for MS SQL Server — pure stdlib.

This container ships no SQL Server client (no mssql-jdbc jar, no
FreeTDS), so like ``mywire.py``/``pgwire.py`` this implements just
enough of the wire protocol for pgloader-style catalog introspection
and bulk SELECT scans, executable from Spark tasks with zero
dependencies.

Protocol subset (MS-TDS spec, TDS 7.1 — no MARS, no encryption):

- PRELOGIN (0x12) with ENCRYPT_NOT_SUP;
- LOGIN7 (0x10) with the nibble-swap/XOR-0xA5 password obfuscation;
- SQL_BATCH (0x01), UCS-2LE text;
- response token streams: COLMETADATA (0x81), ROW (0xD1),
  DONE/DONEPROC/DONEINPROC (0xFD/0xFE/0xFF), and the
  USHORT-length-prefixed tokens (ERROR, INFO, ENVCHANGE, LOGINACK)
  which skip generically.

Values travel as text: the pgloader-parity read planner pushes
``CONVERT(varchar, col, style)`` for datetimes/decimals
(``jdbc.py:mssql_select_expr``, mirroring mssql-schema.lisp:200-218),
and typed conversion happens client-side per the introspected catalog
type — the same text-protocol funnel the MySQL live path uses.

Reference parity: src/sources/mssql/mssql.lisp (connection lifecycle),
src/sources/mssql/sql/*.sql (the catalog queries live in
``sources/jdbc.py:mssql_*_sql``).
"""

from __future__ import annotations

import re
import socket
import struct

_PKT_SQL_BATCH = 0x01
_PKT_TABULAR = 0x04
_PKT_LOGIN7 = 0x10
_PKT_PRELOGIN = 0x12

_TOK_COLMETADATA = 0x81
_TOK_ORDER = 0xA9  # column numbers of an ORDER BY result (skippable)
_TOK_RETURNSTATUS = 0x79  # 4-byte proc return value (skippable)
_TOK_ERROR = 0xAA
_TOK_INFO = 0xAB
_TOK_LOGINACK = 0xAD
_TOK_ROW = 0xD1
_TOK_ENVCHANGE = 0xE3
_TOK_DONE = 0xFD
_TOK_DONEPROC = 0xFE
_TOK_DONEINPROC = 0xFF

TYPE_NVARCHAR = 0xE7
TYPE_BIGVARCHAR = 0xA7
TYPE_INTN = 0x26
TYPE_BITN = 0x68  # nullable BIT: same size-prefixed wire shape as INTN

_DSN_RE = re.compile(
    r"^mssql://(?:(?P<user>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/@]+)?(?::(?P<port>\d+))?(?:/(?P<database>[^?]*))?"
    r"(?:\?.*)?$"
)


class MsError(Exception):
    def __init__(self, number: int, state: int, severity: int, message: str):
        self.number = number
        self.state = state
        self.severity = severity
        self.message = message
        super().__init__(f"[{number}] {message}")


def parse_ms_dsn(dsn: str) -> dict:
    m = _DSN_RE.match(dsn)
    if not m:
        raise ValueError(f"bad mssql dsn: {dsn!r}")
    g = m.groupdict()
    return {
        "user": g["user"] or "sa",
        "password": g["password"] or "",
        "host": g["host"] or "127.0.0.1",
        "port": int(g["port"] or 1433),
        "database": (g["database"] or "").strip("/"),
    }


def encode_login_password(password: str) -> bytes:
    """LOGIN7 password obfuscation: per UCS-2 byte, swap the nibbles
    then XOR with 0xA5 (MS-TDS 2.2.6.4)."""
    raw = password.encode("utf-16-le")
    return bytes((((b << 4) | (b >> 4)) & 0xFF) ^ 0xA5 for b in raw)


def _ucs2(s: str) -> bytes:
    return s.encode("utf-16-le")


class MsConn:
    """One TDS connection: connect + login in the constructor, then
    ``query(sql) -> (colnames, rows-of-str-or-None)``."""

    def __init__(self, dsn: str, timeout: float = 30.0):
        cfg = parse_ms_dsn(dsn)
        self.cfg = cfg
        self._pktid = 0
        self.sock = socket.create_connection(
            (cfg["host"], cfg["port"]), timeout=timeout
        )
        try:
            self._prelogin()
            self._login7()
        except Exception:
            self.sock.close()
            raise

    # ------------------------------------------------------- packet layer

    def _send_packet(self, ptype: int, body: bytes) -> None:
        # 4096-byte negotiated packets; split with EOM on the last
        max_body = 4096 - 8
        chunks = [body[i : i + max_body] for i in range(0, len(body), max_body)] or [b""]
        for i, chunk in enumerate(chunks):
            status = 0x01 if i == len(chunks) - 1 else 0x00
            self._pktid = (self._pktid + 1) & 0xFF
            head = struct.pack(
                ">BBHHBB", ptype, status, len(chunk) + 8, 0, self._pktid, 0
            )
            self.sock.sendall(head + chunk)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            part = self.sock.recv(n - len(buf))
            if not part:
                raise ConnectionError("TDS connection closed")
            buf += part
        return buf

    def _read_response(self) -> bytes:
        """Concatenate packet bodies until an EOM status."""
        out = b""
        while True:
            head = self._recv_exact(8)
            _ptype, status, length = struct.unpack(">BBH", head[:4])
            out += self._recv_exact(length - 8)
            if status & 0x01:
                return out

    # ------------------------------------------------------------- login

    def _prelogin(self) -> None:
        version = struct.pack(">BBHH", 11, 0, 0, 0)  # fake client 11.0
        options = [(0x00, version), (0x01, b"\x02")]  # ENCRYPT_NOT_SUP
        head_len = len(options) * 5 + 1
        offs, data = head_len, b""
        head = b""
        for token, payload in options:
            head += struct.pack(">BHH", token, offs, len(payload))
            offs += len(payload)
            data += payload
        self._send_packet(_PKT_PRELOGIN, head + b"\xff" + data)
        self._read_response()  # server prelogin — contents unused

    def _login7(self) -> None:
        cfg = self.cfg
        host, user, db = "sparkgraft", cfg["user"], cfg["database"]
        pwd = encode_login_password(cfg["password"])
        app, server, lib = "pgloader_spark", cfg["host"], "tdswire"
        fixed = struct.pack(
            "<IIIIII BBBB iI",
            0,  # length, patched below
            0x71000001,  # TDS 7.1
            4096,
            0,
            0,
            0,
            0xE0,  # OptionFlags1: use DB, init DB fatal, set lang
            0x03,  # OptionFlags2: init lang fatal, ODBC
            0x00,
            0x00,
            0,
            0x0409,
        )
        # variable part: (offset, length-in-chars) pairs
        strings = [
            host,  # HostName
            user,  # UserName
            None,  # Password (pre-encoded bytes)
            app,  # AppName
            server,  # ServerName
            "",  # Unused
            lib,  # CltIntName
            "",  # Language
            db,  # Database
        ]
        offset = len(fixed) + 9 * 4 + 6 + 4 + 4  # fixed + pairs + ClientID + SSPI + AtchDB
        pairs, blob = b"", b""
        for s in strings:
            payload = pwd if s is None else _ucs2(s)
            nchars = len(payload) // 2
            pairs += struct.pack("<HH", offset + len(blob), nchars)
            blob += payload
        client_id = b"\x00\x01\x02\x03\x04\x05"
        sspi = struct.pack("<HH", offset + len(blob), 0)
        atch = struct.pack("<HH", offset + len(blob), 0)
        body = fixed + pairs + client_id + sspi + atch + blob
        body = struct.pack("<I", len(body)) + body[4:]
        self._send_packet(_PKT_LOGIN7, body)
        self._parse_tokens(self._read_response())  # raises on ERROR

    # ------------------------------------------------------------- query

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        self._send_packet(_PKT_SQL_BATCH, _ucs2(sql))
        return self._parse_tokens(self._read_response())

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "MsConn":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------ token stream

    def _parse_tokens(self, data: bytes) -> tuple[list[str], list[tuple]]:
        cols: list[str] = []
        types: list[tuple] = []  # (type, ...typeinfo)
        rows: list[tuple] = []
        error: MsError | None = None
        i, n = 0, len(data)
        while i < n:
            tok = data[i]
            i += 1
            if tok in (_TOK_ENVCHANGE, _TOK_INFO, _TOK_LOGINACK, _TOK_ORDER):
                (length,) = struct.unpack_from("<H", data, i)
                i += 2 + length
            elif tok == _TOK_ERROR:
                (length,) = struct.unpack_from("<H", data, i)
                body = data[i + 2 : i + 2 + length]
                number, state, severity = struct.unpack_from("<IBB", body, 0)
                (msglen,) = struct.unpack_from("<H", body, 6)
                msg = body[8 : 8 + msglen * 2].decode("utf-16-le")
                if error is None:
                    error = MsError(number, state, severity, msg)
                i += 2 + length
            elif tok == _TOK_RETURNSTATUS:
                i += 4  # LONG value — irrelevant to a result funnel
            elif tok == _TOK_COLMETADATA:
                (count,) = struct.unpack_from("<H", data, i)
                i += 2
                cols, types = [], []
                if count == 0xFFFF:  # no metadata
                    continue
                for _ in range(count):
                    i += 2 + 2  # UserType (USHORT in 7.1) + Flags
                    t = data[i]
                    i += 1
                    if t in (TYPE_NVARCHAR, TYPE_BIGVARCHAR):
                        (maxlen,) = struct.unpack_from("<H", data, i)
                        i += 2 + 5  # maxlen + COLLATION
                        types.append((t, maxlen))
                    elif t in (TYPE_INTN, TYPE_BITN):
                        size = data[i]
                        i += 1
                        types.append((t, size))
                    else:
                        raise NotImplementedError(
                            f"TDS column type 0x{t:02x} not in the "
                            "text-funnel subset"
                        )
                    namelen = data[i]
                    i += 1
                    cols.append(data[i : i + namelen * 2].decode("utf-16-le"))
                    i += namelen * 2
            elif tok == _TOK_ROW:
                vals: list = []
                for t, _info in types:
                    if t in (TYPE_NVARCHAR, TYPE_BIGVARCHAR):
                        (blen,) = struct.unpack_from("<H", data, i)
                        i += 2
                        if blen == 0xFFFF:
                            vals.append(None)
                        elif t == TYPE_NVARCHAR:
                            vals.append(data[i : i + blen].decode("utf-16-le"))
                            i += blen
                        else:
                            vals.append(
                                data[i : i + blen].decode(
                                    "utf-8", "surrogateescape"
                                )
                            )
                            i += blen
                    else:  # INTN / BITN (size-prefixed little-endian int)
                        size = data[i]
                        i += 1
                        if size == 0:
                            vals.append(None)
                        else:
                            vals.append(
                                str(
                                    int.from_bytes(
                                        data[i : i + size], "little", signed=True
                                    )
                                )
                            )
                            i += size
                rows.append(tuple(vals))
            elif tok in (_TOK_DONE, _TOK_DONEPROC, _TOK_DONEINPROC):
                i += 2 + 2 + 4  # status + curcmd + ULONG rowcount (7.1)
            else:
                raise NotImplementedError(f"TDS token 0x{tok:02x}")
        if error is not None and error.severity > 10:
            raise error
        return cols, rows
