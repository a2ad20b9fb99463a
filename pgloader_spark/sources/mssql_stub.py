"""Protocol-faithful MS SQL Server stub: TDS 7.1 over TCP, backed by
an in-memory SQLite fixture store.

No SQL Server ships in this container, so (like ``mysql_stub.py`` for
mysqld) this stands in for a real server to exercise the live
``LOAD DATABASE FROM mssql://`` path end-to-end: the TDS framing,
PRELOGIN/LOGIN7 handshake, SQL_BATCH and COLMETADATA/ROW/DONE token
streams are the real wire format (``tdswire.MsConn`` and any TDS 7.1
client can talk to it); the query engine behind them is pragmatic —
the planner's own catalog scans (``jdbc.py:mssql_*_sql`` — T-SQL
with COLUMNPROPERTY/sys.* that SQLite cannot run) are answered from
fixture metadata, and data SELECTs run on SQLite after stripping
T-SQL-isms ([brackets], CONVERT-to-varchar).

Every result column travels as NVARCHAR — the same text funnel a real
server produces for the planner's CONVERT pushdown, with client-side
typed conversion per the introspected catalog type.
"""

from __future__ import annotations

import re
import socketserver
import sqlite3
import struct
import threading
from dataclasses import dataclass, field

from pgloader_spark.sources.tdswire import (
    TYPE_NVARCHAR,
    _ucs2,
    encode_login_password,
)


@dataclass
class MsStubColumn:
    name: str
    data_type: str  # "int", "nvarchar", "datetime", "decimal", "bit", ...
    nullable: bool = True
    default: str | None = None
    identity: bool = False
    char_max_len: int | None = None
    precision: int | None = None
    scale: int | None = None


@dataclass
class MsStubTable:
    name: str
    columns: list[MsStubColumn]
    rows: list[tuple] = field(default_factory=list)
    schema: str = "dbo"
    pkey: list[str] = field(default_factory=list)
    # (index_name, is_unique, [columns], filter_definition|None)
    indexes: list[tuple[str, int, list[str], str | None]] = field(
        default_factory=list
    )
    # (constraint_name, [cols], ref_table, [ref_cols])
    fkeys: list[tuple[str, list[str], str, list[str]]] = field(
        default_factory=list
    )


def _affinity(data_type: str) -> str:
    t = data_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "bit"):
        return "INTEGER"
    if t in ("float", "real"):
        return "REAL"
    return "TEXT"


class MsSQLStubServer:
    """One fixture database served over TDS.

    Usage::

        with MsSQLStubServer("northwind", tables) as srv:
            MsConn(f"mssql://sa@127.0.0.1:{srv.port}/northwind")
    """

    def __init__(
        self,
        database: str,
        tables: list[MsStubTable],
        user: str = "sa",
        password: str = "",
        host: str = "127.0.0.1",
    ):
        self.database = database
        self.tables = tables
        self.user = user
        self.password = password
        self.host = host
        self.port: int | None = None
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._con = self._build_sqlite()

    def _build_sqlite(self) -> sqlite3.Connection:
        con = sqlite3.connect(":memory:", check_same_thread=False)
        cur = con.cursor()
        for t in self.tables:
            cols = ", ".join(
                f'"{c.name}" {_affinity(c.data_type)}' for c in t.columns
            )
            cur.execute(f'CREATE TABLE "{t.name}" ({cols})')
            if t.rows:
                ph = ", ".join("?" * len(t.columns))
                cur.executemany(
                    f'INSERT INTO "{t.name}" VALUES ({ph})',
                    [
                        tuple(
                            v.decode("utf-8", "surrogateescape")
                            if isinstance(v, bytes)
                            else v
                            for v in row
                        )
                        for row in t.rows
                    ],
                )
        con.commit()
        return con

    # -------------------------------------------------- catalog answers

    def _columns_resultset(self) -> tuple[list[str], list[tuple]]:
        cols = [
            "table_schema", "table_name", "column_name", "data_type",
            "column_default", "is_nullable", "is_identity",
            "character_maximum_length", "numeric_precision",
            "numeric_scale", "character_set_name", "collation_name",
        ]
        rows = []
        for t in self.tables:
            for c in t.columns:
                rows.append(
                    (
                        t.schema, t.name, c.name, c.data_type,
                        c.default,
                        "YES" if c.nullable else "NO",
                        "1" if c.identity else "0",
                        None if c.char_max_len is None else str(c.char_max_len),
                        None if c.precision is None else str(c.precision),
                        None if c.scale is None else str(c.scale),
                        None, None,
                    )
                )
        return cols, rows

    def _fkeys_resultset(self) -> tuple[list[str], list[tuple]]:
        cols = [
            "constraint_name", "table_schema", "table_name", "column_name",
            "unique_table_schema", "unique_table_name", "unique_column_name",
            "update_rule", "delete_rule",
        ]
        rows = []
        for t in self.tables:
            for name, fcols, reft, refcols in t.fkeys:
                for a, b in zip(fcols, refcols):
                    rows.append(
                        (name.replace(".", "_"), t.schema, t.name, a,
                         t.schema, reft, b, "NO ACTION", "NO ACTION")
                    )
        return cols, rows

    def _indexes_resultset(self) -> tuple[list[str], list[tuple]]:
        cols = [
            "schema_name", "table_name", "index_name", "column_name",
            "is_unique", "is_primary_key", "filter_definition",
        ]
        rows = []
        for t in self.tables:
            for col in t.pkey:
                rows.append(
                    (t.schema, t.name, f"pk_{t.name}", col, "1", "1", None)
                )
            for name, uniq, icols, filt in t.indexes:
                for col in icols:
                    rows.append(
                        (t.schema, t.name, name.replace(".", "_"), col,
                         str(uniq), "0", filt)
                    )
        return cols, rows

    def _sequences_resultset(self) -> tuple[list[str], list[tuple]]:
        return (
            ["schema_name", "sequence_name", "data_type", "start_value",
             "increment_by", "minimum_value", "maximum_value",
             "current_value", "is_cycling", "cache_size"],
            [],
        )

    # --------------------------------------------------------- queries

    _CONVERT_RE = re.compile(
        r"CONVERT\(\s*varchar\(\d+\)\s*,\s*(\[?[^,\]]+\]?)\s*,\s*\d+\s*\)",
        re.IGNORECASE,
    )

    def execute(self, sql: str) -> tuple[list[str], list[tuple]] | None:
        s = sql.strip()
        if re.match(r"(SET|USE)\b", s, re.IGNORECASE):
            return None
        if "COLUMNPROPERTY(" in s:
            return self._columns_resultset()
        if "information_schema.referential_constraints rc" in s:
            return self._fkeys_resultset()
        if "FROM sys.indexes i" in s:
            return self._indexes_resultset()
        if "FROM sys.sequences s" in s:
            return self._sequences_resultset()
        # data scan: strip T-SQL-isms, run on SQLite
        s = self._CONVERT_RE.sub(r"\1", s)
        s = s.replace("[", '"').replace("]", '"')
        # [dbo].table / "dbo"."t" qualification — single fixture schema
        s = re.sub(r'"?dbo"?\.', "", s)
        with self._lock:
            cur = self._con.execute(s)
            if cur.description is None:
                self._con.commit()
                return None
            cols = [d[0].strip('"') for d in cur.description]
            rows = [
                tuple(None if v is None else str(v) for v in r)
                for r in cur.fetchall()
            ]
            return cols, rows

    # ---------------------------------------------------------- server

    def start(self) -> int:
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                try:
                    _TdsSession(stub, self.request).run()
                except (ConnectionError, OSError):
                    pass

        self._server = socketserver.ThreadingTCPServer(
            (self.host, 0), Handler, bind_and_activate=True
        )
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
        self._con.close()

    def __enter__(self) -> "MsSQLStubServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


class _TdsSession:
    """One client connection: prelogin, login7, SQL_BATCH loop."""

    def __init__(self, stub: MsSQLStubServer, sock):
        self.stub = stub
        self.sock = sock
        self._pktid = 0

    # ------------------------------------------------------ packet layer

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            part = self.sock.recv(n - len(buf))
            if not part:
                raise ConnectionError("client gone")
            buf += part
        return buf

    def _read_message(self) -> tuple[int, bytes]:
        body = b""
        while True:
            head = self._recv_exact(8)
            ptype, status, length = struct.unpack(">BBH", head[:4])
            body += self._recv_exact(length - 8)
            if status & 0x01:
                return ptype, body

    def _send_message(self, ptype: int, body: bytes) -> None:
        max_body = 4096 - 8
        chunks = [body[i : i + max_body] for i in range(0, len(body), max_body)] or [b""]
        for i, chunk in enumerate(chunks):
            status = 0x01 if i == len(chunks) - 1 else 0x00
            self._pktid = (self._pktid + 1) & 0xFF
            self.sock.sendall(
                struct.pack(
                    ">BBHHBB", ptype, status, len(chunk) + 8, 0, self._pktid, 0
                )
                + chunk
            )

    # ------------------------------------------------------- token build

    @staticmethod
    def _tok_loginack() -> bytes:
        prog = _ucs2("spark-graft stub")
        body = (
            b"\x01"  # interface: SQL
            + struct.pack("<I", 0x71000001)
            + bytes([len(prog) // 2])
            + prog
            + b"\x0b\x00\x00\x00"  # prog version
        )
        return b"\xad" + struct.pack("<H", len(body)) + body

    @staticmethod
    def _tok_done(count: int = 0, has_count: bool = False) -> bytes:
        status = 0x10 if has_count else 0x00
        return b"\xfd" + struct.pack("<HHI", status, 0, count)

    @staticmethod
    def _tok_error(number: int, message: str) -> bytes:
        msg = _ucs2(message)
        body = (
            struct.pack("<IBB", number, 1, 16)
            + struct.pack("<H", len(msg) // 2)
            + msg
            + b"\x00"  # servername B_VARCHAR (empty)
            + b"\x00"  # procname B_VARCHAR (empty)
            + struct.pack("<H", 0)  # line (7.1: USHORT)
        )
        return b"\xaa" + struct.pack("<H", len(body)) + body

    @staticmethod
    def _tok_colmetadata(cols: list[str]) -> bytes:
        out = b"\x81" + struct.pack("<H", len(cols))
        for name in cols:
            nm = _ucs2(name)
            out += (
                struct.pack("<HH", 0, 0x09)  # UserType, Flags (nullable)
                + bytes([TYPE_NVARCHAR])
                + struct.pack("<H", 8000)  # maxlen (bytes)
                + b"\x09\x04\xd0\x00\x34"  # collation
                + bytes([len(nm) // 2])
                + nm
            )
        return out

    @staticmethod
    def _tok_row(values: tuple) -> bytes:
        out = b"\xd1"
        for v in values:
            if v is None:
                out += struct.pack("<H", 0xFFFF)
            else:
                enc = _ucs2(str(v))
                out += struct.pack("<H", len(enc)) + enc
        return out

    # --------------------------------------------------------- sessions

    def run(self) -> None:
        ptype, _body = self._read_message()
        if ptype == 0x12:  # PRELOGIN
            version = struct.pack(">BBHH", 11, 0, 0, 0)
            head = (
                struct.pack(">BHH", 0x00, 11, 6)
                + struct.pack(">BHH", 0x01, 17, 1)
                + b"\xff"
            )
            self._send_message(0x04, head + version + b"\x02")
            ptype, _body = self._read_message()
        if ptype != 0x10:  # LOGIN7 expected
            self._send_message(0x04, self._tok_error(18456, "login expected") + self._tok_done())
            return
        if not self._check_login(_body):
            self._send_message(
                0x04,
                self._tok_error(18456, "Login failed") + self._tok_done(),
            )
            return
        self._send_message(0x04, self._tok_loginack() + self._tok_done())
        while True:
            try:
                ptype, body = self._read_message()
            except ConnectionError:
                return
            if ptype != 0x01:  # SQL_BATCH only
                self._send_message(
                    0x04,
                    self._tok_error(180, f"packet 0x{ptype:02x} unsupported")
                    + self._tok_done(),
                )
                continue
            sql = body.decode("utf-16-le")
            try:
                res = self.stub.execute(sql)
            except sqlite3.Error as exc:
                self._send_message(
                    0x04, self._tok_error(50000, str(exc)) + self._tok_done()
                )
                continue
            if res is None:
                self._send_message(0x04, self._tok_done(has_count=True))
                continue
            cols, rows = res
            out = self._tok_colmetadata(cols)
            if "order by" in sql.lower():
                # real servers emit an ORDER token (0xA9) for sorted
                # result sets: USHORT length + column numbers
                out += b"\xa9" + struct.pack("<HH", 2, 1)
            for r in rows:
                out += self._tok_row(r)
            out += self._tok_done(len(rows), has_count=True)
            self._send_message(0x04, out)

    def _check_login(self, body: bytes) -> bool:
        """Validate user/password/database from the LOGIN7 offsets."""
        # fixed part is 36 bytes; pairs follow
        pairs = []
        off = 36
        for _ in range(9):
            o, ln = struct.unpack_from("<HH", body, off)
            pairs.append((o, ln))
            off += 4
        def field_at(idx: int) -> bytes:
            o, ln = pairs[idx]
            return body[o : o + ln * 2]

        user = field_at(1).decode("utf-16-le")
        pwd_obf = field_at(2)
        database = field_at(8).decode("utf-16-le")
        want = encode_login_password(self.stub.password)
        return (
            user == self.stub.user
            and pwd_obf == want
            and database in ("", self.stub.database)
        )
