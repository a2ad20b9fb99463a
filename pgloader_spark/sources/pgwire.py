"""Minimal PostgreSQL v3 wire-protocol client — pure stdlib.

This container has a real PostgreSQL server but no psycopg/JDBC
driver, so the live migration path speaks the (public, documented)
frontend/backend protocol directly: startup + trust auth, simple
query, COPY IN, COPY OUT.  That is exactly the slice pgloader itself
uses — its Common Lisp driver (Postmodern) rides the same three
message flows (reference: ``src/pg-copy/copy-db-write.lisp:24-35``
drives COPY FROM STDIN; ``src/pgsql/connection.lisp`` the queries).

Scale notes: every Spark task opens its OWN connection (the class is
executor-safe — no shared state), so a 1000-partition write is 1000
concurrent COPY streams, and a partitioned read is N concurrent
``COPY (SELECT ... WHERE <range>) TO STDOUT`` scans.  Connection
setup is one round-trip; the data path is streamed in 64 KiB chunks
either way.

Protocol reference: PostgreSQL docs "Frontend/Backend Protocol"
(message formats are stable since 7.4).  Trust/password-free auth
only — production deployments would use a real driver; the protocol
slice here is for self-contained e2e verification.
"""

from __future__ import annotations

import socket
import struct
from collections.abc import Iterable, Iterator
from urllib.parse import unquote, urlparse


class PGError(RuntimeError):
    """Server-reported error (SQLSTATE + message)."""


def _parse_dsn(dsn: str) -> dict:
    """postgresql://user@host:port/dbname  (host starting with '/' or
    a ``host=`` query param pointing at a directory = unix socket)."""
    u = urlparse(dsn)
    if u.scheme not in ("postgresql", "postgres", "pgsql"):
        raise ValueError(f"not a postgresql dsn: {dsn}")
    params = dict(
        kv.split("=", 1) for kv in u.query.split("&") if "=" in kv
    )
    host = u.hostname or params.get("host") or "127.0.0.1"
    return {
        "host": unquote(host),
        "port": u.port or int(params.get("port", 5432)),
        "user": u.username or params.get("user") or "postgres",
        "database": (u.path or "/").lstrip("/") or params.get("dbname") or "postgres",
    }


class PGConn:
    """One connection; not thread-safe (open one per task)."""

    def __init__(self, dsn: str, timeout: float = 30.0):
        cfg = _parse_dsn(dsn)
        if cfg["host"].startswith("/"):
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.settimeout(timeout)
            self.sock.connect(f"{cfg['host']}/.s.PGSQL.{cfg['port']}")
        else:
            self.sock = socket.create_connection(
                (cfg["host"], cfg["port"]), timeout=timeout
            )
        self._buf = b""
        self._startup(cfg["user"], cfg["database"])

    # ---------------------------------------------------------- low level

    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def _msg(self, type_byte: bytes, payload: bytes) -> bytes:
        return type_byte + struct.pack(">I", len(payload) + 4) + payload

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PGError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        mtype = head[:1]
        (mlen,) = struct.unpack(">I", head[1:5])
        return mtype, self._recv_exact(mlen - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        out = {}
        for part in payload.split(b"\x00"):
            if part:
                out[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return out

    def _raise_error(self, payload: bytes) -> None:
        f = self._error_fields(payload)
        err = PGError(f"{f.get('C', '?????')}: {f.get('M', 'unknown error')}")
        err.sqlstate = f.get("C", "")
        # W = error context; for COPY parse errors it carries
        # "COPY tbl, line N[, column c]" — the retry path uses the
        # line number to isolate the bad row without bisecting
        err.context = f.get("W", "")
        raise err

    # ----------------------------------------------------------- startup

    def _startup(self, user: str, database: str) -> None:
        body = struct.pack(">I", 196608)  # protocol 3.0
        for k, v in (("user", user), ("database", database)):
            body += k.encode() + b"\x00" + v.encode() + b"\x00"
        body += b"\x00"
        self._send(struct.pack(">I", len(body) + 4) + body)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack(">I", payload[:4])
                if code != 0:  # 0 = AuthenticationOk (trust)
                    raise PGError(f"unsupported auth method {code} (trust only)")
            elif mtype == b"E":
                self._raise_error(payload)
            elif mtype == b"Z":  # ReadyForQuery
                return
            # S (ParameterStatus), K (BackendKeyData), N (Notice): skip

    # ------------------------------------------------------ simple query

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        """Run one statement; text-format results.

        Returns (column names, rows of str|None).  For statements
        without a result set, ([], []).
        """
        self._send(self._msg(b"Q", sql.encode() + b"\x00"))
        cols: list[str] = []
        rows: list[tuple] = []
        err: bytes | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":
                cols = self._parse_row_description(payload)
            elif mtype == b"D":
                rows.append(self._parse_data_row(payload))
            elif mtype == b"E":
                err = payload
            elif mtype == b"Z":
                if err is not None:
                    self._raise_error(err)
                return cols, rows
            # C (CommandComplete), N, S, I (EmptyQuery): skip

    @staticmethod
    def _parse_row_description(payload: bytes) -> list[str]:
        (n,) = struct.unpack(">H", payload[:2])
        cols, off = [], 2
        for _ in range(n):
            end = payload.index(b"\x00", off)
            cols.append(payload[off:end].decode())
            off = end + 1 + 18  # tableoid(4) attnum(2) typoid(4) typlen(2) typmod(4) fmt(2)
        return cols

    @staticmethod
    def _parse_data_row(payload: bytes) -> tuple:
        (n,) = struct.unpack(">H", payload[:2])
        vals, off = [], 2
        for _ in range(n):
            (ln,) = struct.unpack(">i", payload[off : off + 4])
            off += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(payload[off : off + ln].decode("utf-8"))
                off += ln
        return tuple(vals)

    # -------------------------------------------------------------- COPY

    def copy_out(self, sql: str) -> Iterator[bytes]:
        """``COPY ... TO STDOUT`` — yields raw CopyData chunks
        (text format; concatenation is \\n-separated rows)."""
        self._send(self._msg(b"Q", sql.encode() + b"\x00"))
        err: bytes | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"H":  # CopyOutResponse
                break
            if mtype == b"E":
                self._raise_error(payload)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"d":
                yield payload
            elif mtype == b"c":  # CopyDone
                pass
            elif mtype == b"E":
                err = payload
            elif mtype == b"Z":
                if err is not None:
                    self._raise_error(err)
                return

    def copy_in(self, sql: str, chunks: Iterable[bytes]) -> int:
        """``COPY ... FROM STDIN`` — streams chunks (COPY text format).

        Returns the loaded row count (from CommandComplete).
        """
        self._send(self._msg(b"Q", sql.encode() + b"\x00"))
        while True:
            mtype, payload = self._read_message()
            if mtype == b"G":  # CopyInResponse
                break
            if mtype == b"E":
                self._raise_error(payload)
        for chunk in chunks:
            if chunk:
                self._send(self._msg(b"d", chunk))
        self._send(self._msg(b"c", b""))  # CopyDone
        n_rows = 0
        err: bytes | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"C":
                tag = payload.rstrip(b"\x00").decode()
                if tag.startswith("COPY "):
                    n_rows = int(tag.split()[-1])
            elif mtype == b"E":
                err = payload
            elif mtype == b"Z":
                if err is not None:
                    self._raise_error(err)
                return n_rows

    def close(self) -> None:
        try:
            self._send(self._msg(b"X", b""))  # Terminate
        except OSError:
            pass
        self.sock.close()

    def __enter__(self) -> PGConn:
        return self

    def __exit__(self, *exc) -> None:
        self.close()
