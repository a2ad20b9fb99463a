"""libpq ``.pgpass`` password-file lookup.

Mirrors the reference's parser and matcher
(``src/parsers/parse-pgpass.lisp:1-104``) and the documented libpq
behavior (PostgreSQL docs, "The Password File"):

- one ``hostname:port:database:username:password`` entry per line;
- ``#``-comment and blank lines skipped;
- ``\\:`` and ``\\\\`` escape a literal colon/backslash inside any
  field;
- ``[ipv6::addr]`` bracket syntax for IPv6 hostnames (brackets are
  stripped, as the reference's ``pgpass-ipv6-hostname`` rule does);
- ``*`` in hostname/port/database/username matches anything;
- an EMPTY hostname field means ``localhost`` (reference
  ``pgpass-line``);
- a ``localhost`` entry matches both TCP connections to the name
  ``localhost`` and Unix-domain-socket connections (reference
  ``match-hostname``);
- FIRST matching line wins;
- the file is ``$PGPASSFILE`` if set, else ``~/.pgpass``;
- any parse/read problem yields no password rather than an error
  (reference ``match-pgpass-file``'s handler-case).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class PgpassEntry:
    hostname: str
    port: str
    database: str
    username: str
    password: str


def _split_pgpass_line(line: str) -> list[str]:
    """Split on unescaped ':', resolving ``\\x`` escapes and
    ``[ipv6]`` brackets (which may contain colons)."""
    fields: list[str] = []
    cur: list[str] = []
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if ch == "\\" and i + 1 < n:
            cur.append(line[i + 1])
            i += 2
        elif ch == "[":
            # the reference's pgpass-ipv6-hostname rule: a bracket
            # group counts only when its body is hex digits / colons
            # (parse-pgpass.lisp:17-21); anything else is literal
            j = line.find("]", i + 1)
            body = line[i + 1 : j] if j != -1 else ""
            if j != -1 and body and all(
                c in "0123456789abcdefABCDEF:" for c in body
            ):
                cur.append(body)
                i = j + 1
            else:
                cur.append(ch)
                i += 1
        elif ch == ":":
            fields.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    fields.append("".join(cur))
    return fields


def parse_pgpass_line(line: str) -> PgpassEntry | None:
    """One line -> entry, or None for comments/blank/malformed lines."""
    if not line or line.lstrip() == "" or line.lstrip().startswith("#"):
        return None
    fields = _split_pgpass_line(line.rstrip("\n"))
    if len(fields) != 5:
        return None
    host, port, db, user, pwd = fields
    return PgpassEntry(
        hostname=host or "localhost",  # empty first field -> localhost
        port=port,
        database=db,
        username=user,
        password=pwd,
    )


def pgpass_filename() -> str:
    """$PGPASSFILE, else ~/.pgpass (reference get-pgpass-filename)."""
    return os.environ.get("PGPASSFILE") or os.path.join(
        os.path.expanduser("~"), ".pgpass"
    )


def parse_pgpass_file(path: str | None = None) -> list[PgpassEntry]:
    path = path or pgpass_filename()
    try:
        with open(path, encoding="utf-8") as fh:
            lines = fh.readlines()
    except OSError:
        return []
    out = []
    for line in lines:
        entry = parse_pgpass_line(line)
        if entry is not None:
            out.append(entry)
    return out


def _match_hostname(entry: PgpassEntry, hostname: str | None) -> bool:
    """Reference match-hostname: a 'localhost' entry matches TCP
    'localhost' AND unix-socket connections (hostname None or a
    socket-directory path); '*' matches anything."""
    eh = entry.hostname
    if eh == "*":
        return True
    is_unix = hostname is None or hostname == "" or str(hostname).startswith("/")
    if eh == "localhost":
        return is_unix or hostname == "localhost"
    return hostname is not None and eh == hostname


def match_pgpass(
    entries: list[PgpassEntry],
    hostname: str | None,
    port: int | str,
    database: str,
    username: str,
) -> str | None:
    """First entry matching all four connection parameters -> password."""

    def same(entry_field: str, param: str) -> bool:
        return entry_field == "*" or entry_field == param

    for e in entries:
        if (
            _match_hostname(e, hostname)
            and same(e.port, str(port))
            and same(e.database, database)
            and same(e.username, username)
        ):
            return e.password
    return None


def lookup_password(
    hostname: str | None,
    port: int | str,
    database: str,
    username: str,
    path: str | None = None,
) -> str | None:
    """Resolve a password from the pgpass file; None on any problem
    (the reference logs a warning and proceeds password-less)."""
    try:
        entries = parse_pgpass_file(path)
        return match_pgpass(entries, hostname, port, database, username)
    except Exception:
        return None
