"""Python-side COPY text encoding for the psycopg2 fallback path.

Mirrors ``src/pg-copy/copy-format.lisp:43-98`` (single-pass escape,
NULL -> ``\\N``) — but only runs inside ``foreachPartition`` on the
COPY fast path; the distributed/file encoders use the Column-expression
version in ``pgloader_spark.sources.copytext``.
"""

from __future__ import annotations

import io
from collections.abc import Iterable

_ESCAPES = {
    "\\": "\\\\",
    "\t": "\\t",
    "\n": "\\n",
    "\r": "\\r",
    "\b": "\\b",
    "\f": "\\f",
    "\v": "\\v",
}
_TRANS = str.maketrans(_ESCAPES)


def encode_value(v: object) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    return str(v).translate(_TRANS)


def encode_rows_to_copy(rows: Iterable) -> io.StringIO:
    buf = io.StringIO()
    for row in rows:
        buf.write("\t".join(encode_value(v) for v in row))
        buf.write("\n")
    buf.seek(0)
    return buf
