"""USING-clause s-expression mini-language -> Spark Column tree.

The reference lets ``USING`` clauses call any transform function with
field symbols, string/int/char literals, and nested calls — e.g.
``(ip-range startIpNum endIpNum)``
(grammar ``src/parsers/command-sexp.lisp:17-59``; the v4 rewrite
evaluates it with a restricted interpreter,
``clojure/src/pgloader/transforms.clj:336-350``).

We do the same: parse the sexp into a tiny AST, then *compile* it to a
``pyspark.sql.Column`` expression — function names resolve ONLY
through the transform registry (no eval of arbitrary code), symbols
resolve to field columns, literals become ``lit()``. The result is a
JVM-side expression; no Python runs per row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from pgloader_spark.functions.transforms import TRANSFORMS


@dataclass
class Sym:
    name: str


Atom = Sym | str | int | float
Node = Atom | list


class SexpError(ValueError):
    pass


def tokenize(text: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
        elif ch in "()":
            out.append(ch)
            i += 1
        elif ch == '"':
            j = i + 1
            buf = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    buf.append(text[j + 1])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise SexpError("unterminated string literal")
            out.append('"' + "".join(buf))
            i = j + 1
        elif text.startswith("#\\", i):  # CL char literal: #\Space, #\a
            j = i + 2
            while j < n and not text[j].isspace() and text[j] not in "()":
                j += 1
            out.append(text[i:j])
            i = j
        else:
            j = i
            while j < n and not text[j].isspace() and text[j] not in "()\"":
                j += 1
            out.append(text[i:j])
            i = j
    return out


_CHAR_NAMES = {"Space": " ", "Tab": "\t", "Newline": "\n"}


def _atom(tok: str) -> Atom:
    if tok.startswith('"'):
        return tok[1:]
    if tok.startswith("#\\"):
        name = tok[2:]
        return _CHAR_NAMES.get(name, name[:1])
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return Sym(tok)


def parse_sexp(text: str) -> Node:
    toks = tokenize(text)
    pos = 0

    def read() -> Node:
        nonlocal pos
        if pos >= len(toks):
            raise SexpError("unexpected end of expression")
        tok = toks[pos]
        pos += 1
        if tok == "(":
            items: list[Node] = []
            while pos < len(toks) and toks[pos] != ")":
                items.append(read())
            if pos >= len(toks):
                raise SexpError("missing closing paren")
            pos += 1
            return items
        if tok == ")":
            raise SexpError("unexpected )")
        return _atom(tok)

    node = read()
    if pos != len(toks):
        raise SexpError(f"trailing tokens: {toks[pos:]}")
    return node


# a few general-purpose builtins beyond the transform registry,
# mirrored from what reference USING clauses actually use
def _concat(*args: Column) -> Column:
    return F.concat(*args)


def _cl_subseq(c: Column, start: int, end: int | None = None) -> Column:
    """CL (subseq s start [end]) — 0-based, end-exclusive."""
    s = int(start)
    if end is None:
        return F.substring(c, s + 1, (1 << 30))
    return F.substring(c, s + 1, int(end) - s)


def _cl_format(_nil, control, *args) -> Column:
    """Restricted CL format: the directives the reference corpus uses.

    ``~a`` interpolation slots (``(format nil "(~a,~a)" lon lat)`` —
    the point-syntax builder, csv-districts.load) and the whole-string
    list-join form ``~{~a~^SEP~}``.  The control string must be a
    literal; the first (stream) arg is ignored like CL's ``nil``.
    """
    import re as _re

    if not isinstance(control, str):
        raise SexpError("format control string must be a literal")
    m = _re.fullmatch(r"~\{~a~\^(.*)~\}", control, _re.IGNORECASE)
    if m:
        # CL's ~{...~} iterates a LIST argument: a single arg is an
        # array column (the split-sequence composition in
        # csv-using-sexp.load); several args join as a literal list
        lst = args[0] if len(args) == 1 else F.array(*args)
        return F.array_join(lst, m.group(1))
    parts = _re.split(r"~a", control, flags=_re.IGNORECASE)
    if len(parts) - 1 != len(args):
        raise SexpError(
            f"format: {len(parts) - 1} ~a slots but {len(args)} args"
        )
    pieces: list[Column] = []
    for i, lit_part in enumerate(parts):
        if lit_part:
            pieces.append(F.lit(lit_part))
        if i < len(args):
            pieces.append(args[i])
    return F.concat(*pieces) if pieces else F.lit("")


_BUILTINS = {
    "concat": _concat,
    "upper": F.upper,
    "lower": F.lower,
    "trim": F.trim,
    "nullif": F.nullif,
    "coalesce": F.coalesce,
    "substring": lambda c, start, ln: F.substring(c, start, ln),
    "subseq": _cl_subseq,
    "identity": lambda c: c,
    "format": _cl_format,
}


def _cl_split_sequence(node: list, fields: dict[str, Column] | None) -> Column:
    """(split-sequence #\\Space s :remove-empty-subseqs cl:t) —
    csv-using-sexp.load (reference issue #965).  Returns an array
    column; composes with the ``~{~a~^ ~}`` format join.  The char
    literal already became a plain string in ``_atom``."""
    import re as _re

    if len(node) < 3:
        raise SexpError("split-sequence needs (split-sequence char seq ...)")
    sep = node[1] if isinstance(node[1], str) else None
    if sep is None:
        raise SexpError(f"split-sequence: bad separator {node[1]!r}")
    col = compile_sexp(node[2], fields)
    remove_empty = False
    rest = node[3:]
    for k, v in zip(rest[::2], rest[1::2]):
        if isinstance(k, Sym) and k.name.lower() == ":remove-empty-subseqs":
            remove_empty = isinstance(v, Sym) and v.name.lower() in (
                "t",
                "cl:t",
            )
    arr = F.split(col, _re.escape(sep))
    if remove_empty:
        arr = F.filter(arr, lambda x: x != F.lit(""))
    return arr


def compile_sexp(node: Node, fields: dict[str, Column] | None = None) -> Column:
    """AST -> Column. ``fields`` maps field names to their (already
    option-processed) Column expressions; bare symbols default to
    ``F.col(name)``."""
    fields = fields or {}
    if isinstance(node, Sym):
        return fields.get(node.name, F.col(node.name))
    if isinstance(node, (str, int, float)):
        return F.lit(node)
    if isinstance(node, list):
        if not node or not isinstance(node[0], Sym):
            raise SexpError(f"cannot call non-symbol: {node!r}")
        fname = node[0].name
        if fname.lower() == "lambda":
            # (lambda (field...) body): parameters ARE the source field
            # names in USING clauses, so compiling the body with normal
            # field resolution applies the transform to those columns
            if len(node) != 3:
                raise SexpError("lambda needs exactly (lambda (params) body)")
            return compile_sexp(node[2], fields)
        if fname.lower() == "split-sequence":
            return _cl_split_sequence(node, fields)
        fn = TRANSFORMS.get(fname) or _BUILTINS.get(fname.lower())
        if fn is None:
            raise SexpError(
                f"unknown transform {fname!r} (restricted interpreter: only "
                "registered transforms are callable)"
            )
        # literal args pass through as python values where the
        # transform wants them (e.g. encodings); Columns otherwise
        args = []
        for a in node[1:]:
            if isinstance(a, (str, int, float)) and fname in _LITERAL_ARG_FNS:
                args.append(a)
            else:
                args.append(compile_sexp(a, fields))
        return fn(*args)
    raise SexpError(f"cannot compile {node!r}")


# transforms whose trailing args are python-level options, not columns
_LITERAL_ARG_FNS = {"varbinary-to-string", "subseq", "format"}


def compile_using(text: str, fields: dict[str, Column] | None = None) -> Column:
    return compile_sexp(parse_sexp(text), fields)
