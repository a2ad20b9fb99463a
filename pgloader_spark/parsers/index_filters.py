"""MSSQL filtered-index WHERE-clause -> PostgreSQL syntax.

Re-expresses ``src/sources/mssql/mssql-index-filters.lisp:9-185``: a
small predicate grammar — comparisons (``= < > <= >= <>``), ``IS
NULL`` / ``IS NOT NULL``, ``IN (...)``, ``BETWEEN``, ``AND`` / ``OR``,
bracketed identifiers ``[col]``, parenthesized groups, numeric and
``N'...'``/``'...'`` string literals — translated token-wise to the PG
spelling (identifiers double-quoted only when needed, N-strings
unprefixed). Used when carrying a filtered index to the target DDL.
"""

from __future__ import annotations

import re

from pgloader_spark.catalog import quote_ident

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<nstring>N'(?:[^']|'')*')
  | (?P<string>'(?:[^']|'')*')
  | (?P<bracket>\[[^\]]+\])
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "is", "null", "in", "between", "like", "exists"}


class IndexFilterError(ValueError):
    pass


def translate_index_filter(filter_text: str) -> str:
    """'([status]=(1) AND [type] IN (N'a', N'b'))' ->
    '(status = 1 AND type IN ('a', 'b'))'"""
    out: list[str] = []
    pos = 0
    n = len(filter_text)
    while pos < n:
        m = _TOKEN.match(filter_text, pos)
        if not m:
            raise IndexFilterError(
                f"unparseable index filter at {pos}: {filter_text[pos:pos+20]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        tok = m.group()
        if kind == "ws":
            continue
        if kind == "nstring":
            out.append(tok[1:])  # drop the N prefix
        elif kind == "string" or kind == "number":
            out.append(tok)
        elif kind == "bracket":
            out.append(quote_ident(tok[1:-1]))
        elif kind == "op":
            out.append("<>" if tok == "!=" else tok)
        elif kind == "word":
            if tok.lower() in _KEYWORDS:
                out.append(tok.upper())
            else:
                out.append(quote_ident(tok))
    # re-join with spacing rules: no space after '(' or before ')' ','
    text = ""
    for tok in out:
        if not text:
            text = tok
        elif tok in (")", ","):
            text += tok
        elif text.endswith("("):
            text += tok
        else:
            text += " " + tok
    # MSSQL wraps literals in parens: (1) — collapse single-literal groups
    text = re.sub(r"\((\d+(?:\.\d+)?)\)", r"\1", text)
    text = re.sub(r"\(('(?:[^']|'')*')\)", r"\1", text)
    return text
