"""PostgreSQL to_char-style date format -> Spark datetime pattern.

The reference parses `date format 'YYYY-MM-DD'` clauses with tokens
YYYY MM DD HH24 HH MI SS MS US AM PM (src/parsers/date-format.lisp:
13-145).  Spark uses java.time patterns; this is a token-table
translation, longest-match-first.
"""

from __future__ import annotations

# longest tokens first so 'HH24' wins over 'HH'
_TOKENS: list[tuple[str, str]] = [
    ("YYYY", "yyyy"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("YY", "yy"),
    ("MM", "MM"),
    ("DD", "dd"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("MS", "SSS"),
    ("US", "SSSSSS"),
    ("AM", "a"),
    ("PM", "a"),
]


def pg_to_spark_datetime_format(fmt: str) -> str:
    out: list[str] = []
    i = 0
    up = fmt.upper()
    while i < len(fmt):
        for tok, rep in _TOKENS:
            if up.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            ch = fmt[i]
            # quote literal letters so java.time doesn't interpret them
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)
