"""ip4r extension stand-in for targets that cannot install it.

Two reference scenarios (`test/archive.load`, `test/csv-before-after.load`)
require the ip4r PostgreSQL extension for their target column type
(``iprange ip4r``), a gist index on it, and the containment operator
``>>=`` used by ``geolite.locate()`` (`test/geolite.sql`).  The sandbox's
PostgreSQL 15 has no ip4r package, so — in the same spirit as the local
HTTP stand-in for dead archive URLs and the protocol-faithful stub for
the missing mysqld — this module installs a behavior-faithful emulation
built only from PostgreSQL built-ins when ``CREATE EXTENSION ip4r``
fails:

- ``ip4r`` and ``ip4`` become text domains.  The engine-side
  ``ip-range`` transform (functions/transforms.py) already emits ip4r's
  *canonical output text* (single IP / ``a.b.c.d/len`` / ``lo-hi``), so
  stored values are byte-identical to what real ip4r would print —
  which is exactly what the regress golden
  ``test/regress/expected/csv-before-after.out`` contains.
- ``>>=`` (range contains IP, `ip4r docs: operator >>=`) is a SQL
  function over the text forms, registered as a real operator so
  ``geolite.locate()`` from `test/geolite.sql` runs unchanged.
- ``using gist(iprange)`` works because btree_gist supplies a gist
  opclass for text.

On a server WITH ip4r installed, ``wrap_sql_runner`` is a no-op passthrough:
the real extension is used and the same canonical text parses natively.
"""

from __future__ import annotations

from collections.abc import Callable

import re

_CREATE_IP4R = re.compile(
    r"^\s*create\s+extension\s+(if\s+not\s+exists\s+)?\"?ip4r\"?\s*;?\s*$",
    re.IGNORECASE,
)

EMULATION_DDL = [
    "create extension if not exists btree_gist",
    # domains: duplicate_object-tolerant so re-runs are idempotent
    """do $$ begin
         create domain ip4r as text;
       exception when duplicate_object then null; end $$""",
    """do $$ begin
         create domain ip4 as text;
       exception when duplicate_object then null; end $$""",
    """create or replace function ip4_to_int(text) returns bigint
       language sql immutable strict as $f$
         select split_part($1,'.',1)::bigint * 16777216
              + split_part($1,'.',2)::bigint * 65536
              + split_part($1,'.',3)::bigint * 256
              + split_part($1,'.',4)::bigint
       $f$""",
    # bounds of any canonical ip4r text form -> [lo, hi] as bigints
    """create or replace function ip4r_bounds(text) returns bigint[]
       language sql immutable strict as $f$
         select case
           when position('-' in $1) > 0 then array[
             ip4_to_int(split_part($1,'-',1)),
             ip4_to_int(split_part($1,'-',2))]
           when position('/' in $1) > 0 then array[
             ip4_to_int(split_part($1,'/',1)),
             ip4_to_int(split_part($1,'/',1))
               + (1::bigint << (32 - split_part($1,'/',2)::int)) - 1]
           else array[ip4_to_int($1), ip4_to_int($1)]
         end
       $f$""",
    """create or replace function ip4r_contains(text, text) returns boolean
       language sql immutable strict as $f$
         select (ip4r_bounds($1))[1] <= ip4_to_int($2)
            and ip4_to_int($2) <= (ip4r_bounds($1))[2]
       $f$""",
    """do $$ begin
         create operator >>= (leftarg = text, rightarg = text,
                              function = ip4r_contains);
       exception when duplicate_object or duplicate_function then null;
       end $$""",
]


def install_emulation(run_sql: Callable[[str], object]) -> None:
    for stmt in EMULATION_DDL:
        run_sql(stmt)


def wrap_sql_runner(run_sql: Callable[[str], object]) -> Callable[[str], object]:
    """Intercept ``CREATE EXTENSION [IF NOT EXISTS] ip4r``: try the real
    extension first; only when the server rejects it (no ip4r package)
    install the emulation.  Every other statement passes through."""

    def runner(sql: str):
        if _CREATE_IP4R.match(sql):
            try:
                return run_sql(sql)
            except Exception:
                install_emulation(run_sql)
                return None
        return run_sql(sql)

    return runner
