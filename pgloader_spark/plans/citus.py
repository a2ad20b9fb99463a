"""Citus-style distribution: rules, DDL, and FK-walk backfill joins.

Re-expresses ``src/utils/citus.lisp``:

- distribution rules (``citus.lisp:28-100``): a table is distributed
  by a column, or marked a reference table (replicated everywhere);
- ``create_distributed_table`` / ``create_reference_table`` DDL
  emission (``src/pgsql/pgsql-create-schema.lisp:641+``);
- **FK-walk backfill** (``citus.lisp:121-195``, SQL gen ``:307-375``):
  when a distributed table lacks the distribution key, find the
  (possibly multi-hop) foreign-key path to a table that has it and
  generate the join that carries the key down — here a chain of
  DataFrame equi-joins (broadcast when parents are dim-sized, shuffle
  otherwise; AQE decides), instead of generated SQL.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgloader_spark.catalog import Catalog, Table


@dataclass
class DistributionRule:
    """DISTRIBUTE <table> USING <column> | DISTRIBUTE <table> AS REFERENCE."""

    table: str
    column: str | None = None  # None => reference table
    from_tables: list[str] = field(default_factory=list)  # explicit backfill path

    @property
    def is_reference(self) -> bool:
        return self.column is None


def citus_ddl(rules: list[DistributionRule]) -> list[str]:
    """The post-create DDL statements, reference tables first (they
    must exist on every node before distributed FKs reference them)."""
    stmts = [
        f"SELECT create_reference_table('{r.table}');"
        for r in rules
        if r.is_reference
    ]
    stmts += [
        f"SELECT create_distributed_table('{r.table}', '{r.column}');"
        for r in rules
        if not r.is_reference
    ]
    return stmts


def find_fk_path(
    catalog: Catalog, start: str, has_column: str
) -> list[tuple[str, list[str], str, list[str]]] | None:
    """BFS over the FK graph from ``start`` to the nearest table that
    owns ``has_column`` (citus.lisp:121-195). Returns the hop list
    [(child, child_cols, parent, parent_cols), ...] or None."""
    tables: dict[str, Table] = {t.name: t for t in catalog.all_tables()}

    def owns(table_name: str) -> bool:
        t = tables.get(table_name)
        return t is not None and any(c.name == has_column for c in t.columns)

    if owns(start):
        return []
    seen = {start}
    queue: deque[tuple[str, list]] = deque([(start, [])])
    while queue:
        name, path = queue.popleft()
        t = tables.get(name)
        if t is None:
            continue
        for fk in t.fkeys:
            hop = (name, fk.columns, fk.foreign_table, fk.foreign_columns)
            if fk.foreign_table in seen:
                continue
            new_path = path + [hop]
            if owns(fk.foreign_table):
                return new_path
            seen.add(fk.foreign_table)
            queue.append((fk.foreign_table, new_path))
    return None


def backfill_distribution_key(
    dfs: dict[str, DataFrame],
    catalog: Catalog,
    table: str,
    dist_key: str,
    broadcast_parents: bool = True,
) -> DataFrame:
    """Carry ``dist_key`` into ``table`` by joining down the FK chain
    (citus.lisp:307-375, re-expressed as DataFrame joins). Multi-hop
    paths chain joins; each hop joins on the FK columns only, so the
    child side shuffles at most once per hop (or not at all when the
    parent broadcasts)."""
    path = find_fk_path(catalog, table, dist_key)
    if path is None:
        raise ValueError(
            f"no FK path from {table!r} to any table with column {dist_key!r}"
        )
    df = dfs[table]
    if not path:
        return df  # table already has the key
    current = df
    for i, (child, child_cols, parent, parent_cols) in enumerate(path):
        last = i == len(path) - 1
        parent_df = dfs[parent]
        # project the parent to join cols + (next hop's FK cols | dist key)
        if last:
            keep = list(dict.fromkeys(parent_cols + [dist_key]))
        else:
            nxt_child_cols = path[i + 1][1]
            keep = list(dict.fromkeys(parent_cols + nxt_child_cols))
        pruned = parent_df.select(*keep)
        if broadcast_parents:
            pruned = F.broadcast(pruned)
        cond = None
        for cc, pc in zip(child_cols, parent_cols):
            clause = current[cc] == pruned[pc]
            cond = clause if cond is None else (cond & clause)
        current = current.join(pruned, cond).drop(*parent_cols)
    # dist key first, matching the reference's generated SELECT
    cols = [dist_key] + [c for c in dfs[table].columns if c != dist_key]
    return current.select(*cols)
