"""ALTER TABLE / ALTER SCHEMA rules applied to the catalog.

Re-expresses ``src/utils/alter-table.lisp:10-158``: rules match table
or schema names (exact string or regex) and mutate the *catalog*
before any DDL or data movement — renames, schema moves, tablespace
and storage-parameter settings. Applied driver-side; the data plan
only ever sees the post-rule names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pgloader_spark.catalog import Catalog, Schema, Table


@dataclass
class AlterRule:
    """kind: 'rename' | 'set_schema' | 'set_tablespace' | 'set_storage'
    match: exact name or regex (wrapped in ~// by the DSL).
    """

    kind: str
    match: str
    is_regex: bool = False
    value: str | None = None

    def matches(self, name: str) -> bool:
        if self.is_regex:
            return re.search(self.match, name) is not None
        return name == self.match


def apply_table_rules(catalog: Catalog, rules: list[AlterRule]) -> Catalog:
    for rule in rules:
        for schema in catalog.schemas:
            # iterate a snapshot: set_schema moves tables out of the list
            for table in list(schema.tables):
                # the DSL writes source-side spellings (pre-folding):
                # sqlite-chinook's MATCHING 'Employee' must hit the
                # catalog's folded 'employee', so match either name
                if not (
                    rule.matches(table.name)
                    or (table.source_name and rule.matches(table.source_name))
                ):
                    continue
                if rule.kind == "rename":
                    table.source_name = table.source_name or table.name
                    table.name = rule.value or table.name
                elif rule.kind == "set_schema":
                    target = catalog.find_schema(rule.value)
                    if target is None:
                        target = Schema(rule.value, [])
                        catalog.schemas.append(target)
                    if table in schema.tables:
                        schema.tables.remove(table)
                        target.tables.append(table)
                elif rule.kind in ("set_tablespace", "set_storage"):
                    # carried as metadata; emitted in DDL options
                    if not hasattr(table, "storage"):
                        table.storage = {}  # type: ignore[attr-defined]
                    table.storage[rule.kind] = rule.value  # type: ignore[attr-defined]
    return catalog


def apply_schema_rules(catalog: Catalog, rules: list[AlterRule]) -> Catalog:
    for rule in rules:
        for schema in catalog.schemas:
            if rule.matches(schema.name) and rule.kind == "rename":
                old = schema.name
                new = rule.value or old
                # generated types (enums/sets) carry the schema in
                # their qualified name, and columns bake that name as
                # their type string — rename all three together so the
                # emitted DDL is consistent (sakila.load: ALTER SCHEMA
                # 'sakila' RENAME TO 'pagila' must move film_rating_t)
                renames: dict[str, str] = {}
                for st in getattr(schema, "sqltypes", []):
                    if st.schema_name == old:
                        before = st.column_type_name()
                        st.schema_name = new
                        renames[before] = st.column_type_name()
                schema.name = new
                if renames:
                    for s in catalog.schemas:
                        for t in s.tables:
                            for c in t.columns:
                                if c.type_name in renames:
                                    c.type_name = renames[c.type_name]
    return catalog
