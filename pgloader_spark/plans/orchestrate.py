"""Migration orchestration: table scheduling, concurrency, summary.

Re-expresses ``copy-database`` (``src/load/migrate-database.lisp:
326-594``) on Spark's execution model:

- **Largest-first scheduling** (``optimize-table-copy-ordering``,
  ``migrate-database.lisp:304-320``): big tables submit first so the
  pool drains evenly.
- **Concurrent table loads**: the reference runs ``worker-count`` (4)
  lparallel workers; here a thread pool submits Spark jobs — Spark
  schedules their tasks concurrently across executors (FAIR pools so
  a huge table cannot starve small ones).
- **Phases**: prepare (DDL) -> data (per-table pipeline §3.3c) ->
  complete (indexes, PKs, FKs, sequences) — DDL phases run through a
  pluggable ``sql_runner`` (JDBC in production).
- **Summary report** (``src/utils/report.lisp:28-38``, state structs
  ``src/utils/state.lisp:11-40``): per-table read/loaded/errors/secs
  rendered as text table, csv, or json.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pgloader_spark.catalog import Catalog, Table, copy_ordering

DEFAULT_WORKERS = 4  # migrate-database.lisp:329-330


@dataclass
class TableResult:
    table: str
    read: int = 0
    loaded: int = 0
    errors: int = 0
    seconds: float = 0.0
    failed: str | None = None


@dataclass
class MigrationSummary:
    results: list[TableResult] = field(default_factory=list)
    prepare_seconds: float = 0.0
    complete_seconds: float = 0.0

    @property
    def total_seconds(self) -> float:
        return self.prepare_seconds + self.complete_seconds + sum(
            r.seconds for r in self.results
        )

    def to_text(self) -> str:
        """The reference's summary table shape (report.lisp:28-38)."""
        name_w = max([len(r.table) for r in self.results] + [10])
        lines = [
            f"{'table name':<{name_w}}  {'read':>10} {'imported':>10} {'errors':>8} {'total time':>11}",
            f"{'-' * name_w}  {'-' * 10} {'-' * 10} {'-' * 8} {'-' * 11}",
        ]
        for r in self.results:
            lines.append(
                f"{r.table:<{name_w}}  {r.read:>10} {r.loaded:>10} "
                f"{r.errors:>8} {r.seconds:>10.3f}s"
            )
        lines.append(f"{'-' * name_w}  {'-' * 10} {'-' * 10} {'-' * 8} {'-' * 11}")
        total_read = sum(r.read for r in self.results)
        total_loaded = sum(r.loaded for r in self.results)
        total_err = sum(r.errors for r in self.results)
        lines.append(
            f"{'Total import time':<{name_w}}  {total_read:>10} "
            f"{total_loaded:>10} {total_err:>8} {self.total_seconds:>10.3f}s"
        )
        return "\n".join(lines)

    def to_csv(self) -> str:
        rows = ["table;read;imported;errors;seconds"]
        rows += [
            f"{r.table};{r.read};{r.loaded};{r.errors};{r.seconds:.3f}"
            for r in self.results
        ]
        return "\n".join(rows)

    def to_copy(self) -> str:
        """PostgreSQL COPY text format (the reference's .copy summary
        flavor, report.lisp): tab-separated, no header."""
        return "\n".join(
            f"{r.table}\t{r.read}\t{r.loaded}\t{r.errors}\t{r.seconds:.3f}"
            for r in self.results
        )

    def to_json(self) -> str:
        return json.dumps(
            {
                "tables": [vars(r) for r in self.results],
                "prepare_seconds": round(self.prepare_seconds, 3),
                "complete_seconds": round(self.complete_seconds, 3),
                "total_seconds": round(self.total_seconds, 3),
            }
        )


def migrate(
    tables: list[Table],
    load_fn: Callable[[Table], tuple[int, int, int]],
    workers: int = DEFAULT_WORKERS,
    prepare: Callable[[], None] | None = None,
    complete: Callable[[], None] | None = None,
    on_error_stop: bool = False,
) -> MigrationSummary:
    """Run ``prepare`` -> concurrent per-table ``load_fn`` (largest
    first) -> ``complete``. ``load_fn`` returns (read, loaded, errors);
    exceptions mark the table failed and — matching the reference's
    default — do not abort the rest unless ``on_error_stop``."""
    summary = MigrationSummary()

    if prepare is not None:
        t0 = time.perf_counter()
        prepare()
        summary.prepare_seconds = time.perf_counter() - t0

    ordered = copy_ordering(tables)

    def job(t: Table) -> TableResult:
        r = TableResult(table=t.name)
        t0 = time.perf_counter()
        try:
            r.read, r.loaded, r.errors = load_fn(t)
        except Exception as exc:  # noqa: BLE001 — reported per table
            r.failed = str(exc)
        r.seconds = time.perf_counter() - t0
        return r

    with ThreadPoolExecutor(max_workers=max(workers, 1)) as pool:
        futures = {pool.submit(job, t): t for t in ordered}
        for fut in as_completed(futures):
            res = fut.result()
            summary.results.append(res)
            if res.failed and on_error_stop:
                for f in futures:
                    f.cancel()
                raise RuntimeError(f"table {res.table} failed: {res.failed}")

    # keep the report in scheduling order
    order = {t.name: i for i, t in enumerate(ordered)}
    summary.results.sort(key=lambda r: order.get(r.table, 1 << 30))

    if complete is not None:
        t0 = time.perf_counter()
        complete()
        summary.complete_seconds = time.perf_counter() - t0
    return summary


def _is_connection_loss(exc: Exception) -> bool:
    """The postgresql-unavailable condition class
    (migrate-database.lisp:227): socket-level failures, the server's
    connection-exception SQLSTATEs (08xxx), and admin/crash shutdown
    (57P01/57P02) or cannot-connect-now (57P03, mid-restart)."""
    if isinstance(exc, OSError):
        return True
    state = getattr(exc, "sqlstate", "") or ""
    return (
        state.startswith("08")
        or state in ("57P01", "57P02", "57P03")
        or "closed connection" in str(exc)
    )


def run_post_load(
    dsn: str,
    statements: list[str],
    max_retries: int = 5,
    retry_sleep: float = 2.0,
    transactional: bool = True,
    errors: list[str] | None = None,
) -> int:
    """Run the complete-phase DDL with reconnect-and-retry on
    connection loss (``complete-pgsql-database``'s
    ``postgresql-unavailable`` handler,
    ``src/load/migrate-database.lisp:227-250``).

    ``transactional=True`` (the reference's shape): the statements run
    in ONE transaction, so a dropped connection — common during long
    index builds on flaky links — implies nothing was committed; after
    the reference's 2-second grace (ECONNREFUSED if we reconnect too
    soon, its comment verbatim) the whole list re-runs on a fresh
    connection.  Non-connection SQL errors propagate (the handler-case
    catches only unavailability).

    ``transactional=False`` (the migration executor's shape): each
    statement autocommits; on connection loss the retry RESUMES from
    the failed statement (committed DDL never re-runs, so no
    idempotency demands), and ordinary SQL errors are collected into
    ``errors`` and skipped — the reference's per-statement
    log-and-continue (``pgsql-execute-with-timing``), so one
    unbuildable index cannot abort a finished data load.

    Bounded retries instead of the reference's unbounded recursion.
    Returns the number of statements that executed successfully.
    """
    from pgloader_spark.sources.pgwire import PGConn, PGError

    last: Exception | None = None
    pos = 0
    n_ok = 0
    for attempt in range(max_retries + 1):
        if attempt:
            time.sleep(retry_sleep)
        try:
            with PGConn(dsn) as conn:
                if transactional:
                    conn.query("BEGIN")
                    for stmt in statements:
                        conn.query(stmt)
                    conn.query("COMMIT")
                    return len(statements)
                while pos < len(statements):
                    try:
                        conn.query(statements[pos])
                        n_ok += 1
                    except PGError as exc:
                        if _is_connection_loss(exc):
                            raise
                        if getattr(exc, "sqlstate", "") in (
                            "42P07", "42710", "42711", "42P16",
                        ):
                            # duplicate object: the statement committed
                            # on a previous attempt before the line
                            # dropped — at-least-once + duplicate-
                            # tolerant = converged
                            n_ok += 1
                        elif errors is not None:
                            errors.append(f"{statements[pos]} -- {exc}")
                    pos += 1
                return n_ok
        except (OSError, PGError) as exc:
            if not _is_connection_loss(exc):
                raise
            last = exc
            # non-transactional: pos is NOT advanced — the in-flight
            # statement re-runs on the fresh connection, and if it had
            # actually committed the duplicate-object branch above
            # counts it done
    raise RuntimeError(
        f"post-load DDL failed after {max_retries} reconnect attempts: {last}"
    )


def plain_index_statements(catalog: Catalog) -> list[str]:
    """Non-PK CREATE INDEX DDL only — the parallelizable phase (each
    index builds independently on its own connection)."""
    stmts: list[str] = []
    for schema in catalog.schemas:
        for t in schema.tables:
            for idx in t.indexes:
                if not idx.primary:
                    stmts.append(
                        idx.to_ddl(schema.name if schema.name != "public" else None)
                    )
    return stmts


def run_parallel_indexes(
    dsn: str,
    statements: list[str],
    workers: int | None = None,
    errors: list[str] | None = None,
) -> int:
    """CREATE INDEX across WORKERS concurrent connections — the
    reference's idx-kernel (``migrate-database.lisp:414-423``: kernel
    size = ``max-parallel-create-index`` or the max index count of any
    one table).  Index builds dominate complete-phase wall clock on a
    big migration, and PostgreSQL sorts each build independently, so N
    connections buy ~N×.  Each statement gets :func:`run_post_load`'s
    single-statement reconnect/duplicate-tolerant resilience.  Returns
    the number built."""
    if not statements:
        return 0
    workers = workers or min(len(statements), 8)
    shared: list[str] = [] if errors is None else errors
    n_ok = 0
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        futs = [
            pool.submit(
                run_post_load, dsn, [stmt], transactional=False, errors=shared
            )
            for stmt in statements
        ]
        for f in as_completed(futs):
            n_ok += f.result()
    return n_ok


def post_load_statements(
    catalog: Catalog,
    create_indexes: bool = True,
    foreign_keys: bool = True,
    reset_sequences: bool = True,
    plain_indexes: bool = True,
) -> list[str]:
    """The complete-phase DDL in dependency order
    (``complete-pgsql-database``, ``migrate-database.lisp:153-226``):
    indexes, unique-index -> PRIMARY KEY promotion, FKs (which need
    the PKs/unique indexes on the referenced side), sequence resets
    (max() benefits from the fresh indexes), CHECK constraints,
    triggers + procedures, comments last — emitted as SQL for the
    JDBC runner.  The three booleans mirror the reference's WITH
    flags (create no indexes / no foreign keys / reset no
    sequences)."""
    from pgloader_spark.plans.ddl import (
        check_constraint_statements,
        comment_statements,
        create_trigger_statements,
    )

    stmts: list[str] = []
    if create_indexes:
        for schema in catalog.schemas:
            for t in schema.tables:
                qt = (
                    f"{schema.name}.{t.name}"
                    if schema.name != "public"
                    else t.name
                )
                for idx in t.indexes:
                    if idx.primary:
                        cols = ", ".join(idx.columns)
                        stmts.append(
                            f"ALTER TABLE {qt} ADD PRIMARY KEY ({cols});"
                        )
                    elif plain_indexes:
                        stmts.append(idx.to_ddl(schema.name if schema.name != "public" else None))
    if foreign_keys:
        for schema in catalog.schemas:
            for t in schema.tables:
                for fk in t.fkeys:
                    stmts.append(fk.to_ddl(schema.name if schema.name != "public" else None))
    if reset_sequences:
        for schema in catalog.schemas:
            for t in schema.tables:
                qt = (
                    f"{schema.name}.{t.name}"
                    if schema.name != "public"
                    else t.name
                )
                for c in t.columns:
                    if c.extra.get("serial"):
                        seq = f"{t.name}_{c.name}_seq"
                        qseq = (
                            f"{schema.name}.{seq}"
                            if schema.name != "public"
                            else seq
                        )
                        stmts.append(
                            f"SELECT setval('{qseq}', "
                            f"(SELECT GREATEST(MAX({c.name}), 1) FROM {qt}));"
                        )
    stmts += check_constraint_statements(catalog)
    stmts += create_trigger_statements(catalog)
    stmts += comment_statements(catalog)
    return stmts
