"""Exactly-once Structured-Streaming sink into PostgreSQL.

``foreachBatch`` alone is at-least-once: after a crash between the
sink call and the checkpoint commit, Spark REPLAYS the last epoch.
The standard remedy (documented in the Structured Streaming guide as
"use batchId to deduplicate") is made transactional here:

1. the micro-batch COPYs into a per-target STAGING table
   (parallel writers, same fast Arrow path as batch loads — a replay
   simply truncates and refills the stage);
2. ONE server-side transaction moves stage -> target AND records the
   epoch id in a log table; the epoch-log insert and the data commit
   are atomic, so a replayed epoch either finds its id already logged
   (skip — nothing was staged into the target twice) or re-runs the
   whole move.

Crash points and outcomes:
- before the transaction: stage holds partial rows, log has no epoch
  -> replay truncates the stage and redoes everything;
- inside the transaction: PostgreSQL rolls back both the move and
  the log row -> same as above;
- after the transaction, before the Spark checkpoint: replay sees
  the epoch in the log and SKIPS -> no duplicates.

The reference's sink is at-least-once per batch with retry isolation
(src/pgsql/copy-from-queue.lisp); exactly-once is the stronger
guarantee a continuous pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgloader_spark.sources.pg_live import write_pg_copy
from pgloader_spark.sources.pgwire import PGConn


def apply_epoch_exactly_once(
    batch_df: DataFrame,
    epoch_id: int,
    dsn: str,
    table: str,
    n_writers: int | None = None,
) -> int:
    """Apply one micro-batch exactly once; returns rows applied
    (0 for an already-applied epoch).  Usable directly as the body of
    a ``foreachBatch`` callback and independently testable.

    Stage and epoch log are schema-qualified siblings of the target
    (``a.t`` -> ``a.t__stage``), and the stage lifecycle runs under a
    session advisory lock so two streams writing the same target
    queue instead of dropping each other's stage."""
    from pgloader_spark.sources.pg_live import quote_qualified, sibling_table

    stage = sibling_table(table, "__stage")
    q_stage = quote_qualified(stage)
    q_table = quote_qualified(table)
    log = quote_qualified(sibling_table(table, "__epochs"))
    lock = PGConn(dsn)
    lock.query(
        "SELECT pg_advisory_lock(hashtext("
        f"'{stage.replace(chr(39), chr(39) * 2)}'))"
    )
    try:
        with PGConn(dsn) as c:
            c.query(
                f"CREATE TABLE IF NOT EXISTS {log} (epoch bigint PRIMARY KEY)"
            )
            _, rows = c.query(
                f"SELECT 1 FROM {log} WHERE epoch = {int(epoch_id)}"
            )
            if rows:
                return 0  # replayed epoch: already committed
            c.query(f"DROP TABLE IF EXISTS {q_stage}")
            c.query(
                f"CREATE TABLE {q_stage} (LIKE {q_table} INCLUDING DEFAULTS)"
            )
        n = write_pg_copy(batch_df, dsn, stage, n_writers=n_writers)
        with PGConn(dsn) as c:
            c.query("BEGIN")
            c.query(f"INSERT INTO {q_table} SELECT * FROM {q_stage}")
            c.query(f"INSERT INTO {log} (epoch) VALUES ({int(epoch_id)})")
            c.query("COMMIT")
            c.query(f"DROP TABLE IF EXISTS {q_stage}")
        return n
    finally:
        try:
            lock.query("SELECT pg_advisory_unlock_all()")
        finally:
            lock.close()


def write_stream_pg_exactly_once(
    stream_df: DataFrame,
    dsn: str,
    table: str,
    checkpoint: str,
    n_writers: int | None = None,
):
    """Start the exactly-once PG sink for a streaming DataFrame."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_epoch_exactly_once(
            batch_df, epoch_id, dsn, table, n_writers=n_writers
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_stream_pg_cdc_exactly_once(
    stream_df: DataFrame,
    dsn: str,
    table: str,
    key_cols: list,
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    n_writers: int | None = None,
):
    """Exactly-once streaming CDC replication: every micro-batch of
    change events (op I/U/D [+ seq]) applies through
    ``apply_pg_cdc(epoch_id=...)`` — the epoch log rides INSIDE the
    same transaction as the delete+upsert, so a replayed epoch is a
    no-op and a mid-apply crash leaves the target untouched.  This is
    the continuous-replication mode the reference approximates with
    repeated full reloads."""
    from pgloader_spark.sources.pg_live import apply_pg_cdc

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_pg_cdc(
            batch_df,
            dsn,
            table,
            key_cols=list(key_cols),
            op_col=op_col,
            seq_col=seq_col,
            n_writers=n_writers,
            epoch_id=int(epoch_id),
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
